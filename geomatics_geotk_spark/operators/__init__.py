"""Operators: set-at-a-time liftings of the reference's per-pair kernels
(spatial predicates, envelopes, temporal relations) plus the large-scale
training-data pipeline ops (dedup, similarity, text, multimodal)."""

from . import dedup, envelope, knn, multimodal, similarity, spatial_join, temporal, text, zonal  # noqa: F401
