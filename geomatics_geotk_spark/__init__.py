"""geomatics_geotk_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query/data-processing capabilities of
opengeospatial/geomatics-geotk, re-expressed Spark-first.

Layers:

- :mod:`kernels` — pure-numpy geometry/CRS/geodesic/temporal semantics
  (the reference's per-pair Java kernels, batch-vectorized);
- :mod:`cells` — hierarchical Z-order cell grid (the spatial index the
  reference lacks; enables partitioned equi-joins at 10^12 docs);
- :mod:`functions` — JVM-side Column-expression helpers (hot path);
- :mod:`operators` — spatial joins, kNN, zonal, envelope/temporal aggs,
  dedup/similarity/text pipeline ops;
- :mod:`sources` — deterministic synthetic interleaved-documents tables +
  checkpointed parquet sink;
- :mod:`streaming` — Structured Streaming tile assignment.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
