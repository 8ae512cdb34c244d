"""Pure-numpy kernels: the reference's geometry/CRS/temporal semantics,
re-expressed batch-at-a-time for Arrow-backed pandas UDFs.

Modules: :mod:`geodesic` (Vincenty direct/inverse, UCUM units),
:mod:`crs` (id normalization, axis order, transverse Mercator),
:mod:`geometry` (WKT, point-in-polygon, DE-9IM predicates, coordinate
ops), :mod:`temporal` (ISO 19108 relations).
"""

from . import crs, geodesic, geometry, temporal  # noqa: F401
