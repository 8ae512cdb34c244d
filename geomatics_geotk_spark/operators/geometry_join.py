"""Generic-geometry spatial join: documents carrying ANY WKT geometry
(POINT / LINESTRING / POLYGON / MULTI*) joined to zone polygons under any
reference predicate (TopologicalRelationships.java:57-96).

Same filter-and-refine shape as the point fast path
(operators/spatial_join.py), but the filter step covers the geometry's
ENVELOPE (Column math over pre-extracted envelope columns) and the refine
dispatches the full DE-9IM kernel per candidate pair inside an Arrow
batch.  Points go through spatial_join's pure-JVM path; this operator is
the general path for the curve/surface geometries the reference flattens
(CurveCoordinateListFactory / SurfaceCoordinateListFactory semantics live
in kernels.geometry.parse_wkt).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import covering_cells_col
from ..kernels import geometry as geom_k
from .spatial_join import prepare_zones

DEFAULT_RES = 10

_ENV_SCHEMA = T.StructType([
    T.StructField("xmin", T.DoubleType()), T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()), T.StructField("ymax", T.DoubleType()),
])


@F.pandas_udf(_ENV_SCHEMA)
def _wkt_envelope(wkt: pd.Series) -> pd.DataFrame:
    """Geometry envelope per WKT (Extents.calculateEnvelopeUsingSingle-
    Geometry semantics, Extents.java:131-183) — Arrow batch, numpy."""
    rows = []
    for w in wkt:
        try:
            kind, parts = geom_k.parse_wkt(w)
            rows.append(geom_k.envelope_of(parts))
        except Exception:  # noqa: BLE001 - malformed WKT → null envelope
            rows.append((np.nan, np.nan, np.nan, np.nan))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


def _refine_udf(ring_map_bc, predicate: str):
    @F.pandas_udf(T.BooleanType())
    def refine(wkt: pd.Series, zone_id: pd.Series) -> pd.Series:
        # NOTE: no full-cell shortcut here — a cell fully inside the zone
        # only proves the geometry's ENVELOPE touches it, not the
        # geometry itself (an L-shaped line can cover a cell it never
        # enters), so every candidate pair is evaluated exactly.
        rings_by_zone = ring_map_bc.value
        out = np.zeros(len(wkt), dtype=bool)
        parsed: dict[str, tuple] = {}
        for i, (w, z) in enumerate(zip(wkt, zone_id)):
            if w not in parsed:
                try:
                    parsed[w] = geom_k.parse_wkt(w)
                except Exception:  # noqa: BLE001
                    parsed[w] = None
            g = parsed[w]
            rings = rings_by_zone.get(z)
            if g is None or rings is None:
                continue
            kind, parts = g
            fn = getattr(geom_k, predicate)
            out[i] = bool(fn(kind, parts, "polygon", rings))
        return pd.Series(out)

    return refine


def geometry_join(
    docs: DataFrame,
    zones: DataFrame,
    predicate: str = "intersects",
    res: int = DEFAULT_RES,
    wkt_col: str = "wkt",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs(any WKT geometry) ⋈ zones(polygons) under ``predicate``.

    predicate ∈ intersects | within | contains | touches | crosses |
    overlaps | equals_topo; 'disjoint' = anti-join of intersects
    (TopologicalRelationships.java:71-73).
    """
    spark = docs.sparkSession
    if predicate == "disjoint":
        matched = geometry_join(docs, zones, "intersects", res, wkt_col, id_col)
        return docs.join(matched.select(id_col).distinct(), id_col, "left_anti")

    zone_cells, ring_map = prepare_zones(zones, res)
    ring_bc = spark.sparkContext.broadcast(ring_map)

    env = docs.withColumn("_env", _wkt_envelope(F.col(wkt_col)))
    # malformed WKT yields a NaN envelope; NaN sorts greater than any
    # double so covering_cells_col would clamp it to a bogus max-corner
    # cell and emit spurious candidates — drop those rows up front
    env = env.where(~F.isnan(F.col("_env.xmin")))
    cand = (
        env.withColumn(
            "cell_id",
            F.explode(covering_cells_col(
                F.col("_env.xmin"), F.col("_env.ymin"),
                F.col("_env.xmax"), F.col("_env.ymax"), res,
            )),
        )
        .join(F.broadcast(zone_cells.select("cell_id", "zone_id")), "cell_id")
        .groupBy(id_col, "zone_id")
        .agg(F.first(wkt_col).alias(wkt_col))
    )
    refine = _refine_udf(ring_bc, predicate)
    return cand.where(refine(F.col(wkt_col), F.col("zone_id"))).select(
        id_col, "zone_id"
    )
