"""Raster-tile ↔ vector zonal join: tiles (envelope rows) joined to zone
polygons, then value statistics per zone.

The raster side follows the reference's envelope model (``Extents.java``):
a tile is an (xmin, ymin, xmax, ymax) row.  Join = bbox prefilter on
covering cells (equi-join) + exact envelope-ring intersection refine
(envelope→5-point ring, ``Extents.java:231-243`` envelopeAsPolygon, then
the polygon-intersects kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import cells
from ..kernels import geometry as geom_k
from .spatial_join import prepare_zones

DEFAULT_RES = 10


def zonal_join(tiles: DataFrame, zones: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """(tile_id, zone_id, value…) pairs where tile envelope ∩ zone ≠ ∅."""
    spark = tiles.sparkSession
    zone_cells, ring_map = prepare_zones(zones, res)
    ring_bc = spark.sparkContext.broadcast(ring_map)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def covering(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        return pd.Series([
            cells.cells_covering(a, b, c, d, res).tolist()
            for a, b, c, d in zip(xmin, ymin, xmax, ymax)
        ])

    tile_cells = tiles.withColumn(
        "cell_id", F.explode(covering("xmin", "ymin", "xmax", "ymax"))
    )
    cand = (
        tile_cells.join(F.broadcast(zone_cells), "cell_id", "inner")
        .drop("cell_id")
        .dropDuplicates(["tile_id", "zone_id"])
    )

    @F.pandas_udf(T.BooleanType())
    def env_intersects(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series, zone_id: pd.Series
    ) -> pd.Series:
        rings_by_zone = ring_bc.value
        out = np.zeros(len(xmin), dtype=bool)
        for i in range(len(xmin)):
            rings = rings_by_zone.get(zone_id.iloc[i])
            if rings is None:
                continue
            env_ring = geom_k.envelope_as_polygon(
                xmin.iloc[i], ymin.iloc[i], xmax.iloc[i], ymax.iloc[i]
            )
            out[i] = geom_k.polygons_intersect([env_ring], rings)
        return pd.Series(out)

    full_short_circuit = F.col("full")
    return cand.where(
        full_short_circuit
        | env_intersects("xmin", "ymin", "xmax", "ymax", F.col("zone_id"))
    ).drop("full")


def zonal_stats(tiles: DataFrame, zones: DataFrame, res: int = DEFAULT_RES,
                value_col: str = "value") -> DataFrame:
    """Per-zone aggregate of intersecting tile values (count/sum/avg/min/max) —
    hash agg with map-side partials, the Spark lifting of the reference's
    sequential envelope fold (Extents.java:73-120)."""
    pairs = zonal_join(tiles, zones, res)
    return pairs.groupBy("zone_id").agg(
        F.count("*").alias("n_tiles"),
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
