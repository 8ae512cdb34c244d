"""Raster focal (neighborhood) statistics: the moving-window companion
to the zonal ops — each grid cell's value summarized over its
(2r+1)x(2r+1) neighborhood.  This is the distributed convolution /
focal-mean primitive of every raster stack, re-expressed as a
scatter-explode + partial aggregate instead of a per-window loop.

The raster model matches ``zonal.py`` (reference ``Extents.java``
envelope rows): a tile is one row keyed by integer grid coordinates
(i, j).  Reference has no focal op (it is object-at-a-time); the
semantics here are the standard GIS focal statistics over the engine's
tile grid.

Shape for 100 TB
----------------
Scatter, not gather: each tile emits one (target_i, target_j, value)
contribution per neighborhood cell via a LITERAL offset array explode
(posexplode of a (2r+1)^2-element array built from the tile's own
coords — pure Column math, no join), then ONE exchange on the target
key finishes the aggregate.  Because the contribution rows carry the
partial-aggregable (sum, count, min, max) set, map-side combine
collapses the x9 expansion wherever the grid is stored in spatial
order (neighboring tiles share reducer keys), so the shuffle volume is
~the tile count, not 9x it.  The gather formulation (self-join on a
9-row offsets dim) shuffles BOTH sides and cannot partial-combine
before the join — strictly worse.  Edge cells simply receive fewer
contributions (n_nbrs in the output), the standard shrinking-window
edge rule; no padding rows exist anywhere.

Values are cast to DECIMAL(18,6) per contribution and decimal-summed,
so the mean is order-independent and engine-stable (the oracle replays
the same offsets-scatter in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def focal_stats(tiles: DataFrame, i_col: str = "i", j_col: str = "j",
                value_col: str = "value", radius: int = 1) -> DataFrame:
    """Per-cell neighborhood statistics over an integer tile grid.

    Returns one row per cell that has at least one tile in its
    (2·radius+1)² window: (i, j, n_nbrs, focal_sum, focal_mean,
    focal_min, focal_max).  Cells are identified by the window CENTER,
    so a cell with no tile of its own but a populated neighbor still
    appears (the standard focal raster, not a filtered self-map).
    """
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    offsets = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in range(-radius, radius + 1)
        for dj in range(-radius, radius + 1)
    ])
    contrib = tiles.withColumn("_o", F.explode(offsets)).select(
        (F.col(i_col) + F.col("_o.di")).alias("i"),
        (F.col(j_col) + F.col("_o.dj")).alias("j"),
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
    )
    agg = contrib.groupBy("i", "j").agg(
        F.count("*").alias("n_nbrs"),
        F.sum("_v").cast("double").alias("focal_sum"),
        F.min(F.col("_v").cast("double")).alias("focal_min"),
        F.max(F.col("_v").cast("double")).alias("focal_max"),
    )
    return agg.select(
        "i", "j", "n_nbrs", "focal_sum",
        (F.col("focal_sum") / F.col("n_nbrs")).alias("focal_mean"),
        "focal_min", "focal_max",
    )
