"""Polygon measures: planar shoelace area + area-weighted centroid per
ring, computed row-wise over vertex rows — the measure companion to the
envelope/hull family (reference exposes envelopes and geodesic lengths,
``Extents.java`` / ``GeodesyUtils.java``; area/centroid are the standard
GIS measures over the same ring model, computed here set-at-a-time).

Shape for 100 TB
----------------
Vertex rows, not collected rings: each ring's vertices are rows
(ring_id, seq, lon, lat).  ONE window exchange on ring_id gives every
vertex its successor (lead, wrapping to the ring's first vertex via
first_value over the same partition); the per-edge shoelace cross terms
are then pure Column math and the final rollup REUSES the window's
hash partitioning (no second exchange).  Rings of any size distribute —
nothing ever materializes a whole ring in one task beyond the window
sort, which is the same cost every windowed trajectory op in this
engine already pays.

Engine stability: each edge term is one fixed IEEE expression of
deterministic inputs (bit-identical across engines), rounded to a fixed
decimal grid far above the double ulp at the fixture's magnitudes, then
DECIMAL-summed — so group sums are order-independent and the DuckDB
oracle can replay them hash-exact.  The signed-area convention is kept
through the centroid divide (Cx = Sx / (3·S2A)), so vertex orientation
(CW vs CCW) cancels and never needs normalizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ring_measures(vertices: DataFrame, ring_col: str = "ring_id",
                  seq_col: str = "seq", lon_col: str = "lon",
                  lat_col: str = "lat") -> DataFrame:
    """Per-ring (n_vertices, area, cx, cy) from OPEN rings (first vertex
    not repeated; the wrap edge is added internally).  Degenerate rings
    (area 0 at the rounding grid) return NULL centroids rather than an
    Inf/NaN divide."""
    w = Window.partitionBy(ring_col).orderBy(F.col(seq_col).asc())
    wp = Window.partitionBy(ring_col).orderBy(F.col(seq_col).asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lon, lat = F.col(lon_col), F.col(lat_col)
    nlon = F.coalesce(F.lead(lon_col).over(w), F.first(lon_col).over(wp))
    nlat = F.coalesce(F.lead(lat_col).over(w), F.first(lat_col).over(wp))
    cross = lon * nlat - nlon * lat
    edges = vertices.select(
        F.col(ring_col).alias("ring_id"),
        F.round(cross, 9).cast("decimal(28,9)").alias("_t"),
        F.round((lon + nlon) * cross, 6).cast("decimal(28,6)").alias("_xt"),
        F.round((lat + nlat) * cross, 6).cast("decimal(28,6)").alias("_yt"),
    )
    agg = edges.groupBy("ring_id").agg(
        F.count("*").alias("n_vertices"),
        F.sum("_t").cast("double").alias("_s2a"),
        F.sum("_xt").cast("double").alias("_sx"),
        F.sum("_yt").cast("double").alias("_sy"),
    )
    s2a = F.col("_s2a")
    safe = F.abs(s2a) > 0
    return agg.select(
        "ring_id", "n_vertices",
        (F.abs(s2a) / F.lit(2.0)).alias("area"),
        F.when(safe, F.col("_sx") / (F.lit(3.0) * s2a)).alias("cx"),
        F.when(safe, F.col("_sy") / (F.lit(3.0) * s2a)).alias("cy"),
    )
