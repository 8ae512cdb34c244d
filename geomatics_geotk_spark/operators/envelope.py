"""Envelope/extent operators — the reference's ``Extents.java`` lifted to
grouped aggregations.

``calculateEnvelope`` (``Extents.java:73-120``) is a sequential
``expandToInclude`` fold; envelope union is commutative + associative, so
Spark's partial-then-final min/max hash aggregation reproduces it exactly
while parallelizing across partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    antipode_lat,
    antipode_lon,
    envelope_to_kvp,
    round_down_2dp,
)


def envelope_agg(df: DataFrame, group_cols: list[str] | None = None,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """MBR of point sets (per group, or global with group_cols=None).

    Reference: Extents.calculateEnvelope (Extents.java:73-120).
    """
    aggs = [
        F.min(lon_col).alias("xmin"),
        F.min(lat_col).alias("ymin"),
        F.max(lon_col).alias("xmax"),
        F.max(lat_col).alias("ymax"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def envelope_agg_boxes(df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union (coalesce) of envelope rows (xmin/ymin/xmax/ymax columns).

    Reference: Extents.coalesceBoundingBoxes (Extents.java:258-274) — the
    caller harmonizes CRS first (all engine envelopes are CRS:84 lon/lat).
    """
    aggs = [
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def with_antipodal_envelope(df: DataFrame) -> DataFrame:
    """Envelope on the opposite side of the earth.

    Reference: Extents.antipodalEnvelope (Extents.java:390-413): negate
    latitude, lon ± 180, corners swap on the x axis (lon of the antipode of
    xmax may be smaller than that of xmin).
    """
    ax0 = antipode_lon(F.col("xmax"))
    ax1 = antipode_lon(F.col("xmin"))
    return (
        df.withColumn("anti_xmin", F.least(ax0, ax1))
        .withColumn("anti_ymin", -F.col("ymax"))
        .withColumn("anti_xmax", F.greatest(ax0, ax1))
        .withColumn("anti_ymax", -F.col("ymin"))
    )


def with_envelope_kvp(df: DataFrame, crs: Column | None = None) -> DataFrame:
    """KVP string per envelope row (Extents.java:364-382)."""
    crs = crs if crs is not None else F.lit("")
    return df.withColumn(
        "kvp",
        envelope_to_kvp(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), crs),
    )


def with_envelope_gml_corners(df: DataFrame) -> DataFrame:
    """lowerCorner/upperCorner strings with ordinates rounded DOWN to 2dp
    (Extents.java:191-223, RoundingMode.DOWN — not Spark's round)."""
    return (
        df.withColumn(
            "lower_corner",
            F.concat_ws(" ", round_down_2dp(F.col("xmin")).cast("string"),
                        round_down_2dp(F.col("ymin")).cast("string")),
        )
        .withColumn(
            "upper_corner",
            F.concat_ws(" ", round_down_2dp(F.col("xmax")).cast("string"),
                        round_down_2dp(F.col("ymax")).cast("string")),
        )
    )


def antipode_points(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """getAntipode per point row (Extents.java:421-431)."""
    return df.withColumn("anti_lat", antipode_lat(F.col(lat_col))).withColumn(
        "anti_lon", antipode_lon(F.col(lon_col))
    )
