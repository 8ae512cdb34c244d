"""Streaming tile assignment: the batch decode/tile operators applied to a
readStream source — identical Column expressions, so batch/stream parity
is structural, not re-implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.spatial_join import decode_geo_spans, tile_assign

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def streaming_tile_assign(spark, path: str, res: int = 12,
                          with_event_time: bool = True) -> DataFrame:
    """readStream over a parquet directory of interleaved documents →
    (doc_id, spans, lon, lat, cell_id[, event_time])."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(path)
    out = tile_assign(decode_geo_spans(stream), res)
    if with_event_time:
        # deterministic synthetic event time derived from doc_id (test
        # sources carry no timestamp; real feeds supply their own column)
        out = out.withColumn(
            "event_time",
            F.timestamp_seconds(
                F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(3600))
            ),
        )
    return out


def streaming_spatial_join(assigned: DataFrame, zones: DataFrame,
                           res: int = 12) -> DataFrame:
    """Stream-static point-in-polygon join: the streaming tile-assigned
    docs equi-join the (static, broadcastable) zone-cell table and refine
    with the same JVM Column crossing-number as the batch operator —
    batch/stream parity is structural.

    Returns the streaming DataFrame of (doc columns…, zone_id) matches.
    """
    from pyspark.sql import functions as F

    from ..functions import point_in_polygon_col
    from ..operators.spatial_join import prepare_zones

    zone_cells, _ = prepare_zones(zones, res)
    joined = assigned.join(F.broadcast(zone_cells), "cell_id", "inner")
    pip = point_in_polygon_col(
        F.col("lon"), F.col("lat"), F.col("exterior"), F.col("interiors")
    )
    return joined.where(F.col("full") | pip).drop("full", "exterior", "interiors")


def streaming_cell_counts(assigned: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window doc counts per cell — the streaming
    rollup feeding hot-cell (skew) detection."""
    return (
        assigned.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("cell_id"))
        .agg(F.count("*").alias("n_docs"))
    )
