"""Streaming spatio-temporal co-location — the live twin of
``operators.trajectory.colocation_join``.

A meet (two entities within ``radius_m`` in the same time bucket) can
pair a fix from THIS micro-batch with one from an earlier batch, so the
operator is a watermarked stream-stream self-join: Spark keeps both
sides' recent fixes in join state, emits a meet row the moment its
second fix arrives, and evicts state once the watermark passes the
explicit time-range condition.  Join machinery is identical to the
batch operator — home-cell build side, 3x3 neighbor-ring probe side,
(cell, bucket) equi-key, ``user_a < user_b`` fold, exact haversine
refine — so an emitted meet is bit-identical to the batch row for the
same pair of fixes (cross-impl tested).

The time-range predicate (|ts_a - ts_b| <= bucket_s) is IMPLIED by
same-bucket equality and changes no results; it exists because Spark's
state cleanup reasons about event-time ranges, not derived bucket
equality — without it the join state would grow forever.  State is
therefore bounded by (watermark delay + one bucket) of fixes per side,
sharded on the same (cell, bucket) key the batch exchange uses.

Late fixes beyond the watermark are dropped by the join (standard
append-mode contract); a pair whose two fixes arrive within the
watermark window meets exactly once, whichever side arrives first.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_colocation(
    stream: DataFrame,
    radius_m: float = 2000.0,
    bucket_s: int = 3600,
    watermark: str = "10 minutes",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat_deg: float = 66.0,
) -> DataFrame:
    """Emit (user_a, user_b, bucket, event_a, event_b, dist_m) the
    moment the later fix of a qualifying pair arrives.

    Same cell/bucket/refine math as the batch operator; the extra
    ``ts`` range condition only licenses state eviction.
    """
    from ..functions import haversine_m

    lat_deg = radius_m / 111000.0
    lon_deg = radius_m / (110000.0 * math.cos(math.radians(max_abs_lat_deg)))
    cs = max(lat_deg, lon_deg)
    us_per_bucket = int(bucket_s) * 1_000_000

    def _base(side: str) -> DataFrame:
        return (
            stream.select(
                F.col(entity_col).alias(f"user_{side}"),
                F.col(order_col).alias(f"event_{side}"),
                F.col(lat_col).alias(f"_{side}lat"),
                F.col(lon_col).alias(f"_{side}lon"),
                F.col(ts_col).cast("timestamp").alias(f"_{side}ts"),
            )
            .withWatermark(f"_{side}ts", watermark)
            .withColumn(
                f"_{side}bkt",
                F.expr(f"unix_micros(_{side}ts) DIV {us_per_bucket}"),
            )
            .withColumn(f"_{side}cy", F.floor(F.col(f"_{side}lat") / F.lit(cs)))
            .withColumn(f"_{side}cx", F.floor(F.col(f"_{side}lon") / F.lit(cs)))
        )

    ring = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("_acy") + F.lit(dy)).alias("ry"),
                    (F.col("_acx") + F.lit(dx)).alias("rx"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("_r")
    probe = _base("a").select(
        "user_a", "event_a", "_alat", "_alon", "_ats", "_abkt", ring
    )
    build = _base("b")
    dist = haversine_m(
        F.col("_alat"), F.col("_alon"), F.col("_blat"), F.col("_blon")
    )
    return (
        probe.join(
            build,
            (F.col("_r.ry") == F.col("_bcy"))
            & (F.col("_r.rx") == F.col("_bcx"))
            & (F.col("_abkt") == F.col("_bbkt"))
            & (F.col("user_a") < F.col("user_b"))
            # implied by same-bucket; present so the state store can
            # evict by event time (watermark + bucket_s per side)
            & (
                F.col("_bts")
                >= F.col("_ats") - F.expr(f"INTERVAL {int(bucket_s)} SECONDS")
            )
            & (
                F.col("_bts")
                <= F.col("_ats") + F.expr(f"INTERVAL {int(bucket_s)} SECONDS")
            ),
        )
        .where(dist <= F.lit(float(radius_m)))
        .select(
            "user_a",
            "user_b",
            F.col("_abkt").alias("bucket"),
            "event_a",
            "event_b",
            dist.alias("dist_m"),
        )
    )
