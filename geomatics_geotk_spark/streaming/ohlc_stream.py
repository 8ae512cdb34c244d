"""Streaming OHLC bars: the hourly open/high/low/close resample
(`queries.q_ohlc_bars`) as a watermarked event-time window aggregate —
one code path with batch (same min_by/max_by on the same collision-proof
integer order key), so a finalized streaming bar is bit-identical to the
batch bar over the same rows.

Why this state is streaming-safe: per open bar the state is FIVE scalars
(count, min, max, and the two argmin/argmax pairs) — constant per
(event_type, window) regardless of event volume, the same reason the
HLL register stream needs no cap.  The watermark bounds how many windows
stay open; finalized bars emit once (append mode) and never revise, the
contract a downstream bar-store wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# fixture epoch rebase — keeps (epoch_us - BASE) << 20 + event_id inside
# BIGINT for any ts within ±101 days of the base (queries.q_ohlc_bars
# documents the same constant)
TS_BASE_US = 1_700_000_000_000_000


def streaming_ohlc_bars(
    stream: DataFrame,
    bar: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_type, window, n_events, open, high, low, close, sum_value)
    per finalized bar; write with outputMode 'append' (bars emit once
    the watermark passes the window end)."""
    ts = F.col(ts_col).cast("timestamp")
    okey = (
        (F.unix_micros(ts) - F.lit(TS_BASE_US)) * F.lit(1048576) + F.col(id_col)
    ).alias("_ok")
    staged = stream.select(
        ts.alias("_ts"), F.col(type_col).alias("event_type"),
        F.col(value_col).alias("value"), okey,
    ).withWatermark("_ts", watermark)
    return (
        staged.groupBy("event_type", F.window("_ts", bar).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", "_ok").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "_ok").alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            "event_type", F.col("w.start").alias("bar_start"),
            "n_events", "open", "high", "low", "close", "sum_value",
        )
    )
