"""Streaming OHLC bars (streaming/ohlc_stream.py): finalized append-mode
bars must be BIT-IDENTICAL to the batch aggregation over the same rows,
and bars must only finalize once the watermark passes them."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from geomatics_geotk_spark.streaming import ohlc_stream

SCHEMA = "event_id long, ts timestamp, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(start_min, n, tag_offset=0):
    rows = []
    for i in range(n):
        rows.append((
            tag_offset + i,
            T0 + dt.timedelta(minutes=start_min + i * 7, seconds=i % 13),
            f"type{i % 2}",
            float((i * 37) % 100) / 10.0,
        ))
    return rows


def _batch_bars(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    okey = (
        (F.unix_micros(F.col("ts")) - F.lit(ohlc_stream.TS_BASE_US))
        * F.lit(1048576) + F.col("event_id")
    )
    return (
        df.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        )
        .select("event_type", F.col("w.start").alias("bar_start"),
                "n_events", "open", "high", "low", "close", "sum_value")
    )


def _key(r):
    return (r["event_type"], r["bar_start"])


def test_finalized_bars_match_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    b1 = _events(0, 40)                      # hours 0..4-ish
    b2 = _events(300, 30, tag_offset=1000)   # hours 5..8-ish
    flush = [(9999, T0 + dt.timedelta(days=2), "type0", 1.0)]  # watermark push

    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    bars = ohlc_stream.streaming_ohlc_bars(stream)
    q = (
        bars.writeStream.format("memory").queryName("t_ohlc")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        early = spark.sql("SELECT * FROM t_ohlc").count()
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
        q.processAllAvailable()
        spark.createDataFrame(flush, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
        q.processAllAvailable()
        got = {_key(r): r for r in spark.sql("SELECT * FROM t_ohlc").collect()}
    finally:
        q.stop()

    # nothing finalizes while the watermark still trails the open windows
    want = {_key(r): r for r in _batch_bars(spark, b1 + b2).collect()}
    assert set(got) >= set(want), sorted(set(want) - set(got))
    for k, w in want.items():
        g = got[k]
        for c in ("n_events", "open", "high", "low", "close", "sum_value"):
            assert g[c] == w[c], (k, c, g[c], w[c])
    # append-mode contract: bars emit once, after the watermark passes
    assert early < len(want)


def test_open_close_follow_event_order_not_value(spark, tmp_path):
    inp = str(tmp_path / "in2")
    rows = [
        (1, T0 + dt.timedelta(minutes=1), "t", 5.0),
        (2, T0 + dt.timedelta(minutes=2), "t", 9.0),
        (3, T0 + dt.timedelta(minutes=3), "t", 1.0),
        (4, T0 + dt.timedelta(minutes=4), "t", 7.0),
        (99, T0 + dt.timedelta(days=1), "t", 0.0),  # flush
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        ohlc_stream.streaming_ohlc_bars(stream)
        .writeStream.format("memory").queryName("t_ohlc2")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        (bar,) = [r for r in spark.sql("SELECT * FROM t_ohlc2").collect()
                  if r["bar_start"] == T0]
    finally:
        q.stop()
    assert bar["open"] == 5.0 and bar["close"] == 7.0
    assert bar["high"] == 9.0 and bar["low"] == 1.0 and bar["n_events"] == 4
