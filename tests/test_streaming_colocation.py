"""Streaming co-location: emitted meets must equal the batch operator's
rows over the union of all arrived fixes — including a pair whose two
fixes arrive in DIFFERENT micro-batches (the stream-stream join state is
the point) — and each meet must emit exactly once."""

import datetime as dt

import pytest

from geomatics_geotk_spark.operators.trajectory import colocation_join
from geomatics_geotk_spark.streaming.colocation_stream import streaming_colocation


def _ts(i):
    return dt.datetime(2024, 1, 1, 10) + dt.timedelta(minutes=i)


SCHEMA = "user_id bigint, event_id bigint, ts timestamp, lat double, lon double"

# hour bucket 10:00-11:00.  users 1,2 within ~55 m (meet, both in batch 1);
# user 3 arrives in batch 2 next to user 1's batch-1 fix (CROSS-BATCH meet
# with 1 AND 2); user 4 is ~3.3 km away (never meets); user 5 is close in
# space but in the 11:00 bucket (never meets).
BATCH1 = [
    (1, 1, _ts(0), 49.0, -123.0),
    (2, 2, _ts(5), 49.0005, -123.0),
    (4, 4, _ts(10), 49.03, -123.0),
]
BATCH2 = [
    (3, 3, _ts(20), 49.0003, -123.0),
    (5, 5, _ts(70), 49.0001, -123.0),
]


def test_streaming_meets_match_batch(spark, tmp_path):
    stream_dir = str(tmp_path / "fixes")
    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    meets = streaming_colocation(stream, radius_m=2000.0, bucket_s=3600)
    q = (
        meets.writeStream.format("memory").queryName("meets_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        after_b1 = spark.sql("select * from meets_out").collect()
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        got = spark.sql("select * from meets_out").collect()
    finally:
        q.stop()

    # batch 1 alone: only (1,2)
    assert sorted((r.user_a, r.user_b) for r in after_b1) == [(1, 2)]
    # after batch 2: cross-batch meets (1,3) and (2,3) joined in, each once
    assert sorted((r.user_a, r.user_b) for r in got) == [(1, 2), (1, 3), (2, 3)]

    batch = {
        (r.user_a, r.user_b): r
        for r in colocation_join(
            spark.createDataFrame(BATCH1 + BATCH2, SCHEMA),
            radius_m=2000.0,
            bucket_s=3600,
        ).collect()
    }
    assert set(batch) == {(1, 2), (1, 3), (2, 3)}
    for r in got:
        b = batch[(r.user_a, r.user_b)]
        assert (r.bucket, r.event_a, r.event_b) == (b.bucket, b.event_a, b.event_b)
        assert r.dist_m == b.dist_m  # bit-identical refine math


def test_streaming_colocation_is_stream_stream_join(spark, tmp_path):
    stream_dir = str(tmp_path / "fixes")
    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    meets = streaming_colocation(stream)
    assert meets.isStreaming
