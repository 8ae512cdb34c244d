"""Streaming stay-point detection: emitted stays must be bit-identical
to the batch operator's rows for the same fixes, including a run that
SPANS the micro-batch boundary (the cross-batch state is the point),
and a run still open at end-of-stream must not be emitted."""

import datetime as dt

import pytest

from geomatics_geotk_spark.operators.trajectory import stay_points
from geomatics_geotk_spark.streaming.trajectory_stream import streaming_stay_points


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


SCHEMA = "user_id bigint, event_id bigint, ts timestamp, lat double, lon double"

# user 1: stay A (3 fixes) | jump | stay B (3 fixes, SPLIT across the
# batch boundary) | jump | stay C (2 fixes — still open at stream end).
# user 2: arrives only in batch 2; one 2-fix stay closed by a jump,
# then a lone final fix (open run of 1).
BATCH1 = [
    (1, 1, _ts(0), 49.00, -123.00),
    (1, 2, _ts(1), 49.10, -123.05),
    (1, 3, _ts(2), 49.05, -123.10),
    (1, 4, _ts(3), 52.00, -120.00),   # jump closes stay A; opens B
    (1, 5, _ts(4), 52.10, -120.10),
]
BATCH2 = [
    (1, 6, _ts(5), 52.05, -120.05),   # still stay B (cross-batch)
    (1, 7, _ts(6), 58.00, -110.00),   # jump closes B; opens C
    (1, 8, _ts(7), 58.10, -110.05),
    (2, 9, _ts(0), 10.00, 10.00),
    (2, 10, _ts(1), 10.10, 10.05),
    (2, 11, _ts(2), 30.00, 30.00),    # jump closes the stay; open run of 1
]


@pytest.fixture()
def stream_dir(spark, tmp_path):
    return str(tmp_path / "fixes")


def test_emitted_stays_match_batch(spark, stream_dir, tmp_path):
    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    stays = streaming_stay_points(stream, max_move_deg=0.25, min_points=2)
    q = (
        stays.writeStream.format("memory").queryName("stays_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        got = {
            (r.user_id, r.stay_id): r
            for r in spark.sql("select * from stays_out").collect()
        }
    finally:
        q.stop()

    # closed stays only: (1,A)=stay 1, (1,B)=stay 2, (2, stay 1);
    # C and user 2's final single fix are open runs — never emitted
    assert set(got) == {(1, 1), (1, 2), (2, 1)}

    batch = {
        (r.user_id, r.stay_id): r
        for r in stay_points(
            spark.createDataFrame(BATCH1 + BATCH2, SCHEMA),
            max_move_deg=0.25, min_points=2,
        ).collect()
    }
    for k, s in got.items():
        b = batch[k]
        assert (s.n_points, s.t_start, s.t_end) == (b.n_points, b.t_start, b.t_end), k
        assert s.clat == b.clat and s.clon == b.clon, k

    # the cross-batch stay B really spans both batches
    assert got[(1, 2)].n_points == 3
    assert got[(1, 2)].t_start == _ts(3) and got[(1, 2)].t_end == _ts(5)
