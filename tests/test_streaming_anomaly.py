"""Streaming rate anomaly (streaming/anomaly_stream.py).

Contract: over an in-order stream the emitted (closed-hour) rows are
BIT-IDENTICAL to the batch `stats.rolling_zscore` over the same hours,
for any micro-batching; state survives a query restart (the trailing
baseline resumes, it does not restart cold); state stays bounded.
"""

from __future__ import annotations

import datetime as dt

import pytest

from geomatics_geotk_spark.operators import stats
from geomatics_geotk_spark.streaming.anomaly_stream import (
    streaming_rate_anomaly,
)

SCHEMA = "event_type string, ts timestamp"
BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

TRAIL, MIN_OBS = 6, 3


def _events(counts_by_hour, etype="click"):
    """counts_by_hour: list of per-hour event counts, hour i = BASE+i h."""
    rows = []
    for i, n in enumerate(counts_by_hour):
        for j in range(n):
            rows.append((etype, BASE + dt.timedelta(hours=i, minutes=j % 60)))
    return rows


def _batch_reference(spark, counts_by_hour, closed_upto, etype="click"):
    """rolling_zscore over the hourly count series, hours < closed_upto."""
    rows = [(etype, BASE + dt.timedelta(hours=i), n)
            for i, n in enumerate(counts_by_hour)]
    df = spark.createDataFrame(rows, "event_type string, hour timestamp, n long")
    out = stats.rolling_zscore(df, ["event_type"], "hour", "n",
                               trailing=TRAIL, min_obs=MIN_OBS).collect()
    lim = BASE + dt.timedelta(hours=closed_upto)
    return {(r["event_type"], r["hour"]): (r["n"], r["n_base"],
                                           r["sum_base"], r["z"])
            for r in out if r["hour"] < lim}


@pytest.mark.parametrize("split", [None, 4, 9])
def test_matches_batch_any_batching(spark, tmp_path, split):
    counts = [5, 6, 5, 7, 5, 6, 5, 30, 5, 6, 4, 5]  # spike at hour 7
    rows = _events(counts)
    chunks = [rows] if split is None else [
        [r for r in rows if r[1] < BASE + dt.timedelta(hours=split)],
        [r for r in rows if r[1] >= BASE + dt.timedelta(hours=split)],
    ]
    src = str(tmp_path / "src")
    q = None
    name = f"ra_{split}"
    try:
        for chunk in chunks:
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "append").parquet(src)
            if q is None:
                stream = spark.readStream.schema(SCHEMA).parquet(src)
                q = (
                    streaming_rate_anomaly(stream, trailing=TRAIL,
                                           min_obs=MIN_OBS)
                    .writeStream.format("memory").queryName(name)
                    .option("checkpointLocation", str(tmp_path / "ckpt"))
                    .outputMode("append").start()
                )
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    got = {(r.event_type, r.hour): (r.n, r.n_base, r.sum_base, r.z)
           for r in spark.sql(f"select * from {name}").collect()}
    # the last hour (11) stays open and never emits
    want = _batch_reference(spark, counts, closed_upto=11)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert got[k][3] == want[k][3], k  # bit-identical z


def test_restart_resumes_baseline(spark, tmp_path):
    """After a checkpoint restart the trailing baseline carries over:
    the post-restart spike is scored against PRE-restart hours."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            streaming_rate_anomaly(stream, trailing=TRAIL, min_obs=MIN_OBS)
            .writeStream.format("parquet").option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    counts1 = [4, 6, 4, 6, 4]          # hours 0..4 (hour 4 stays open)
    counts2 = [6, 40, 5]               # hours 5..7 arrive post-restart
    spark.createDataFrame(_events(counts1), SCHEMA).coalesce(1).write.mode(
        "append").parquet(src)
    run_once()
    rows2 = [(et, ts) for et, ts in _events([0] * 5 + counts2)]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode(
        "append").parquet(src)
    run_once()

    got = {r.hour: r for r in spark.read.parquet(outp).collect()}
    want = _batch_reference(spark, counts1 + counts2, closed_upto=7)
    assert set(got) == {h for (_, h) in want}
    spike_hour = BASE + dt.timedelta(hours=6)
    # spike baseline spans the restart: 6 closed hours 0..5
    assert got[spike_hour].n_base == TRAIL
    assert got[spike_hour].sum_base == sum([4, 6, 4, 6, 4, 6])
    for (_, h), vals in want.items():
        r = got[h]
        assert (r.n, r.n_base, r.sum_base, r.z) == vals, h
