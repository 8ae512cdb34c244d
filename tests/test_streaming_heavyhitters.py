"""Streaming Misra-Gries summaries (streaming/heavyhitters_stream.py).

The candidate guarantee — every item with group frequency >
rows_seen/(k+1) is in the state — must hold at stream end for ANY
micro-batching, the state must stay bounded at k counters, and a
RESTARTED query (same checkpoint) must resume the summary rather than
start over.  Bit equality with the batch summary is deliberately NOT
asserted: trim schedules differ by batching; the contract doesn't.
"""

from __future__ import annotations

import pytest

from geomatics_geotk_spark.streaming.heavyhitters_stream import (
    streaming_mg_summaries,
)

SCHEMA = "lang string, token string"
K = 8


def _rows(heavy_n, noise_n, lang="en", tag=""):
    rows = [(lang, "hot") for _ in range(heavy_n)]
    rows += [(lang, f"r{tag}{i}") for i in range(noise_n)]
    return rows


def _latest(spark, table):
    rows = spark.sql(f"select * from {table}").collect()
    if not rows:
        return {}
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append(r)
    out = {}
    for g, rs in by_grp.items():
        mx = max(r.seq for r in rs)
        out[g] = [r for r in rs if r.seq == mx]
    return out


def test_completeness_bound_and_restart(spark, tmp_path):
    """State recovered across a QUERY RESTART (parquet sink — the
    memory sink cannot recover a checkpoint): rows_seen accumulates
    through the restart, the summary stays <= k, and the heavy item
    survives with its undercount bound."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            streaming_mg_summaries(stream, "lang", "token", k=K)
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: 40x 'hot' + 100 singletons -> hot is a 28% item
    spark.createDataFrame(_rows(40, 100, tag="a"), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    # restart from the checkpoint, stream batch 2 (more noise + heat)
    spark.createDataFrame(_rows(30, 120, tag="b"), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    rows = spark.read.parquet(outp).collect()
    mx = max(r.seq for r in rows)
    assert mx >= 2  # the restarted run really advanced the sequence
    state = [r for r in rows if r.seq == mx and r.grp == "en"]
    assert 0 < len(state) <= K
    items = {r.item: r.est for r in state}
    assert "hot" in items
    # rows_seen resumed across the restart: 140 + 150
    assert state[0].rows_seen == 290
    # undercount bound: est(hot) >= true(70) - rows/(k+1)
    assert items["hot"] >= 70 - 290 // (K + 1)


@pytest.mark.parametrize("batching", [[270], [90, 90, 90], [10, 260]])
def test_guarantee_any_batching(spark, tmp_path, batching):
    src = str(tmp_path / "src")
    rows = _rows(60, 210)  # 'hot' = 60 of 270 rows; n/(k+1) = 30
    q = None
    try:
        off = 0
        for i, n in enumerate(batching):
            chunk = rows[off:off + n]
            off += n
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            if q is None:
                stream = spark.readStream.schema(SCHEMA).parquet(src)
                out = streaming_mg_summaries(stream, "lang", "token", k=K)
                q = (
                    out.writeStream.format("memory").queryName(f"mg_b{len(batching)}_{i}")
                    .option("checkpointLocation", str(tmp_path / "ckpt"))
                    .outputMode("append")
                    .start()
                )
            q.processAllAvailable()
        state = _latest(spark, f"mg_b{len(batching)}_0")["en"]
    finally:
        if q is not None:
            q.stop()
    assert len(state) <= K
    assert "hot" in {r.item for r in state}
    assert state[0].rows_seen == 270
