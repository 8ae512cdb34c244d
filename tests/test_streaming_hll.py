"""Streaming HLL registers (streaming/hll_stream.py): the streaming
aggregate over micro-batches must converge to the BIT-IDENTICAL register
table the batch builder produces on the union — max-merge is order- and
batching-insensitive, which is the whole point of sketch state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geomatics_geotk_spark.operators import sketches
from geomatics_geotk_spark.streaming import hll_stream


def _docs(tag, n):
    return [(f"lang{i % 3}", " ".join(f"{tag}w{i}_{j}" for j in range(20)))
            for i in range(n)]


def test_streaming_registers_match_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    batch1 = spark.createDataFrame(_docs("a", 30), "lang string, text string")
    batch2 = spark.createDataFrame(_docs("b", 25), "lang string, text string")
    batch1.coalesce(1).write.mode("append").parquet(inp)

    stream = spark.readStream.schema("lang string, text string").parquet(inp)
    regs = hll_stream.streaming_hll_registers(stream, "lang", "text", m=128)
    q = (
        regs.writeStream.format("memory")
        .queryName("t_hll")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2.coalesce(1).write.mode("append").parquet(inp)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["lang"], r["bucket"]): r["rho"]
        for r in spark.sql("SELECT * FROM t_hll").collect()
    }
    want = {
        (r["lang"], r["bucket"]): r["rho"]
        for r in sketches.hll_registers(
            batch1.unionAll(batch2).select(
                "lang", F.explode(F.split("text", r"\s+")).alias("token")
            ).where(F.col("token") != ""),
            ["lang"],
            "token",
            m=128,
        ).collect()
    }
    assert got == want

    # the estimate off the streamed registers is usable as-is
    for lang in ("lang0", "lang1", "lang2"):
        rmap = {b: rho for (lg, b), rho in got.items() if lg == lang}
        est = sketches.hll_estimate(rmap, 128)
        # ~19-20 distinct tokens per doc x ~18 docs per lang, all unique
        exact = (
            batch1.unionAll(batch2)
            .where(F.col("lang") == lang)
            .select(F.explode(F.split("text", r"\s+")).alias("t"))
            .agg(F.countDistinct("t"))
            .collect()[0][0]
        )
        assert abs(est - exact) / exact < 0.25


def test_streaming_state_is_bounded(spark, tmp_path):
    """State never exceeds m rows per group no matter how many distinct
    values stream through — the property that makes this safe unbounded."""
    inp = str(tmp_path / "in2")
    spark.createDataFrame(
        [("x", " ".join(f"u{j}" for j in range(2000)))], "lang string, text string"
    ).coalesce(1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema("lang string, text string").parquet(inp)
    regs = hll_stream.streaming_hll_registers(stream, "lang", "text", m=64)
    q = (
        regs.writeStream.format("memory")
        .queryName("t_hll_bound")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) FROM t_hll_bound").collect()[0][0]
    assert n <= 64
