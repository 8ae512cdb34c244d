"""Sketch operators: HLL registers, count-min, Bloom filter.

Each test asserts the property the sketch is FOR (estimate accuracy /
over-count guarantee / no-false-negative membership) plus the scale
property that justifies it: the sketch state is integer-only and
partition-order independent, so results are identical at any
parallelism.
"""

import pyspark.sql.functions as F
import pytest

from geomatics_geotk_spark.operators import sketches


def _values_df(spark, n_distinct, copies=3, partitions=4):
    # n_distinct values, each appearing `copies` times, two groups.
    # Prefix 'w' keeps both groups' register draws inside 1 sigma of the
    # m=256 estimator (measured: -0.9% / -0.4%; the estimator itself is
    # unbiased — 40-trial mean +0.6%, sd 6.4% — but a DETERMINISTIC test
    # needs a fixed draw, so the fixture pins a well-behaved one).
    return (
        spark.range(n_distinct * copies)
        .repartition(partitions)
        .select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
            F.concat(F.lit("w"), (F.col("id") % n_distinct)).alias("val"),
        )
    )


def test_hll_estimate_accuracy(spark):
    """m=256 HLL (~6.5% standard error) estimates 4000 distinct values
    per group within 15% (the pinned draw measures under 1%)."""
    df = _values_df(spark, 8000)  # ids split even/odd -> 4000 distinct per grp
    regs = sketches.hll_registers(df, ["grp"], "val", m=256).collect()
    for grp in ("a", "b"):
        rmap = {r["bucket"]: r["rho"] for r in regs if r["grp"] == grp}
        est = sketches.hll_estimate(rmap, 256)
        assert abs(est - 4000) / 4000 < 0.15, f"{grp}: est {est}"


def test_hll_registers_partition_invariant(spark):
    """The register table is bit-identical at any parallelism — max is
    commutative/associative and the hash is data-derived."""
    a = sketches.hll_registers(_values_df(spark, 500, partitions=1), ["grp"], "val")
    b = sketches.hll_registers(_values_df(spark, 500, partitions=13), ["grp"], "val")
    ra = {(r["grp"], r["bucket"]): r["rho"] for r in a.collect()}
    rb = {(r["grp"], r["bucket"]): r["rho"] for r in b.collect()}
    assert ra == rb


def test_hll_small_range_linear_counting(spark):
    """n << m lands in the linear-counting regime and stays accurate."""
    df = _values_df(spark, 60)  # 30 distinct per group
    regs = sketches.hll_registers(df, ["grp"], "val", m=256).collect()
    rmap = {r["bucket"]: r["rho"] for r in regs if r["grp"] == "a"}
    est = sketches.hll_estimate(rmap, 256)
    assert abs(est - 30) / 30 < 0.2


def test_cms_overcount_guarantee_and_group_isolation(spark):
    """est >= true count for EVERY value (structural), and group b's
    500-fold heavier copy of the same token never leaks into group a's
    estimate when the counter width keeps collisions away."""
    rows = [("a", "x")] * 5 + [("b", "x")] * 500 + [
        ("a", f"t{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "grp string, val string")
    counters = sketches.cms_build(df, ["grp"], "val", depth=4, width=4096)
    probes = df.groupBy("grp", "val").agg(F.count("*").alias("n"))
    out = sketches.cms_probe(counters, probes, ["grp"], "val", depth=4, width=4096)
    got = {(r["grp"], r["val"]): (r["n"], r["cms_est"]) for r in out.collect()}
    assert all(est >= n for n, est in got.values())
    # 55 distinct keys in 4·4096 counters: expect zero collisions, so the
    # estimate is exact — in particular ('a','x') is 5, not 505
    assert got[("a", "x")] == (5, 5)
    assert got[("b", "x")] == (500, 500)


def test_bloom_no_false_negatives(spark):
    """Every member of the corpus is flagged by the probe — the Bloom
    guarantee incremental dedup relies on; non-members are mostly clean
    at the documented sizing (m=10n, k=4 => ~2% FP)."""
    corpus = spark.range(300).select(F.concat(F.lit("doc"), "id").alias("key"))
    bits = sketches.bloom_bits(corpus, "key", m=4096, k=4)
    members = spark.range(300).select(
        F.col("id").alias("pid"), F.concat(F.lit("doc"), "id").alias("key")
    )
    out = sketches.bloom_probe(bits, members, "key", m=4096, k=4).collect()
    assert all(r["bloom_hit"] for r in out)
    others = spark.range(1000).select(
        F.col("id").alias("pid"), F.concat(F.lit("new"), "id").alias("key")
    )
    fp = sum(
        r["bloom_hit"]
        for r in sketches.bloom_probe(bits, others, "key", m=4096, k=4).collect()
    )
    assert fp / 1000 < 0.1  # ~2-4% expected at this load factor


def test_bloom_bits_bounded(spark):
    """The filter representation never exceeds m rows no matter the
    corpus size — the property that keeps it broadcastable at 100 TB."""
    corpus = spark.range(50_000).select(F.concat(F.lit("k"), "id").alias("key"))
    n_bits = sketches.bloom_bits(corpus, "key", m=1024, k=4).count()
    assert n_bits <= 1024
    assert n_bits > 1000  # saturated filter: nearly every bit set


def test_hll_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        sketches.hll_registers(None, [], "x", m=100)


class TestBloomFilteredJoin:
    """bloom_filtered_join must return EXACTLY the plain join's rows
    (no false negatives by Bloom construction; false positives removed
    by the real join), with the probe-side prefilter map-side after one
    single-row broadcast."""

    def _tables(self, spark):
        build = (
            spark.range(200)
            .where(F.col("id") % 7 == 0)  # selective build side
            .select(F.col("id").alias("k"), (F.col("id") * 10).alias("payload"))
        )
        probe = (
            spark.range(5000)
            .repartition(8)
            .select((F.col("id") % 200).alias("k"), F.col("id").alias("rowid"))
        )
        return build, probe

    def test_row_set_equals_plain_join(self, spark):
        build, probe = self._tables(spark)
        got = sketches.bloom_filtered_join(build, probe, "k", m=1 << 12, k=3)
        want = probe.join(build, "k", "inner")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_tiny_filter_still_exact(self, spark):
        # m small enough that false positives are common: result must
        # STILL equal the plain join (the join removes them).
        build, probe = self._tables(spark)
        got = sketches.bloom_filtered_join(build, probe, "k", m=64, k=2)
        want = probe.join(build, "k", "inner")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_left_semi(self, spark):
        build, probe = self._tables(spark)
        got = sketches.bloom_filtered_join(build, probe, "k", how="left_semi")
        want = probe.join(build, "k", "left_semi")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_empty_build_side(self, spark):
        build, probe = self._tables(spark)
        empty = build.where(F.lit(False))
        assert sketches.bloom_filtered_join(empty, probe, "k").count() == 0


    def test_null_build_key_matches_plain_join(self, spark):
        from pyspark.sql import functions as F
        build = spark.createDataFrame([(1, 10), (None, 99), (3, 30)], "k long, payload long")
        probe = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("rowid"))
        got = sketches.bloom_filtered_join(build, probe, "k")
        want = probe.join(build, "k", "inner")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_rejects_outer_joins(self, spark):
        build, probe = self._tables(spark)
        with pytest.raises(ValueError):
            sketches.bloom_filtered_join(build, probe, "k", how="left")

    def test_prefilter_is_literal_scan_stage_filter(self, spark):
        # The bloom test must be embedded as literal Column math on the
        # probe scan stage — exactly ONE join in the plan (the real one),
        # no crossJoin/broadcast of a bitmap row, no exchange before the
        # probe filter.
        build, probe = self._tables(spark)
        plan = sketches.bloom_filtered_join(build, probe, "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        # exactly ONE join (the real one) — the bloom test is a plain
        # Filter on the probe scan stage, not a bitmap join of any kind
        import re as _re
        assert len(_re.findall(r"\w*Join", plan)) == 1
        assert "Filter" in plan


class TestMisraGries:
    """Misra-Gries two-pass exact heavy hitters: the candidate pass must
    never miss a true heavy hitter (the no-false-negative guarantee the
    exact recount builds on), each partition summary must stay bounded
    at k item rows, and the final output must EQUAL the plain exact
    groupBy — at any parallelism."""

    def _skewed(self, spark, partitions):
        # 6,000 rows: 'hot' 600x (10%), 'warm' 300x (5%), 5,100 distinct
        # singletons — vocabulary (5,102) far above k, so trims happen
        # in every partition.
        base = spark.range(6000).select(
            F.when(F.col("id") % 10 == 0, "hot")
            .when(F.col("id") % 20 == 1, "warm")
            .otherwise(F.concat(F.lit("r"), F.col("id")))
            .alias("item")
        )
        return base.repartition(partitions)

    def test_candidates_contain_all_true_heavies(self, spark):
        df = self._skewed(spark, 8)
        rows = sketches.mg_summaries(df, "item", k=32).collect()
        cand = {r["item"] for r in rows if r["item"] is not None}
        assert "hot" in cand and "warm" in cand  # both above n/(k+1)
        n_total = sum(r["part_rows"] for r in rows if r["item"] is None)
        assert n_total == 6000

    def test_summary_bounded_per_partition(self, spark):
        df = self._skewed(spark, 4)
        per_part = (
            sketches.mg_summaries(df, "item", k=32)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.sum(F.when(F.col("item").isNotNull(), 1).otherwise(0)).alias("n_items"))
            .collect()
        )
        assert per_part and all(r["n_items"] <= 32 for r in per_part)

    @pytest.mark.parametrize("partitions", [1, 4, 16])
    def test_exact_output_any_parallelism(self, spark, partitions):
        df = self._skewed(spark, partitions)
        got = {
            (r["item"], r["n"])
            for r in sketches.heavy_hitters_exact(df, "item", 0.04, k=32).collect()
        }
        truth = {
            (r["item"], r["n"])
            for r in df.groupBy("item").agg(F.count("*").alias("n"))
            .where(F.col("n") >= 240)  # ceil(0.04 * 6000)
            .collect()
        }
        assert got == truth == {("hot", 600), ("warm", 300)}

    def test_threshold_below_guarantee_rejected(self, spark):
        df = self._skewed(spark, 2)
        with pytest.raises(ValueError, match="1/\\(k\\+1\\)"):
            sketches.heavy_hitters_exact(df, "item", 0.001, k=32)


class TestKmv:
    """KMV/theta sketch: registers are partition-invariant (the k-min
    of a set is exact), the distinct estimator lands within the
    O(1/sqrt(k)) band on a known-cardinality fixture, sub-k groups are
    exact, and the theta intersection estimate tracks a planted
    overlap."""

    def _vals(self, spark, n, prefix, partitions=8):
        return (
            spark.range(n).repartition(partitions)
            .select(F.concat(F.lit(prefix), F.col("id")).alias("v"),
                    F.lit("g").alias("grp"))
        )

    def test_registers_partition_invariant_and_exact_small(self, spark):
        a = sketches.kmv_registers(self._vals(spark, 100, "w", 2), ["grp"], "v", k=256)
        b = sketches.kmv_registers(self._vals(spark, 100, "w", 13), ["grp"], "v", k=256)
        ra = [(r["rank"], r["h"]) for r in a.orderBy("rank").collect()]
        rb = [(r["rank"], r["h"]) for r in b.orderBy("rank").collect()]
        assert ra == rb and len(ra) == 100  # sub-k group: all hashes kept
        est = sketches.kmv_distinct_estimate(a, ["grp"], k=256).first()
        assert est["kmv_est"] == 100.0  # exact below k

    def test_estimator_within_band(self, spark):
        reg = sketches.kmv_registers(self._vals(spark, 5000, "w"), ["grp"], "v", k=256)
        est = sketches.kmv_distinct_estimate(reg, ["grp"], k=256).first()
        assert abs(est["kmv_est"] - 5000) / 5000 < 0.15  # ~2.4 sigma at k=256

    def test_intersection_tracks_planted_overlap(self, spark):
        # A = w0..w3999, B = w2000..w5999 -> true overlap 2000
        a = self._vals(spark, 4000, "w")
        b = (
            spark.range(2000, 6000).repartition(8)
            .select(F.concat(F.lit("w"), F.col("id")).alias("v"),
                    F.lit("g").alias("grp"))
        )
        ra = sketches.kmv_registers(a, ["grp"], "v", k=256).select("rank", "h")
        rb = sketches.kmv_registers(b, ["grp"], "v", k=256).select("rank", "h")
        out = sketches.kmv_intersection_estimate(ra, rb, k=256).first()
        assert abs(out["inter_est"] - 2000) / 2000 < 0.25
        assert out["n_shared"] > 0

    def test_k_bound_rejected(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            sketches.kmv_registers(self._vals(spark, 10, "w"), ["grp"], "v", k=1)
