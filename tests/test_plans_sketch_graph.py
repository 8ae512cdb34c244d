"""Plan-hygiene asserts for the sketch / graph / mixing families: the
sketch exchanges must carry sketch STATE (bounded tables), the probe
joins must broadcast, and nothing falls back to Python.
"""

from __future__ import annotations

import re

from geomatics_geotk_spark import plans, queries

SF = "/root/testdata/sf0.001"


def _no_python(plan: str) -> bool:
    return "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"\(\d+\) {name}", plan))


class TestSketchGraphPlans:
    def test_hll_register_exchange_is_mapside_combined(self, spark):
        """Explode → partial max map-side → exchange → final max →
        summary agg: two exchange rounds (registers, then per-lang
        summary), partial+final HashAggregate pairs around both, no
        Python anywhere."""
        plan = plans.formatted_plan(queries.q_hll_distinct(spark, SF))
        assert _no_python(plan)
        assert _nodes(plan, "Exchange") == 2
        # register max (partial+final) + summary agg (partial+final)
        assert _nodes(plan, "HashAggregate") == 4

    def test_cms_probe_broadcasts_counters(self, spark):
        """The counter table is depth x width per lang — it must cross
        to the probe side as a broadcast, never a SortMergeJoin."""
        df = queries.q_cms_vocab(spark, SF)
        plan = plans.formatted_plan(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert _no_python(plan)

    def test_bloom_bits_broadcast_and_jvm(self, spark):
        plan = plans.formatted_plan(queries.q_bloom_dedup(spark, SF))
        assert "Broadcast" in plan and _no_python(plan)

    def test_mix_resample_corpus_never_shuffles_prejoin(self, spark):
        """Per-source cutoffs broadcast back onto the scan: the doc-side
        join must be a broadcast join; the only exchanges are the tiny
        count aggs."""
        df = queries.q_mix_resample(spark, SF)
        plan = plans.formatted_plan(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and _no_python(plan)

    def test_budget_pack_boundary_window_partitioned(self, spark):
        """Two Window nodes: the ~21-row bucket window (unpartitioned by
        design — bounded by the bucket count, never the data) and the
        row-level window PARTITIONED by qb, so no document-level window
        spans the corpus."""
        plan = plans.formatted_plan(queries.q_budget_pack(spark, SF))
        assert _nodes(plan, "Window") == 2
        assert _no_python(plan)

    def test_inverted_index_single_term_exchange_after_distinct(self, spark):
        """Explode → map-side partial distinct → term exchange → posting
        agg: the (term, doc) dedupe and the final list agg share the
        term key."""
        plan = plans.formatted_plan(queries.q_inverted_index(spark, SF))
        assert _no_python(plan)
        assert _nodes(plan, "Exchange") <= 2
