"""Plan-hygiene asserts for the round-5 TPC-H-shaped additions: the
scan-only Q6 shape must push every predicate to the parquet reader, the
Q10 top-k must be TakeOrderedAndProject (never a global sort), Q11's
global total must broadcast back (never re-scan the fact), and Q16's
distinct-supplier rewrite must collapse the pair BEFORE the part join.
"""

from __future__ import annotations

import re

from geomatics_geotk_spark import plans, queries

SF = "/root/testdata/sf0.001"


def _no_python(plan: str) -> bool:
    return "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"\(\d+\) {name}", plan))


class TestTpchPlans:
    def test_forecast_revenue_pushdown_and_pruning(self, spark):
        """Q6 shape: all three predicates reach the scan as
        PushedFilters, only the four needed columns are read, and the
        whole query is one exchange (the final single-group agg)."""
        df = queries.q_forecast_revenue(spark, SF)
        plan = plans.formatted_plan(df)
        assert _no_python(plan)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert pushed is not None
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert col in pushed.group(1), (col, pushed.group(1))
        cols = plans.scan_read_schema(df)
        assert set(cols) <= {
            "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
        }
        assert _nodes(plan, "Exchange") == 1

    def test_returned_items_topk_no_global_sort(self, spark):
        """Q10 shape: the LIMIT 20 must be TakeOrderedAndProject, and
        customer/nation must broadcast (exactly one fact-fact shuffle
        join pair on orderkey)."""
        df = queries.q_returned_items(spark, SF)
        plan = plans.formatted_plan(df)
        assert "TakeOrderedAndProject" in plan
        # any Sort nodes present belong to an SMJ pair (0 at test scale,
        # where even filtered orders broadcasts; 2 when AQE picks SMJ at
        # real scale) — never a global single-partition sort for the limit
        assert _nodes(plan, "Sort") in (0, 2)
        assert _nodes(plan, "BroadcastHashJoin") >= 2
        assert _no_python(plan)

    def test_important_parts_single_fact_scan(self, spark):
        """Q11 shape: lineitem is scanned ONCE at runtime — the total
        side's identical per-part exchange is AQE-reused (the static
        plan prints two subtrees; execution replaces the second with a
        ReusedExchange of the l_partkey hash exchange), and the 1-row
        total crosses back as a broadcast."""
        df = queries.q_important_parts(spark, SF)
        static = plans.formatted_plan(df)
        assert "BroadcastNestedLoopJoin" in static and _no_python(static)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in executed and "l_partkey" in executed

    def test_supplier_part_counts_dedup_before_join(self, spark):
        """Q16 shape: the (partkey, suppkey) dedupe aggregate must sit
        BELOW the broadcast part join — the bucket count then needs no
        distinct machinery (2 aggregates for dedupe + 2 for the count,
        all partial-aggregable)."""
        df = queries.q_supplier_part_counts(spark, SF)
        plan = plans.formatted_plan(df)
        assert _nodes(plan, "HashAggregate") == 4
        assert "Expand" not in plan  # no count-distinct expansion
        assert _nodes(plan, "BroadcastHashJoin") == 1
        assert _no_python(plan)

    def test_linestatus_priority_pushdown_and_pruning(self, spark):
        """Q12 shape: the ship-date band reaches the lineitem scan as
        PushedFilters, only the three needed lineitem columns are read,
        and the post-join aggregate is partial (2 HashAggregates over a
        2-row group space — never a pre-shuffle of raw join rows)."""
        df = queries.q_linestatus_priority(spark, SF)
        plan = plans.formatted_plan(df)
        assert _no_python(plan)
        assert "l_shipdate" in plan and "PushedFilters" in plan
        cols = plans.scan_read_schema(df)
        assert set(cols) <= {"l_orderkey", "l_linestatus", "l_shipdate"}
        assert _nodes(plan, "HashAggregate") == 2

    def test_dominant_suppliers_single_fact_scan(self, spark):
        """Q20 shape: the per-part totals re-aggregate the (part,
        supplier) rows — the static plan prints the ps subtree twice,
        but execution replaces the second with a ReusedExchange of the
        pair-key hash exchange, so lineitem is scanned ONCE per run;
        the part name filter arrives as a broadcast semi-join below the
        first aggregate and no Python enters the plan."""
        df = queries.q_dominant_suppliers(spark, SF)
        static = plans.formatted_plan(df)
        assert _no_python(static)
        assert "BroadcastHashJoin LeftSemi" in static  # part/supplier/nation semis
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in executed
