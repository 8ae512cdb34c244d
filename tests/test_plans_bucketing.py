"""Plan-hygiene assertions (the .explain checks scale depends on) and
bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark import plans, queries
from geomatics_geotk_spark.operators import spatial_join
from geomatics_geotk_spark.sources import bucketing
from geomatics_geotk_spark.sources.documents import synth_documents, zones_table

SF = "/root/testdata/sf0.001"


class TestPlanHygiene:
    def test_pip_join_is_broadcast(self, spark):
        df = queries.q_pip_convex(spark, SF)
        assert plans.plan_has_broadcast(df)
        assert "SortMergeJoin" not in plans.formatted_plan(df)

    def test_revenue_join_is_broadcast(self, spark):
        df = queries.q_revenue_by_nation(spark, SF)
        assert plans.plan_has_broadcast(df)

    def test_column_pruning_reaches_scan(self, spark):
        """tile pipeline projecting (doc_id, cell_id) must not read the
        lineitem-width of the documents table — only doc_id + text feed
        the derived columns."""
        df = queries.q_tile_assign(spark, SF)
        cols = plans.scan_read_schema(df)
        assert "o_orderkey" in cols
        assert "o_totalprice" not in cols and "o_orderdate" not in cols

    def test_filter_pushdown_reaches_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = li.where(F.col("l_quantity") > 49).select("l_orderkey", "l_quantity")
        assert plans.plan_has_pushed_filters(df)

    def test_flagship_refine_is_jvm_only(self, spark):
        """The broadcast pip join must contain no Python/Arrow eval node —
        the refine is Column math inside codegen."""
        docs = synth_documents(spark, 100)
        tiled = spatial_join.tile_assign(spatial_join.decode_geo_spans(docs), 12)
        joined = spatial_join.spatial_join(
            tiled, zones_table(spark, grid=4), res=12, strategy="broadcast"
        )
        plan = plans.formatted_plan(joined)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_agg_has_mapside_partial(self, spark):
        """Partial + final HashAggregate around one exchange — the
        map-side-combine shape (AQE hides codegen ids pre-execution, so
        assert the aggregation topology instead)."""
        plan = plans.formatted_plan(queries.q_pricing_summary(spark, SF))
        assert plan.count("HashAggregate") >= 2
        assert "Exchange" in plan


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def tables(self, spark):
        docs = spatial_join.tile_assign(
            spatial_join.decode_geo_spans(synth_documents(spark, 2000)), 10
        ).select("doc_id", "cell_id")
        zones = docs.select("cell_id").distinct().withColumn(
            "zone_tag", F.pmod(F.col("cell_id"), F.lit(7))
        )
        bucketing.write_bucketed(docs, "t_docs_b", n_buckets=8)
        bucketing.write_bucketed(zones, "t_zones_b", n_buckets=8)
        yield "t_docs_b", "t_zones_b"
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_zones_b")

    def test_no_shuffle_exchange(self, spark, tables):
        lt, rt = tables
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketing.bucketed_join(spark, lt, rt)
            plan = plans.formatted_plan(j)
            assert "Exchange" not in plan  # co-located: no shuffle at all
            assert j.count() == 2000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_rows_match_unbucketed(self, spark, tables):
        lt, rt = tables
        j = bucketing.bucketed_join(spark, lt, rt)
        plain = spark.table(lt).join(spark.table(rt), "cell_id")
        assert j.count() == plain.count()
