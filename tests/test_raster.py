"""Raster focal statistics: edge rules, radius-0 identity, and the
one-exchange scatter plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from geomatics_geotk_spark import plans
from geomatics_geotk_spark.operators import raster


def _grid(spark, n=4):
    r = spark.range(n * n)
    return r.select(
        (F.col("id") % n).alias("i"),
        F.floor(F.col("id") / n).alias("j"),
        (F.col("id") * 0.25).alias("value"),
    )


class TestFocalStats:
    def test_radius0_is_identity(self, spark):
        out = raster.focal_stats(_grid(spark), radius=0).collect()
        assert all(r.n_nbrs == 1 for r in out)
        by_cell = {(r.i, r.j): r for r in out}
        assert len(by_cell) == 16
        for (i, j), r in by_cell.items():
            assert abs(r.focal_mean - (j * 4 + i) * 0.25) < 1e-12
            assert r.focal_min == r.focal_max == r.focal_sum

    def test_edge_counts_shrinking_window(self, spark):
        """Center cells of the (n+2)^2 focal output: corners of the
        GRID see 4 tiles, grid edges 6, interior 9; halo cells outside
        the grid see 1..4 — total (n+2)^2 minus the 4 halo corners
        which see exactly 1 tile each (they appear, never padded)."""
        out = {(r.i, r.j): r.n_nbrs
               for r in raster.focal_stats(_grid(spark, n=4), radius=1).collect()}
        assert len(out) == 36  # 6x6 window-center cells
        assert out[(0, 0)] == 4 and out[(3, 3)] == 4        # grid corners
        assert out[(1, 0)] == 6 and out[(0, 2)] == 6        # grid edges
        assert out[(1, 1)] == 9 and out[(2, 2)] == 9        # interior
        assert out[(-1, -1)] == 1 and out[(4, 4)] == 1      # halo corners
        assert out[(-1, 0)] == 2 and out[(4, 2)] == 3       # halo sides

    def test_focal_mean_matches_brute(self, spark):
        rows = {(r.i, r.j): r.value for r in _grid(spark, n=5).collect()}
        got = {(r.i, r.j): r for r in
               raster.focal_stats(_grid(spark, n=5), radius=1).collect()}
        for (ci, cj), r in got.items():
            nbrs = [rows[(ci + di, cj + dj)]
                    for di in (-1, 0, 1) for dj in (-1, 0, 1)
                    if (ci + di, cj + dj) in rows]
            assert r.n_nbrs == len(nbrs)
            assert abs(r.focal_sum - sum(nbrs)) < 1e-9
            assert r.focal_min == min(nbrs) and r.focal_max == max(nbrs)

    def test_plan_single_exchange_no_python(self, spark):
        plan = plans.formatted_plan(raster.focal_stats(_grid(spark), radius=1))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2  # partial+final
