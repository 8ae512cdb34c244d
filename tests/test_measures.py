"""Ring measures: shoelace area + centroid against analytic shapes,
orientation invariance, degenerate rings, and the single-exchange plan."""

from __future__ import annotations

import re

from geomatics_geotk_spark import plans
from geomatics_geotk_spark.operators import measures


def _rings(spark, rows):
    return spark.createDataFrame(rows, "ring_id string, seq int, lon double, lat double")


class TestRingMeasures:
    def test_unit_square_and_triangle(self, spark):
        rows = [
            # unit square CCW, centroid (0.5, 0.5)
            ("sq", 0, 0.0, 0.0), ("sq", 1, 1.0, 0.0),
            ("sq", 2, 1.0, 1.0), ("sq", 3, 0.0, 1.0),
            # right triangle legs 3,4 -> area 6, centroid (1, 4/3)
            ("tri", 0, 0.0, 0.0), ("tri", 1, 3.0, 0.0), ("tri", 2, 0.0, 4.0),
        ]
        out = {r.ring_id: r for r in measures.ring_measures(_rings(spark, rows)).collect()}
        assert abs(out["sq"].area - 1.0) < 1e-9
        assert abs(out["sq"].cx - 0.5) < 1e-9 and abs(out["sq"].cy - 0.5) < 1e-9
        assert abs(out["tri"].area - 6.0) < 1e-9
        assert abs(out["tri"].cx - 1.0) < 1e-9 and abs(out["tri"].cy - 4.0 / 3.0) < 1e-9
        assert out["sq"].n_vertices == 4 and out["tri"].n_vertices == 3

    def test_orientation_cancels(self, spark):
        ccw = [("a", i, x, y) for i, (x, y) in
               enumerate([(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)])]
        cw = [("b", i, x, y) for i, (x, y) in
              enumerate([(0.0, 0.0), (0.0, 1.0), (2.0, 1.0), (2.0, 0.0)])]
        out = {r.ring_id: r for r in
               measures.ring_measures(_rings(spark, ccw + cw)).collect()}
        for k in ("a", "b"):
            assert abs(out[k].area - 2.0) < 1e-9
            assert abs(out[k].cx - 1.0) < 1e-9 and abs(out[k].cy - 0.5) < 1e-9

    def test_degenerate_ring_null_centroid(self, spark):
        rows = [("z", 0, 1.0, 1.0), ("z", 1, 2.0, 2.0), ("z", 2, 3.0, 3.0)]
        (r,) = measures.ring_measures(_rings(spark, rows)).collect()
        assert r.area == 0.0 and r.cx is None and r.cy is None

    def test_plan_single_exchange(self, spark):
        rows = [("a", 0, 0.0, 0.0), ("a", 1, 1.0, 0.0), ("a", 2, 0.0, 1.0)]
        plan = plans.formatted_plan(measures.ring_measures(_rings(spark, rows)))
        # the rollup must reuse the window's ring_id hash partitioning
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
