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


class TestGeodesicArea:
    def test_small_square_matches_analytic(self, spark):
        # 0.01 x 0.01 deg square at lat 49.5: spherical area ~
        # (s·rad)^2 · cos(mid_lat) · R^2, good to ~1e-4 relative
        import math
        s = 0.01
        rows = [("q", 0, -123.0, 49.5), ("q", 1, -123.0 + s, 49.5),
                ("q", 2, -123.0 + s, 49.5 + s), ("q", 3, -123.0, 49.5 + s)]
        (r,) = measures.ring_geodesic_area(_rings(spark, rows)).collect()
        rad = math.pi / 180.0
        want = (s * rad) ** 2 * math.cos((49.5 + s / 2) * rad) * 6371008.8 ** 2
        assert abs(r.area_m2 - want) / want < 1e-3
        assert r.n_vertices == 4

    def test_orientation_cancels_spherical(self, spark):
        ccw = [("a", i, x, y) for i, (x, y) in enumerate(
            [(-123.0, 49.5), (-122.98, 49.5), (-122.98, 49.52), (-123.0, 49.52)])]
        cw = [("b", i, x, y) for i, (x, y) in enumerate(
            [(-123.0, 49.5), (-123.0, 49.52), (-122.98, 49.52), (-122.98, 49.5)])]
        out = {r.ring_id: r.area_m2 for r in
               measures.ring_geodesic_area(_rings(spark, ccw + cw)).collect()}
        assert abs(out["a"] - out["b"]) / out["a"] < 1e-6

    def test_agrees_with_planar_shoelace_for_tiny_ring(self, spark):
        import math
        rows = [("t", 0, -123.0, 49.5), ("t", 1, -122.99, 49.502),
                ("t", 2, -122.995, 49.51)]
        (g,) = measures.ring_geodesic_area(_rings(spark, rows)).collect()
        (p,) = measures.ring_measures(_rings(spark, rows)).collect()
        rad = math.pi / 180.0
        approx = p.area * rad * rad * math.cos(49.504 * rad) * 6371008.8 ** 2
        assert abs(g.area_m2 - approx) / approx < 1e-3
