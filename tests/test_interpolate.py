"""IDW interpolation: weighting math vs a numpy reference, the exact-hit
floor, and the JVM-only plan."""

from __future__ import annotations

import numpy as np

from geomatics_geotk_spark import plans
from geomatics_geotk_spark.operators import interpolate


def _docs(spark):
    rows = [(i, -123.2 + 0.01 * i, 49.3 + 0.005 * i) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, lon double, lat double")


def _pois(spark):
    rows = [
        ("p1", -123.25, 49.28, 5.0),
        ("p2", -123.10, 49.35, 9.0),
        ("p3", -123.18, 49.31, 2.0),
        ("p4", -123.30, 49.40, 7.0),
        ("p5", -123.05, 49.25, 4.0),
    ]
    return spark.createDataFrame(
        rows, "poi_id string, poi_lon double, poi_lat double, poi_value double"
    )


def _hav(lat1, lon1, lat2, lon2):
    rad = 0.017453292519943295
    dlat, dlon = (lat2 - lat1) * rad / 2, (lon2 - lon1) * rad / 2
    h = np.sin(dlat) ** 2 + np.cos(lat1 * rad) * np.cos(lat2 * rad) * np.sin(dlon) ** 2
    return 12742017.6 * np.arcsin(np.sqrt(min(h, 1.0)))


class TestIdw:
    def test_matches_numpy_reference(self, spark):
        got = {r.doc_id: r for r in
               interpolate.idw_interpolate(_docs(spark), _pois(spark), k=3).collect()}
        docs = {r.doc_id: (r.lon, r.lat) for r in _docs(spark).collect()}
        pois = [tuple(r) for r in _pois(spark).collect()]
        for did, (lon, lat) in docs.items():
            d = sorted(
                (round(_hav(lat, lon, plat, plon), 3), pid, v)
                for pid, plon, plat, v in pois
            )[:3]
            w = [1e6 / (max(di, 1.0) ** 2) for di, _, _ in d]
            want = sum(wi * v for wi, (_, _, v) in zip(w, d)) / sum(w)
            r = got[did]
            assert r.n_nbrs == 3
            assert abs(r.idw_value - want) < 1e-9
            assert abs(r.nearest_dist_m - d[0][0]) < 1e-9

    def test_exact_hit_dominates(self, spark):
        docs = spark.createDataFrame(
            [(1, -123.25, 49.28)], "doc_id long, lon double, lat double"
        )
        # p1 is coincident (floor-clamped to 1 m -> w = 1e6); the others
        # sit kilometers away (w < 1), so the estimate pins to p1's value
        out = interpolate.idw_interpolate(docs, _pois(spark), k=3).collect()[0]
        assert out.nearest_dist_m == 0.0
        assert abs(out.idw_value - 5.0) < 1e-3

    def test_idw_weight_standalone(self, spark):
        nbrs = spark.createDataFrame(
            [(1, 100.0, 2.0), (1, 200.0, 8.0)],
            "doc_id long, dist_m double, poi_value double",
        )
        (r,) = interpolate.idw_weight(nbrs).collect()
        w1, w2 = 1e6 / 100.0 ** 2, 1e6 / 200.0 ** 2
        assert abs(r.idw_value - (w1 * 2.0 + w2 * 8.0) / (w1 + w2)) < 1e-12
        assert r.n_nbrs == 2 and r.nearest_dist_m == 100.0

    def test_plan_jvm_only(self, spark):
        plan = plans.formatted_plan(
            interpolate.idw_interpolate(_docs(spark), _pois(spark), k=3)
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # the broadcast POI dim
