"""Triangle counting: known closed forms, canonicalization tolerance,
and the skew argument's strict-order wedge rule."""

from __future__ import annotations

from geomatics_geotk_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestTriangleCounts:
    def test_k4_every_node_in_three(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        out = {r.node: r.n_triangles
               for r in graph.triangle_counts(_edges(spark, k4)).collect()}
        assert out == {0: 3, 1: 3, 2: 3, 3: 3}  # C(3,2)=3 each, 4 total

    def test_square_with_diagonal(self, spark):
        # 0-1-2-3-0 plus diagonal 0-2: triangles {0,1,2} and {0,2,3}
        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
        out = {r.node: r.n_triangles
               for r in graph.triangle_counts(_edges(spark, pairs)).collect()}
        assert out == {0: 2, 2: 2, 1: 1, 3: 1}

    def test_star_has_no_triangles(self, spark):
        star = [(0, i) for i in range(1, 8)]
        assert graph.triangle_counts(_edges(spark, star)).count() == 0

    def test_duplicates_reversals_selfloops_canonicalized(self, spark):
        messy = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2)]
        out = {r.node: r.n_triangles
               for r in graph.triangle_counts(_edges(spark, messy)).collect()}
        assert out == {0: 1, 1: 1, 2: 1}

    def test_hub_skew_closed_form(self, spark):
        # hub 100 connected to a 6-cycle's nodes: every cycle edge closes
        # one triangle through the hub -> hub in 6, each rim node in 2
        rim = [(i, (i + 1) % 6) for i in range(6)]
        spokes = [(100, i) for i in range(6)]
        out = {r.node: r.n_triangles
               for r in graph.triangle_counts(_edges(spark, rim + spokes)).collect()}
        assert out[100] == 6
        assert all(out[i] == 2 for i in range(6))
