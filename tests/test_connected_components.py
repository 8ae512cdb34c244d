"""connected_components: min-label propagation + pointer doubling vs a
driver-side union-find on random graphs, plus chain/star shapes."""

from __future__ import annotations

import numpy as np

from geomatics_geotk_spark.operators.dedup import connected_components, dup_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then min-relabel per root
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _check(spark, edges, nodes):
    df = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(nodes, edges)
    for node, c in got.items():
        assert c == want[node], (node, c, want[node])


def test_long_chain(spark):
    # path 0-1-2-...-63: worst diameter; pointer doubling must still finish
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, edges, 64)


def test_two_stars_plus_bridge(spark):
    edges = [(0, i) for i in range(1, 10)] + [(100, 100 + i) for i in range(1, 10)]
    _check(spark, edges, 110)
    edges.append((5, 105))  # bridge merges the two stars
    _check(spark, edges, 110)


def test_random_graph_matches_union_find(spark):
    rng = np.random.RandomState(7)
    n = 300
    edges = [tuple(sorted(rng.randint(0, n, 2))) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges, n)


def test_dup_components_singletons_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dup_components(docs, edges).collect()}
    assert rows[0]["component"] == 0 and rows[2]["component"] == 0
    assert rows[0]["cluster_size"] == 3 and rows[2]["cluster_size"] == 3
    assert rows[5]["component"] == 5 and rows[6]["cluster_size"] == 2
    assert rows[3]["component"] == 3 and rows[3]["cluster_size"] == 1
    assert rows[3]["is_keeper"] and rows[0]["is_keeper"] and not rows[6]["is_keeper"]


def test_keeper_election_prefers_quality_over_min_id(spark):
    """The elected keeper is the argmax-quality member (doc_id only
    breaks ties) — NOT the min-id component label."""
    from pyspark.sql import functions as F

    from geomatics_geotk_spark.operators import dedup, text

    # doc 1 (low quality: punct soup) duplicates doc 2 (clean prose,
    # higher quality); doc 3 is a singleton.
    docs = spark.createDataFrame(
        [
            (1, "the of to !!! ??? ;;; !!!"),
            (2, "the quick brown fox and the lazy dog of the north is here"),
            (3, "unrelated single document text"),
        ],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    comps = dedup.dup_components(docs.select("doc_id"), edges).select(
        "doc_id", "component"
    )
    qual = text.with_quality_score(docs).select("doc_id", "quality_score")
    j = comps.join(qual, "doc_id")
    best = F.max_by(
        F.struct("doc_id", "quality_score"),
        F.struct(F.col("quality_score").alias("q"), (-F.col("doc_id")).alias("n")),
    )
    out = {
        r["component"]: r["_b"]["doc_id"]
        for r in j.groupBy("component").agg(best.alias("_b")).collect()
    }
    assert out[1] == 2, "component label is 1 (min id) but keeper must be doc 2"
    assert out[3] == 3


def test_dup_components_keeper_when_label_node_absent(spark):
    """Component labels come from the EDGE graph; if the min-id node was
    filtered out of docs upstream, the cluster must still elect a keeper
    from the PRESENT docs."""
    from geomatics_geotk_spark.operators import dedup

    docs = spark.createDataFrame([(2,), (3,)], "doc_id long")  # doc 1 absent
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup.dup_components(docs, edges).collect()}
    assert rows[2]["component"] == rows[3]["component"] == 1
    assert rows[2]["is_keeper"] is True, "min PRESENT id keeps"
    assert rows[3]["is_keeper"] is False
