"""k-means over embeddings (operators/clustering.py).

Planted orthogonal clusters must be recovered exactly; determinism and
the empty-cluster fallback are part of the oracle contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark.operators import clustering


def _planted_rows(per_cluster=25, dim=16):
    """4 groups on orthogonal axes with tiny deterministic jitter,
    interleaved so vec_id 0..3 hit distinct groups (seed diversity)."""
    out = []
    for i in range(per_cluster):
        for g in range(4):
            v = [0.0] * dim
            v[g * 4] = 10.0 + (i % 5) * 0.01
            v[g * 4 + 1] = (i % 3) * 0.02
            out.append((len(out), g, v))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _planted_rows(), "vec_id long, truth int, embedding array<float>"
    )


class TestKmeans:
    def test_planted_clusters_recovered(self, spark, emb):
        assigned, cents = clustering.kmeans(emb, k=4, iters=3)
        joined = assigned.join(emb.select("vec_id", "truth"), "vec_id")
        # every planted group maps onto exactly one k-means cluster
        per = (
            joined.groupBy("truth")
            .agg(F.countDistinct("cluster").alias("nc"), F.count("*").alias("n"))
            .collect()
        )
        assert all(r["nc"] == 1 and r["n"] == 25 for r in per)
        # and distinct groups land in distinct clusters
        m = {r["truth"]: r["cluster"] for r in
             joined.select("truth", "cluster").distinct().collect()}
        assert len(set(m.values())) == 4

    def test_deterministic_across_partitionings(self, spark, emb):
        """Decimal-sum updates make centroids independent of partition
        layout — rerun on a repartitioned input, centroids bit-equal."""
        _, c1 = clustering.kmeans(emb, k=4, iters=3)
        _, c2 = clustering.kmeans(emb.repartition(7), k=4, iters=3)
        assert c1 == c2

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        """Seed 3 duplicates seed 2 exactly: the argmin tie-break (lowest
        cluster id) starves cluster 3 from the first assignment on, so
        its centroid must fall back to the seed value every update."""
        rows = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0]),
                (3, [0.0, 10.0])]  # exact duplicate of seed 2
        rows += [(i, [0.0, 10.0]) for i in range(4, 10)]
        emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        assigned, cents = clustering.kmeans(emb2, k=4, iters=2)
        got = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
        assert 3 not in got                      # cluster 3 starved by tie-break
        assert cents[3] == [pytest.approx(0.0), pytest.approx(10.0)]  # seed kept
