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


class TestGridDbscan:
    """Grid DBSCAN semantics on a constructed layout: two dense blobs
    bridged by a dense diagonal-neighbor cell merge into ONE cluster, a
    separated dense blob is its own cluster, and sparse-cell points are
    noise (absent from the output)."""

    def _pts(self, spark):
        # eps=1.0 cells. Cell (0,0): 5 pts, cell (1,1): 5 pts (diagonal
        # neighbors — must merge), cell (5,5): 5 pts (isolated), cell
        # (9,9): 2 pts (sparse -> noise). min_pts=4.
        rows = []
        i = 0
        for (cx, cy, n) in [(0, 0, 5), (1, 1, 5), (5, 5, 5), (9, 9, 2)]:
            for j in range(n):
                rows.append((i, cx + 0.1 + 0.05 * j, cy + 0.2 + 0.05 * j))
                i += 1
        return spark.createDataFrame(rows, "event_id long, lon double, lat double")

    def test_merge_isolate_and_noise(self, spark):
        out = clustering.grid_dbscan(
            self._pts(spark), eps=1.0, min_pts=4
        ).collect()
        by_id = {r["event_id"]: r["cluster"] for r in out}
        # noise dropped: the two (9,9) points (ids 15, 16) are absent
        assert len(by_id) == 15 and 15 not in by_id and 16 not in by_id
        # diagonal-neighbor dense cells share one component label
        blob_a = {by_id[i] for i in range(0, 10)}
        assert len(blob_a) == 1
        # the isolated dense cell is a different component (self-labeled)
        blob_b = {by_id[i] for i in range(10, 15)}
        assert len(blob_b) == 1 and blob_b != blob_a
        assert blob_b == {5 * 1_000_000 + 5}

    def test_eps_packing_bound_rejected(self, spark):
        with pytest.raises(ValueError, match="1e-3"):
            clustering.grid_dbscan(self._pts(spark), eps=1e-4, min_pts=4)
