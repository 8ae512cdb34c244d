"""Distributed k-means over an embedding column — the corpus-clustering
primitive a curation pipeline uses for topic balancing and diversity
sampling (cluster-then-sample), and the trainer behind the IVF ANN
coarse quantizer (``similarity.ann_topk_ivf`` trains on a bounded
sample; this is the full-corpus path).

Design for 10^12 rows:

- Assignment is embarrassingly parallel: one map pass per iteration, no
  shuffle — distances to the k broadcast centroids are Column
  expressions (k·dim literals), evaluated where the data lives.
- The update step reduces k·dim numbers: ONE groupBy(cluster) exchange
  whose output is k rows.  Collecting k·dim aggregates to the driver is
  bounded by model size, not data size — the same contract as any
  iterative ML driver loop.
- Per-dimension sums are computed in DECIMAL(38,18): exact decimal
  arithmetic is associative, so the result is independent of partition
  order / AQE re-planning — which both makes runs reproducible at any
  parallelism AND lets a DuckDB oracle replay every iteration
  bit-for-bit (float sums would drift with aggregation order).
- Ties in the argmin go to the lowest cluster id (``array_position``
  finds the FIRST minimum), mirrored in SQL by ``ORDER BY dist,
  cluster``.

Interpreted-HOF caveat: the per-row distance fold is a lambda Column
expression (no whole-stage codegen).  At extreme row counts swap the
assignment map for a pandas-UDF twin (same centroid literals, one numpy
matmul per batch) exactly as ``streaming/neardup_stream.py`` does for
minhash signatures — the update/collect protocol is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(v, centroid: list[float]):
    """Squared L2 distance from array column ``v`` to a centroid literal,
    folded left-to-right from 0.0 — the exact order DuckDB's
    ``list_reduce`` uses, so the doubles agree bit-for-bit."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(v, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "_v") -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid (lowest
    index wins ties).  Pure per-row Column math — no shuffle."""
    darr = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    return df.withColumn(
        "cluster", (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    )


def kmeans(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means with deterministic seeding (the k rows with
    ``id_col`` < k) and exact-decimal centroid updates.

    Returns (assignments, centroids): ``assignments`` is the input with
    a ``cluster`` column computed against the POST-update centroids;
    ``centroids`` is the final k×dim python list.  A cluster that loses
    all members keeps its previous centroid (both here and in the SQL
    oracle's COALESCE).
    """
    df = emb.select(
        id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("_v")
    )
    # iterative driver loop = one action per iteration; persist the
    # projected features so each pass reads memory/disk blocks instead of
    # re-scanning + re-casting the source (the standard MLlib pattern)
    df.persist()
    try:
        seeds = df.where(F.col(id_col) < k).orderBy(id_col).collect()
        cents = [list(r["_v"]) for r in seeds]
        dim = len(cents[0])
        sums = [
            F.sum(F.element_at("_v", d + 1).cast("decimal(38,18)")).alias(f"s{d}")
            for d in range(dim)
        ]
        for _ in range(iters):
            assigned = assign_clusters(df, cents)
            rows = assigned.groupBy("cluster").agg(F.count("*").alias("n"), *sums).collect()
            # float(Decimal) is round-to-nearest — identical to SQL's
            # CAST(DECIMAL AS DOUBLE); the division is then a scalar double op
            new = {
                r["cluster"]: [float(r[f"s{d}"]) / r["n"] for d in range(dim)]
                for r in rows
            }
            cents = [new.get(j, cents[j]) for j in range(k)]
        return assign_clusters(df, cents), cents
    finally:
        # drop the cached blocks once the iteration actions are done:
        # repeated calls in one session would otherwise accumulate
        # orphaned cache entries.  The returned assignment re-scans the
        # source once when evaluated — one scan vs a session-lifetime leak.
        df.unpersist()


def centroid_norm(centroid: list[float]) -> float:
    """L2 norm folded left-to-right from 0.0 (list_reduce order)."""
    acc = 0.0
    for x in centroid:
        acc = acc + x * x
    return math.sqrt(acc)


def grid_dbscan(pts: DataFrame, eps: float, min_pts: int,
                lon_col: str = "lon", lat_col: str = "lat",
                id_col: str = "event_id") -> DataFrame:
    """Grid DBSCAN: density clustering via the cell-graph approximation
    (points binned into eps-sided square cells; a cell is DENSE when it
    holds ≥ ``min_pts`` points; a cluster is a connected component of
    8-neighbor-adjacent dense cells; points in dense cells inherit
    their cell's component, sparse-cell points are noise and dropped).
    This is the documented grid relaxation of DBSCAN — neighborhoods
    are cell-quantized rather than exact-radius — which is what makes
    it shuffle-bounded at 10^12 points.

    Scale shape: cell assignment is map-only integer math; the ONLY
    data-sized exchange is the per-cell count (map-side combined, one
    row per occupied cell).  Everything after operates on DENSE CELLS —
    a set orders of magnitude smaller than the points: adjacency edges
    come from an 8-offset explode + self equi-join ON THE CELL KEY
    (never a distance cross-join), components from the engine's
    pointer-doubling min-label propagation
    (``dedup.connected_components``), and the point labeling is one
    equi-join back on (cx, cy) — broadcastable whenever the dense-cell
    directory fits.  Every step is integer/IEEE-deterministic, so a SQL
    oracle replays it exactly (recursive-CTE closure at oracle scale).

    Cell key packing: ``cx·10^6 + cy`` — collision-free while
    |cy| < 500,000, i.e. any geographic grid with eps ≥ 1e-3 degrees
    (enforced).  Returns (id, cx, cy, cluster); cluster = min packed
    key of the component, isolated dense cells label themselves.
    """
    if eps < 1e-3:
        raise ValueError(
            f"grid_dbscan: eps must be >= 1e-3 (cell-key packing bound), got {eps}"
        )
    if min_pts < 1:
        raise ValueError(f"grid_dbscan: min_pts must be >= 1, got {min_pts}")
    from . import dedup

    cx = F.floor(F.col(lon_col) / F.lit(float(eps))).cast("long")
    cy = F.floor(F.col(lat_col) / F.lit(float(eps))).cast("long")
    binned = pts.select(F.col(id_col), cx.alias("cx"), cy.alias("cy"))
    key = (F.col("cx") * F.lit(1_000_000) + F.col("cy")).alias("key")
    dense = (
        binned.groupBy("cx", "cy")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= F.lit(int(min_pts)))
        .select("cx", "cy", key)
    )
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ])
    probe = dense.select(
        "key",
        F.explode(offsets).alias("off"),
        F.col("cx"), F.col("cy"),
    ).select(
        "key",
        ((F.col("cx") + F.col("off.dx")) * F.lit(1_000_000)
         + (F.col("cy") + F.col("off.dy"))).alias("nkey"),
    )
    other = dense.select(F.col("key").alias("nkey"))
    edges = probe.join(other, "nkey").select(
        F.col("key").alias("id_a"), F.col("nkey").alias("id_b")
    )
    comp = dedup.connected_components(edges, "id_a", "id_b")
    labeled = dense.join(
        comp, dense["key"] == comp["node"], "left"
    ).select(
        "cx", "cy",
        F.coalesce(F.col("component"), F.col("key")).alias("cluster"),
    )
    return binned.join(labeled, ["cx", "cy"]).select(
        id_col, "cx", "cy", "cluster"
    )
