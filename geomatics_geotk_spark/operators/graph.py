"""Link-graph operators for crawl prioritization.

PageRank over a directed edge list, in FIXED-POINT integer arithmetic:
ranks are BIGINT multiples of 1e-12 (SCALE = 10^12), damping d = 17/20,
and every division is integer division.  Why not float: partial
aggregation order varies with partitioning, and float sums are not
associative — integer sums are, so the result is bit-identical at any
parallelism AND bit-replayable in a DuckDB oracle (the same reason
`clustering.kmeans` sums in DECIMAL).  The quantization error is
≤ out-degree ulps per node per iteration — 1e-12-scale noise on a
statistic used for ORDERING crawl frontiers.

Scale shape: each iteration is one equi-join of the rank table onto the
edge list (both partitioned by node id — co-partitioned at scale via
bucketing on the stored edge table) plus one map-side-combined sum
exchange on dst.  State per iteration = one (node, rank) table; lineage
is truncated with localCheckpoint so iteration k does not replay 1..k-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12  # fixed-point unit: rank stored as BIGINT multiples of 1e-12
D_NUM, D_DEN = 17, 20  # damping factor d = 0.85 as an exact rational


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    out_deg: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank: returns (node, rank) with rank in SCALE units.

    r0 = SCALE // N; r_{t+1}(v) = (1-d)·SCALE//N + (d_num · Σ_{u→v} r_t(u)//deg(u)) // d_den.
    ``out_deg``: pass the constant out-degree if the generator guarantees
    one (skips the degree join); otherwise it is computed from the edges.
    Dangling mass (edges to nodes outside ``nodes``, or nodes with no
    in-links) follows the standard drop-and-baseline convention.
    """
    n_df = nodes.agg(F.count("*").alias("_n"))
    base = nodes.select(F.col(node_col).alias("node")).crossJoin(
        F.broadcast(n_df)
    )
    rank = base.select(
        "node", F.expr(f"CAST({SCALE} DIV _n AS BIGINT)").alias("rank")
    ).localCheckpoint(eager=True)

    if out_deg is None:
        deg = edges.groupBy(F.col(src_col).alias("node")).agg(
            F.count("*").alias("deg")
        )
        e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")).join(
            deg, F.col("_src") == deg["node"]
        ).select("_src", "_dst", "deg")
    else:
        e = edges.select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            F.lit(out_deg).alias("deg"),
        )

    for _ in range(iters):
        contrib = (
            e.join(rank, e["_src"] == rank["node"])
            .select(F.col("_dst").alias("node"), F.expr("rank DIV deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        rank = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST(({D_DEN - D_NUM} * {SCALE}) DIV ({D_DEN} * _n) "
                    f"+ ({D_NUM} * coalesce(m, 0)) DIV {D_DEN} AS BIGINT)"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return rank
