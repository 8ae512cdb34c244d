"""Per-cell occupancy statistics — the skew-detection half of the
engine's explicit hot-cell handling (north rule).

``cell_histogram`` is a plain hash aggregation (map-side partials);
``hot_cells`` thresholds it (driver-collects only the tiny hot set);
``skew_report`` summarizes the distribution for lineage/metrics.  The
spatial join's salting policy consumes ``hot_cells`` to decide which
cells get replicated zone rows + salted doc keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(docs: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    """(cell_id, n_docs) — one exchange, partial aggregation before it."""
    return docs.groupBy(cell_col).agg(F.count("*").alias("n_docs"))


def hot_cells(docs: DataFrame, threshold: int, cell_col: str = "cell_id",
              sample_fraction: float | None = None) -> list[int]:
    """Cell ids whose (estimated) count exceeds ``threshold``.

    With ``sample_fraction`` the histogram runs on a deterministic sample
    and scales the threshold — at 10^12 docs the exact histogram is a full
    shuffle; a 1% sample finds every cell that matters for salting.
    """
    d = docs
    thr = threshold
    if sample_fraction:
        d = docs.sample(sample_fraction, seed=42)
        thr = max(1, int(threshold * sample_fraction))
    rows = (
        cell_histogram(d, cell_col)
        .where(F.col("n_docs") > thr)
        .select(cell_col)
        .collect()
    )
    return [r[cell_col] for r in rows]


def skew_report(docs: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    """One-row distribution summary: cells, docs, max/avg occupancy and
    the max/avg skew ratio that decides whether salting is worth it."""
    h = cell_histogram(docs, cell_col)
    agg = h.agg(
        F.count("*").alias("n_cells"),
        F.sum("n_docs").alias("n_docs"),
        F.max("n_docs").alias("max_cell"),
        (F.sum("n_docs") / F.count("*")).alias("avg_cell"),
    )
    return agg.withColumn("skew_ratio", F.col("max_cell") / F.col("avg_cell"))


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    exact: bool = True, accuracy: int = 10_000) -> DataFrame:
    """Per-group quantiles of a numeric column — the distribution-monitor
    primitive a curation pipeline runs constantly (doc-length / quality /
    token-count percentiles per language or source).

    Output: (group_col, n, p50, p90, ... one column per prob, named
    ``p{100*prob:g}`` with '.' → '_').

    Scale shape: ONE hash-aggregate exchange either way, partial
    aggregation before it.  ``exact=True`` uses ``percentile()`` —
    correct at any scale but its per-group state is the full value
    multiset, so at 10^12 rows per group it is memory-unbounded.  The
    100 TB path is ``exact=False``: ``percentile_approx`` (the
    Greenwald-Khanna sketch) has O(accuracy) state per group, partials
    MERGE map-side like any sketch, and rank error is bounded by
    1/accuracy — the same exact-small / sketch-large split as
    hll_distinct vs count(distinct).
    """
    def name(p: float) -> str:
        return "p" + f"{100 * p:g}".replace(".", "_")

    parr = "array(" + ", ".join(repr(p) for p in probs) + ")"
    if exact:
        q = F.expr(f"percentile({value_col}, {parr})")
    else:
        q = F.expr(f"percentile_approx({value_col}, {parr}, {accuracy})")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"), q.alias("_q")
    )
    return agg.select(
        group_col, "n",
        *[F.col("_q")[i].alias(name(p)) for i, p in enumerate(probs)],
    )
