"""Temporal operators — ISO 19108 relations as interval joins + aggregates.

The reference evaluates one relation per call
(``TemporalUtils.assertTemporalRelation``, ``TemporalUtils.java:57-66``);
here a relation is a join *condition* (pure Column expressions from
:func:`functions.temporal_relation`) so Catalyst can plan it as a range
join, and the aggregate/bucketing utilities lift ``temporalExtent`` and
``splitInterval``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import temporal_relation


def interval_join(left: DataFrame, right: DataFrame, rel: str,
                  suffix: str = "_r") -> DataFrame:
    """left ⋈ right on temporal relation ``rel`` between (begin,end) pairs.

    Instants are rows with ``end IS NULL``.  Equality-shaped relations
    (Meets/MetBy/Equals/Begins/…) include an equi-key so Catalyst plans a
    hash join instead of a nested-loop: e.g. Meets joins on
    ``coalesce(l.end, l.begin) = r.begin``.
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + suffix)
    b1, e1 = F.col("begin"), F.col("end")
    b2, e2 = F.col("begin" + suffix), F.col("end" + suffix)
    cond = temporal_relation(rel, b1, e1, b2, e2)
    return left.join(r, cond, "inner")


def temporal_extent(df: DataFrame, group_cols: list[str] | None = None,
                    begin_col: str = "begin", end_col: str = "end") -> DataFrame:
    """min(begin)−1h .. max(end)+1h (TemporalUtils.java:97-125).

    The reference's TreeSet comparator discards DURING/EQUALS members
    (TemporalComparator.java:13-40) but a contained member never extends
    the extent, so plain min/max matches its output exactly.
    """
    end_norm = F.coalesce(F.col(end_col), F.col(begin_col))
    aggs = [
        (F.min(begin_col) - F.expr("INTERVAL 1 HOUR")).alias("extent_begin"),
        (F.max(end_norm) + F.expr("INTERVAL 1 HOUR")).alias("extent_end"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def split_interval(df: DataFrame, n: int,
                   begin_col: str = "begin", end_col: str = "end") -> DataFrame:
    """Each period row → n contiguous equal sub-periods (each MEETS next).

    Reference: TemporalUtils.splitInterval (TemporalUtils.java:150-164).
    Implemented as sequence+explode — the tumbling-window bucketing shape.
    Sub-second remainders follow integer microsecond division (step =
    floor(duration/n); the final sub-period absorbs the remainder, ending
    exactly at ``end`` as the reference does).
    """
    # cast: parquet TIMESTAMP_NTZ → session-TZ instant (unix_micros needs it)
    b = F.unix_micros(F.col(begin_col).cast("timestamp"))
    e = F.unix_micros(F.col(end_col).cast("timestamp"))
    step = ((e - b) / n).cast("long")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    out = df.withColumn("_i", idx)
    sub_b = b + F.col("_i") * step
    sub_e = F.when(F.col("_i") == n - 1, e).otherwise(sub_b + step)
    return (
        out.withColumn("sub_index", F.col("_i").cast("int"))
        .withColumn("sub_begin", F.timestamp_micros(sub_b))
        .withColumn("sub_end", F.timestamp_micros(sub_e))
        .drop("_i")
    )


def temporal_sort(df: DataFrame, begin_col: str = "begin", end_col: str = "end") -> DataFrame:
    """Total order per TemporalComparator (begin, then end) —
    time/TemporalComparator.java:13-40 (the DURING→0 discard quirk is a
    TreeSet artifact, not an ordering one)."""
    return df.orderBy(F.col(begin_col).asc(), F.coalesce(F.col(end_col), F.col(begin_col)).asc())
