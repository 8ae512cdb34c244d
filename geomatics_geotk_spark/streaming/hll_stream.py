"""Streaming distinct-count sketch: HLL registers over an unbounded
document stream.

The batch register builder (`operators/sketches.hll_registers`) is a
groupBy-max over integer Column math — a legal streaming aggregation —
so the SAME function builds the streaming plan: registers are the ideal
streaming state (bounded at m rows per group, monotone, merge = max —
no watermark needed because state never grows past m per group, unlike
a streaming count_distinct whose state is the distinct set itself).

Read the estimate at any time with `sketches.hll_estimate` over the
sink table: it converges to the batch estimate over the union of all
micro-batches (exactly — max is order- and batching-insensitive; the
cross-impl test asserts register equality, not approximate agreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import sketches


def streaming_hll_registers(
    stream: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    m: int = 256,
) -> DataFrame:
    """(group, bucket, rho) streaming aggregate; write with outputMode
    'update' or 'complete'."""
    toks = stream.select(
        group_col, F.explode(F.split(text_col, r"\s+")).alias("token")
    ).where(F.col("token") != "")
    return sketches.hll_registers(toks, [group_col], "token", m=m)
