"""Streaming Misra-Gries heavy-hitter summaries: pass 1 of the
two-pass exact heavy hitters (`operators/sketches.heavy_hitters_exact`)
running CONTINUOUSLY on the ingest stream.

State per group is the mergeable MG summary itself — ≤ k (item,
residual) counters plus the running row count — merged with each
micro-batch's exact value counts and trimmed by the (k+1)-th-largest
rule (the same batched-MG reduction the batch operator applies per
Arrow batch, so the streaming state obeys the identical undercount
bound: ≤ n_g/(k+1) for a group that has streamed n_g rows).  The
guarantee that survives ANY batching schedule: every item with group
frequency > n_g/(k+1) is present in the state — candidate sets differ
between batchings (trim schedules differ), the no-false-negative
contract does not, which is why the cross-impl test asserts
completeness + the k bound rather than bit equality.

Each micro-batch emits the group's refreshed summary tagged with a
monotone ``seq`` so a reader keeps only each group's latest rows; the
engine checkpoints the state, so a restarted query resumes the summary
where it left off (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_mg_summaries(stream: DataFrame, group_col: str = "lang",
                           value_col: str = "token", k: int = 64) -> DataFrame:
    """(group, seq, item, est, rows_seen) per micro-batch — the group's
    current MG summary (``seq`` increments per batch; keep max-seq rows
    per group).  State is bounded at k counters per group."""
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(group_col).alias("grp"), F.col(value_col).cast("string").alias("val")
    ).where(F.col("val").isNotNull())

    def mg_fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (grp,) = key
        items, counts, total, seq = (
            state.get if state.exists else ([], [], 0, 0)
        )
        counters = pd.Series(list(counts), index=list(items), dtype="int64")
        for pdf in pdfs:
            vc = pdf["val"].value_counts()
            total += int(vc.sum())
            counters = vc if counters.empty else counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        seq += 1
        state.update((
            [str(i) for i in counters.index],
            [int(v) for v in counters.to_numpy()],
            total, seq,
        ))
        yield pd.DataFrame({
            "grp": grp,
            "seq": seq,
            "item": list(counters.index),
            "est": [int(v) for v in counters.to_numpy()],
            "rows_seen": total,
        })

    return keyed.groupBy("grp").applyInPandasWithState(
        mg_fn,
        outputStructType=(
            "grp string, seq long, item string, est long, rows_seen long"
        ),
        stateStructType=(
            "items array<string>, counts array<long>, total long, seq long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
