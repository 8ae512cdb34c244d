"""Streaming rate-anomaly detection: the trailing-baseline z-score
(`operators/stats.rolling_zscore`, `queries.q_rate_anomaly`) as a
stateful stream — per event_type, hourly counts scored against the
last ``trailing`` CLOSED hours the moment their hour closes.

One scoring rule with batch: z = (n·m − s1)/sqrt(m·s2 − s1²) over the
trailing closed-hour counts, computed in IEEE doubles from integer
sums — for an in-order stream the emitted rows are bit-identical to
the batch operator's rows over the same closed hours (tested), for
ANY micro-batching.

Why this state is streaming-safe: per key it is the trailing ring of
``trailing`` closed hourly counts plus the currently-open hour
buckets — constant-size regardless of event volume (the same reason
the OHLC bar state is five scalars).  An hour CLOSES when a strictly
newer hour arrives for the key; events that arrive for an
already-closed hour are dropped from scoring (the streaming
lateness contract — size the micro-batch/watermark to the feed's
disorder; the batch twin over the full data is the backfill
corrector).  Emits are append-only: a closed hour's score never
revises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HOUR_US = 3_600_000_000


def streaming_rate_anomaly(stream: DataFrame, type_col: str = "event_type",
                           ts_col: str = "ts", trailing: int = 24,
                           min_obs: int = 12) -> DataFrame:
    """(event_type, hour, n, n_base, sum_base, z) per CLOSED hour with a
    ≥ ``min_obs`` baseline and nonzero variance — the same row contract
    and values as ``stats.rolling_zscore`` over the closed hours.  Write
    with outputMode 'append'."""
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(type_col).alias("event_type"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    ).where(F.col("_us").isNotNull())

    def score_fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (etype,) = key
        if state.exists:
            open_hours, open_counts, trail = state.get
            opens = dict(zip(open_hours, open_counts))
            trail = list(trail)
        else:
            opens, trail = {}, []
        # the close frontier is the minimum hour still open in the PRIOR
        # state (not the dict as this batch fills it — within a batch all
        # hours are simultaneous): anything older was already closed and
        # scored — drop it (lateness contract in the module docstring)
        frontier_min = min(opens) if opens else None
        for pdf in pdfs:
            hrs = (pdf["_us"] // _HOUR_US).astype("int64")
            for h, c in hrs.value_counts().items():
                h = int(h)
                if frontier_min is not None and h < frontier_min:
                    continue
                opens[h] = opens.get(h, 0) + int(c)
        out = []
        if opens:
            frontier = max(opens)
            for h in sorted(k for k in opens if k < frontier):
                n = opens.pop(h)
                m = len(trail)
                if m >= min_obs:
                    s1 = sum(trail)
                    s2 = sum(v * v for v in trail)
                    den = m * s2 - s1 * s1
                    if den > 0:
                        z = float(n * m - s1) / float(den) ** 0.5
                        out.append((h, n, m, s1, z))
                trail.append(n)
                if len(trail) > trailing:
                    trail = trail[-trailing:]
        state.update((
            [int(h) for h in sorted(opens)],
            [int(opens[h]) for h in sorted(opens)],
            [int(v) for v in trail],
        ))
        yield pd.DataFrame({
            "event_type": etype,
            "hour": pd.to_datetime([h * 3600 for h, *_ in out], unit="s"),
            "n": [n for _, n, *_ in out],
            "n_base": [m for _, _, m, _, _ in out],
            "sum_base": [s1 for *_, s1, _ in out],
            "z": [z for *_, z in out],
        })

    return keyed.groupBy("event_type").applyInPandasWithState(
        score_fn,
        outputStructType=(
            "event_type string, hour timestamp, n long, n_base long, "
            "sum_base long, z double"
        ),
        stateStructType=(
            "open_hours array<long>, open_counts array<long>, "
            "trail array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
