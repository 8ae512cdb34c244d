"""Streaming stay-point detection — the cross-batch twin of
``operators.trajectory.stay_points``.

A stay is only known CLOSED when a later fix breaks the run, so the
operator is inherently stateful: ``applyInPandasWithState`` keeps ONE
open run per entity (last fix + run aggregates + the running stay
counter) and emits a stay row the moment a break closes a qualifying
run.  Aggregation math is identical to the batch operator — integer
microdegree centroid sums — so an emitted stay is bit-identical to the
batch row for the same fixes (cross-impl tested).

Ordering contract: fixes are sorted (ts, event_id) WITHIN each
micro-batch, and batches must arrive in per-entity event order (the
standard contract for sequential stateful operators; a late fix would
need watermark-buffered reordering upstream).  State is one fixed-size
row per entity, sharded by the groupBy key exactly like the batch
window's exchange — and expirable via ``state_timeout_ms`` for
unbounded entity populations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.trajectory import LON_SCALE

_OUT_SCHEMA = (
    "user_id bigint, stay_id bigint, n_points bigint, "
    "t_start timestamp, t_end timestamp, clat double, clon double"
)
# open-run register: one fixed-size row per entity
_STATE_SCHEMA = (
    "last_lat double, last_lon double, n long, t_start_us long, "
    "t_end_us long, slat long, slon long, next_stay_id long"
)


def streaming_stay_points(stream: DataFrame, max_move_deg: float = 0.25,
                          min_points: int = 2, entity_col: str = "user_id",
                          ts_col: str = "ts", order_col: str = "event_id",
                          lat_col: str = "lat", lon_col: str = "lon",
                          state_timeout_ms: int = 0) -> DataFrame:
    """Emit each stay (maximal near-stationary run of ≥ ``min_points``
    consecutive fixes) as soon as a break closes it.

    Output rows match ``operators.trajectory.stay_points`` exactly,
    including the running ``stay_id`` numbering — the stream is the
    batch decomposition evaluated incrementally.  A run still open when
    the stream ends (or when state times out) is never emitted, the
    streaming analogue of the batch operator only reporting COMPLETED
    runs it can bound.
    """
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(entity_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("event_id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
    )
    max2 = float(max_move_deg) * float(max_move_deg)

    def stays_fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_lat, last_lon, n, t0, t1, slat, slon, sid = state.get
            has_open = True
        else:
            has_open = False
            last_lat = last_lon = 0.0
            n = t0 = t1 = slat = slon = sid = 0
        out = []

        def close_run():
            if n >= min_points:
                out.append((
                    user_id, sid, n,
                    pd.Timestamp(t0, unit="us"), pd.Timestamp(t1, unit="us"),
                    slat / (n * 1e6), slon / (n * 1e6),
                ))

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, lat, lon in zip(
                pdf["ts"].astype("datetime64[us]").astype("int64"),
                pdf["lat"], pdf["lon"],
            ):
                dx = (lon - last_lon) * LON_SCALE
                dy = lat - last_lat
                if not has_open or dx * dx + dy * dy > max2:
                    close_run()  # break: the open run (if any) is final
                    has_open, sid = True, sid + 1
                    n, t0, t1, slat, slon = 0, int(ts), int(ts), 0, 0
                # extend the (possibly just-opened) run — same microdegree
                # accumulation as the batch operator
                n += 1
                t1 = int(ts)
                slat += round(lat * 1e6)
                slon += round(lon * 1e6)
                last_lat, last_lon = lat, lon
        state.update((last_lat, last_lon, n, t0, t1, slat, slon, sid))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "stay_id", "n_points",
                "t_start", "t_end", "clat", "clon",
            ])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        stays_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
