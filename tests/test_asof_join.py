"""asof_join: union-sort-window as-of semantics vs a brute-force pandas
mirror, plus direction / tolerance / how variants.

The reference has no as-of operator; this is part of the training-data
pipeline surface (event attribution / feature lookup at label time).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from geomatics_geotk_spark.operators.temporal import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(30)),
            (3, "u1", _ts(5)),   # before any right row for u1
            (4, "u2", _ts(20)),  # equal-ts tie with a right row
            (5, "u3", _ts(50)),  # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), 1.0),
            ("u1", _ts(10), 2.0),   # equal to left event 1's ts → inclusive match
            ("u1", _ts(25), 3.0),
            ("u1", _ts(31), 4.0),   # after left event 2
            ("u2", _ts(20), 5.0),   # equal-ts for left event 4
        ],
        "user_id string, ts timestamp, rv double",
    )
    return left, right


def _collect(df):
    return {r["event_id"]: r for r in df.collect()}


def test_backward_inner(spark):
    left, right = _fixture(spark)
    out = _collect(asof_join(left, right, on=["user_id"]))
    assert set(out) == {1, 2, 4}          # 3 has no prior row, 5 no key
    assert out[1]["rv"] == 2.0            # inclusive: equal ts wins over 8-min row
    assert out[2]["rv"] == 3.0            # latest <= 30 is the 25-min row
    assert out[4]["rv"] == 5.0            # equal-ts match on u2


def test_backward_left_nulls(spark):
    left, right = _fixture(spark)
    out = _collect(asof_join(left, right, on=["user_id"], how="left"))
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[3]["rv"] is None and out[3]["asof_ts"] is None
    assert out[5]["rv"] is None


def test_forward(spark):
    left, right = _fixture(spark)
    out = _collect(asof_join(left, right, on=["user_id"], direction="forward"))
    assert out[1]["rv"] == 2.0            # inclusive equal ts
    assert out[2]["rv"] == 4.0            # earliest >= 30 is the 31-min row
    assert out[3]["rv"] == 1.0            # earliest row at 8 min
    assert 5 not in out


def test_tolerance(spark):
    left, right = _fixture(spark)
    out = _collect(
        asof_join(left, right, on=["user_id"], tolerance_us=2 * 60 * 1_000_000)
    )
    # event 2's nearest prior row is 5 min away → voided by 2-min tolerance
    assert set(out) == {1, 4}


def test_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof on 2k events."""
    n = 2000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(37)).alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)
            + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000_000_000))
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 10.0).alias("value"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(2)).alias("side"),
    )
    left = ev.where(F.col("side") == 1).drop("side")
    right = (
        ev.where(F.col("side") == 0)
        .select("user_id", "ts", F.col("value").alias("rv"))
        # make (user_id, ts) unique on the right so the match is well-defined
        .groupBy("user_id", "ts").agg(F.max("rv").alias("rv"))
    )
    got = (
        asof_join(left, right, on=["user_id"], how="left")
        .select("event_id", "rv")
        .toPandas()
        .sort_values("event_id", ignore_index=True)
    )
    lp = left.toPandas().sort_values("ts", kind="mergesort", ignore_index=True)
    rp = right.toPandas().sort_values("ts", kind="mergesort", ignore_index=True)
    want = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
        .sort_values("event_id", ignore_index=True)[["event_id", "rv"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_null_payload_not_forward_filled(spark):
    """A genuinely NULL payload field in the matched right row must stay
    NULL — not be forward-filled from an older right row."""
    from geomatics_geotk_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 10, 5), (1, 20, None)], "uid long, ts long, v long"
    )
    left = spark.createDataFrame([(1, 25)], "uid long, ts long")
    row = asof_join(left, right, on=["uid"]).collect()[0]
    assert row["asof_ts"] == 20, "match is the ts=20 row"
    assert row["v"] is None, "payload must come from the MATCHED row"


def test_asof_duplicate_right_ts_deterministic(spark):
    from geomatics_geotk_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 10, "A"), (1, 10, "B")], "uid long, ts long, v string"
    )
    left = spark.createDataFrame([(1, 15)], "uid long, ts long")
    got = {
        asof_join(left, right, on=["uid"]).collect()[0]["v"]
        for _ in range(3)
    }
    assert len(got) == 1, f"must be deterministic across runs, got {got}"


def test_merge_intervals_planted(spark):
    """Overlap and touch merge; a gap starts a new run."""
    from geomatics_geotk_spark.operators.temporal import merge_intervals

    rows = [
        ("a", 1, 0, 10), ("a", 2, 5, 20),   # overlap -> one run [0,20]
        ("a", 3, 20, 25),                   # touch (begin == prev end) merges
        ("a", 4, 30, 40),                   # gap -> new run
        ("b", 5, 0, 1),                     # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, i long, begin long, end long")
    runs = sorted(
        (r["k"], r["run_begin"], r["run_end"], r["n_merged"])
        for r in merge_intervals(df, ["k"], tiebreak="i").collect()
    )
    assert runs == [("a", 0, 25, 3), ("a", 30, 40, 1), ("b", 0, 1, 1)]


def test_merge_intervals_contained_interval(spark):
    """An interval fully inside an earlier one must not split the run
    (the running-max-end formulation, not lag(end))."""
    from geomatics_geotk_spark.operators.temporal import merge_intervals

    rows = [("a", 1, 0, 100), ("a", 2, 10, 20), ("a", 3, 50, 150)]
    df = spark.createDataFrame(rows, "k string, i long, begin long, end long")
    out = merge_intervals(df, ["k"], tiebreak="i").collect()
    assert len(out) == 1 and out[0]["run_end"] == 150 and out[0]["n_merged"] == 3
