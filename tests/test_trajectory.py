"""Trajectory operators: stay-point detection + radial simplification.

Hand-computed fixtures (small tracks where the runs are obvious), an
order-invariance check (input row order must not change the result —
the window sort owns ordering), and a plan assertion that lag +
running-sum share one Exchange/Sort (the single-window-exchange
contract the docstring promises for 100 TB).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark.operators.trajectory import (
    LON_SCALE,
    od_flows,
    simplify_radial,
    speed_filter,
    speed_flags,
    stay_points,
)


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, lat double, lon double"
    )


@pytest.fixture(scope="module")
def track(spark):
    # user 1: 3 tight fixes (stay), a big jump, 2 tight fixes (stay),
    # a lone far fix (run of 1 → filtered by min_points).
    # user 2: every step huge → all runs length 1 → no stays.
    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (1, 2, _ts(1), 49.1, -123.05),
        (1, 3, _ts(2), 49.05, -123.1),
        (1, 4, _ts(3), 52.0, -120.0),
        (1, 5, _ts(4), 52.1, -120.1),
        (1, 6, _ts(5), 58.0, -110.0),
        (2, 7, _ts(0), 10.0, 10.0),
        (2, 8, _ts(1), 20.0, 20.0),
        (2, 9, _ts(2), 30.0, 30.0),
    ]
    return rows


def test_stay_points_runs_and_centroids(spark, track):
    out = stay_points(_pts(spark, track), max_move_deg=0.25, min_points=2)
    rows = {(r.user_id, r.stay_id): r for r in out.collect()}
    assert set(rows) == {(1, 1), (1, 2)}
    first = rows[(1, 1)]
    assert first.n_points == 3
    assert first.t_start == _ts(0) and first.t_end == _ts(2)
    assert first.clat == pytest.approx((49.0 + 49.1 + 49.05) / 3, abs=1e-5)
    assert first.clon == pytest.approx((-123.0 - 123.05 - 123.1) / 3, abs=1e-5)
    second = rows[(1, 2)]
    assert second.n_points == 2
    assert second.clat == pytest.approx(52.05, abs=1e-5)


def test_stay_points_order_invariant(spark, track):
    fwd = stay_points(_pts(spark, track)).collect()
    rev = stay_points(_pts(spark, list(reversed(track))).repartition(5)).collect()
    key = lambda r: (r.user_id, r.stay_id)  # noqa: E731
    assert sorted(map(tuple, fwd), key=lambda t: t[:2]) == sorted(
        map(tuple, rev), key=lambda t: t[:2]
    )


def test_simplify_keeps_endpoints_and_big_steps(spark, track):
    kept = simplify_radial(_pts(spark, track), tolerance_deg=0.45)
    ids = sorted(r.event_id for r in kept.collect())
    # user 1: 1 (first), 4 and 6 (big steps), 2/3/5 dropped... except 6
    # is also last.  step 1→2: dy=.1 dx=.05*.65 → small.  step 3→4 and
    # 5→6 are huge.  step 4→5 small.  user 2: every step ≥ 10 deg.
    assert ids == [1, 4, 6, 7, 8, 9]


def test_simplify_single_fix_kept(spark):
    one = _pts(spark, [(9, 1, _ts(0), 0.0, 0.0)])
    assert simplify_radial(one).count() == 1


def test_threshold_is_strict_boundary(spark):
    # displacement exactly == tolerance: stay_points BREAKS only on
    # strictly-greater, simplify keeps on >=.  Use dy only (no LON_SCALE
    # rounding): 0.25 exactly.
    rows = [(1, 1, _ts(0), 0.0, 0.0), (1, 2, _ts(1), 0.25, 0.0)]
    st = stay_points(_pts(spark, rows), max_move_deg=0.25, min_points=2)
    assert st.count() == 1  # not a break → one 2-point stay
    kept = simplify_radial(_pts(spark, rows), tolerance_deg=0.25)
    assert kept.count() == 2  # >= keeps the second fix anyway (also last)


def test_single_window_exchange_plan(spark, track):
    """lag and the running sum share partitioning+ordering → exactly one
    Exchange(hashpartitioning(user_id)) in the pre-aggregation plan."""
    df = stay_points(_pts(spark, track))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    # one for the window, one for the (user_id, stay_id) rollup; AQE may
    # elide the second into the first's partitioning but never adds more.
    assert n_exchange <= 2, plan
    assert plan.count("Window") <= 2  # lag+sum folded, not one per expr


def test_od_flows_transitions(spark):
    # user 1: stays at cells (0,0) → (1,1) → (0,0): two trips, one a
    # reverse; user 2: single stay → no trip; self-loop user 3 kept.
    stays = spark.createDataFrame(
        [
            (1, 1, _ts(0), 0.1, 0.1),
            (1, 2, _ts(10), 0.6, 0.6),
            (1, 3, _ts(20), 0.2, 0.2),
            (2, 1, _ts(0), 5.0, 5.0),
            (3, 1, _ts(0), 9.1, 9.1),
            (3, 2, _ts(5), 9.2, 9.2),
        ],
        "user_id bigint, stay_id bigint, t_start timestamp, clat double, clon double",
    )
    out = {
        (r.o_lat_cell, r.o_lon_cell, r.d_lat_cell, r.d_lon_cell): (r.trips, r.entities)
        for r in od_flows(stays, cell_deg=0.5).collect()
    }
    assert out == {
        (0, 0, 1, 1): (1, 1),
        (1, 1, 0, 0): (1, 1),
        (18, 18, 18, 18): (1, 1),  # self-loop kept
    }


def test_od_flows_composes_with_stay_points(spark, track):
    # end-to-end: fixes → stays → flows; user 1's two stays are one trip
    stays = stay_points(_pts(spark, track), max_move_deg=0.25, min_points=2)
    rows = od_flows(stays, cell_deg=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.trips, r.entities) == (1, 1)
    # origin ≈ (49.05, -123.05) → cells (98, -247); dest ≈ (52.05, -120.05)
    assert (r.o_lat_cell, r.o_lon_cell) == (98, -247)
    assert (r.d_lat_cell, r.d_lon_cell) == (104, -241)


def test_stay_zones_plan_shape(spark):
    """The trajectory × PIP composition stays JVM-only and narrow: no
    Python eval anywhere, the zone side broadcast, and exactly two wide
    edges — the fix window exchange and the final zone rollup (the stay
    rollup must reuse the window's user_id partitioning)."""
    from geomatics_geotk_spark import queries

    df = queries.q_stay_zones(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def _ref_stays(fixes, max_move=0.25, min_points=2):
    """Sequential reference: gaps-and-islands by hand, per user."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, ts, lat, lon in fixes:
        by_user[u].append((ts, e, lat, lon))
    out = {}
    for u, fx in by_user.items():
        fx.sort()
        runs, run = [], []
        prev = None
        for ts, e, lat, lon in fx:
            if prev is not None:
                dx = (lon - prev[1]) * LON_SCALE
                dy = lat - prev[0]
                if dx * dx + dy * dy > max_move * max_move:
                    runs.append(run)
                    run = []
            run.append((ts, lat, lon))
            prev = (lat, lon)
        runs.append(run)
        for sid, r in enumerate(runs, start=1):
            if len(r) < min_points:
                continue
            n = len(r)
            slat = sum(round(lat * 1e6) for _, lat, _ in r)
            slon = sum(round(lon * 1e6) for _, _, lon in r)
            out[(u, sid)] = (
                n, min(t for t, _, _ in r), max(t for t, _, _ in r),
                slat / (n * 1e6), slon / (n * 1e6),
            )
    return out


def _ref_simplify(fixes, tol=0.45):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, ts, lat, lon in fixes:
        by_user[u].append((ts, e, lat, lon))
    kept = set()
    for u, fx in by_user.items():
        fx.sort()
        for i, (ts, e, lat, lon) in enumerate(fx):
            if i == 0 or i == len(fx) - 1:
                kept.add(e)
                continue
            plat, plon = fx[i - 1][2], fx[i - 1][3]
            dx = (lon - plon) * LON_SCALE
            dy = lat - plat
            if dx * dx + dy * dy >= tol * tol:
                kept.add(e)
    return kept


def test_property_matches_sequential_reference(spark):
    """Seeded-random property check (one Spark pass per operator):
    random walks with occasional jumps, single-fix users, and repeated
    coordinates must produce exactly the runs / kept-set a sequential
    scan computes — the relational gaps-and-islands decomposition is
    equivalent to the imperative definition on arbitrary tracks."""
    import random

    rng = random.Random(7)
    fixes, eid = [], 0
    for u in range(10):
        n = rng.choice([1, 2, 5, 30, 80])
        lat, lon = rng.uniform(48, 52), rng.uniform(-124, -120)
        for i in range(n):
            eid += 1
            fixes.append((u, eid, _ts(i), round(lat, 6), round(lon, 6)))
            if rng.random() < 0.25:  # jump: breaks the run
                lat += rng.uniform(0.5, 2.0) * rng.choice([-1, 1])
                lon += rng.uniform(0.5, 2.0) * rng.choice([-1, 1])
            else:  # dwell wiggle, sometimes exactly zero movement
                if rng.random() < 0.2:
                    continue
                lat += rng.uniform(-0.05, 0.05)
                lon += rng.uniform(-0.05, 0.05)
    df = _pts(spark, fixes)

    got = {
        (r.user_id, r.stay_id): (r.n_points, r.t_start, r.t_end, r.clat, r.clon)
        for r in stay_points(df, max_move_deg=0.25, min_points=2).collect()
    }
    exp = _ref_stays(fixes)
    assert set(got) == set(exp)
    for k, (n, t0, t1, clat, clon) in exp.items():
        gn, gt0, gt1, gclat, gclon = got[k]
        assert (gn, gt0, gt1) == (n, t0, t1), k
        assert abs(gclat - clat) < 1e-12 and abs(gclon - clon) < 1e-12, k

    kept = {r.event_id for r in simplify_radial(df, tolerance_deg=0.45).collect()}
    assert kept == _ref_simplify(fixes)


def test_lon_scale_documented(spark):
    assert LON_SCALE == 0.65


# ---------------------------------------------------------------------------
# speed_flags / speed_filter — implied-speed GPS QC
# ---------------------------------------------------------------------------


def test_speed_flags_planted(spark):
    # ~111 km per degree of latitude.  One minute between fixes:
    # 0.001° (~111 m, ~1.85 m/s) is fine at vmax=50; 1° (~111 km,
    # ~1,850 m/s) is a teleport.  First fix never a spike.
    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (1, 2, _ts(1), 49.001, -123.0),   # ~1.85 m/s   ok
        (1, 3, _ts(2), 50.001, -123.0),   # ~1850 m/s   spike
        (1, 4, _ts(3), 50.002, -123.0),   # ~1.85 m/s   ok (predecessor-anchored)
    ]
    out = {r.event_id: r.is_spike for r in speed_flags(_pts(spark, rows), vmax_mps=50.0).collect()}
    assert out == {1: False, 2: False, 3: True, 4: False}


def test_speed_flags_dt_zero_and_negative(spark):
    # duplicate timestamp with movement → dt == 0 → spike (no NaN/inf);
    # duplicate timestamp with NO movement is still dt <= 0 → spike by
    # the documented teleport-in-time rule.
    rows = [
        (7, 1, _ts(0), 49.0, -123.0),
        (7, 2, _ts(0), 49.5, -123.0),   # same ts, moved → spike
        (7, 3, _ts(0), 49.5, -123.0),   # same ts, no move → still dt<=0 spike
        (7, 4, _ts(9), 49.5001, -123.0),  # 540 s later, ~11 m → ok
    ]
    out = {r.event_id: r.is_spike for r in speed_flags(_pts(spark, rows), vmax_mps=50.0).collect()}
    assert out == {1: False, 2: True, 3: True, 4: False}


def test_speed_filter_drops_and_preserves_schema(spark):
    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (1, 2, _ts(1), 50.0, -123.0),   # spike
        (1, 3, _ts(2), 50.001, -123.0),
    ]
    df = _pts(spark, rows)
    kept = speed_filter(df, vmax_mps=50.0)
    assert kept.columns == df.columns  # flag column dropped, order kept
    assert {r.event_id for r in kept.collect()} == {1, 3}


def test_speed_flags_single_window_exchange(spark):
    rows = [(1, 1, _ts(0), 49.0, -123.0), (1, 2, _ts(1), 49.1, -123.0)]
    df = speed_flags(_pts(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "pythonUDF" not in plan and "ArrowEval" not in plan, plan


# ---------------------------------------------------------------------------
# colocation_join — spatio-temporal encounter pairs
# ---------------------------------------------------------------------------


def test_colocation_planted_pairs(spark):
    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (2, 2, _ts(5), 49.0005, -123.0),   # ~55 m, same hour   → meet
        (3, 3, _ts(70), 49.0, -123.0),     # next hour bucket   → no meet w/ 1,2
        (4, 4, _ts(1), 49.03, -123.0),     # ~3.3 km from 1     → no meet
    ]
    from geomatics_geotk_spark.operators.trajectory import colocation_join

    out = colocation_join(_pts(spark, rows), radius_m=2000.0, bucket_s=3600)
    meets = [(r.user_a, r.user_b) for r in out.collect()]
    assert meets == [(1, 2)]


def test_colocation_cross_cell_boundary(spark):
    # default cell size = 2000/(110000*cos 66°) ≈ 0.0447°; lons 0.0446 and
    # 0.0448 land in DIFFERENT home cells but are ~22 m apart — only the
    # 3x3 neighbor ring finds this pair.
    rows = [
        (1, 1, _ts(0), 0.0, 0.0446),
        (2, 2, _ts(1), 0.0, 0.0448),
    ]
    from geomatics_geotk_spark.operators.trajectory import colocation_join

    out = colocation_join(_pts(spark, rows), radius_m=2000.0, bucket_s=3600).collect()
    assert len(out) == 1 and (out[0].user_a, out[0].user_b) == (1, 2)
    assert out[0].dist_m < 30.0


def test_colocation_no_self_pairs_and_single_emit(spark):
    # one user twice in one bucket → no self pair; a true pair is emitted
    # exactly ONCE (ring cells distinct + home cell unique + a<b fold).
    rows = [
        (5, 1, _ts(0), 49.0, -123.0),
        (5, 2, _ts(1), 49.0001, -123.0),
        (6, 3, _ts(2), 49.0002, -123.0),
    ]
    from geomatics_geotk_spark.operators.trajectory import colocation_join

    out = colocation_join(_pts(spark, rows)).collect()
    pairs = sorted((r.user_a, r.user_b, r.event_a, r.event_b) for r in out)
    assert pairs == [(5, 6, 1, 3), (5, 6, 2, 3)]


def test_colocation_plan_no_cartesian_no_python(spark):
    rows = [(1, 1, _ts(0), 49.0, -123.0), (2, 2, _ts(1), 49.0, -123.0)]
    from geomatics_geotk_spark.operators.trajectory import colocation_join

    df = colocation_join(_pts(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "pythonUDF" not in plan and "ArrowEval" not in plan, plan


# ---------------------------------------------------------------------------
# simplify_error — directed Hausdorff raw→simplified
# ---------------------------------------------------------------------------


def test_simplify_error_planted(spark):
    # tol 0.45 keeps only endpoints A(49.0) and C(49.5) (B's step is 0.1);
    # B's nearest kept fix is A at 0.1 scaled-degrees → err = 0.1.
    from geomatics_geotk_spark.operators.trajectory import simplify_error

    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (1, 2, _ts(1), 49.1, -123.0),
        (1, 3, _ts(2), 49.5, -123.0),
    ]
    out = simplify_error(_pts(spark, rows), tolerance_deg=0.45).collect()
    assert len(out) == 1
    assert out[0].n_fixes == 3
    assert abs(out[0].err_sdeg - 0.1) < 1e-12


def test_simplify_error_zero_when_nothing_dropped(spark):
    from geomatics_geotk_spark.operators.trajectory import simplify_error

    rows = [
        (1, 1, _ts(0), 49.0, -123.0),
        (1, 2, _ts(1), 49.9, -123.0),   # step 0.9 ≥ tol → kept
        (1, 3, _ts(2), 49.0, -122.0),
    ]
    out = simplify_error(_pts(spark, rows), tolerance_deg=0.45).collect()
    assert out[0].err_sdeg == 0.0


def test_simplify_error_smj_two_exchanges(spark):
    # the 100 TB shape: with the kept side too big to broadcast, the
    # entity-keyed SMJ's partitioning serves BOTH rollups — exactly two
    # hash exchanges in the whole plan, no Python.
    from geomatics_geotk_spark.operators.trajectory import simplify_error

    rows = [(1, i, _ts(i), 49.0 + i * 0.01, -123.0) for i in range(6)]
    df = _pts(spark, rows)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = simplify_error(df, tolerance_deg=0.45)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "pythonUDF" not in plan and "ArrowEval" not in plan, plan


class TestSnapToSegments:
    SEGS = [(0, 0.0, 0.0, 10.0, 0.0), (1, 5.0, -1.0, 5.0, 1.0)]

    def test_projection_and_clamp(self, spark):
        from geomatics_geotk_spark.operators import trajectory

        pts = spark.createDataFrame(
            [(1, 2.0, 0.3), (2, -4.0, 0.1), (3, 14.0, -0.2)],
            "event_id long, lon double, lat double",
        )
        got = {
            r["event_id"]: r["snap"]
            for r in trajectory.snap_to_segments(pts, self.SEGS).collect()
        }
        # interior projection onto seg 0 at t=0.2
        assert got[1]["sid"] == 0 and abs(got[1]["t"] - 0.2) < 1e-12
        assert abs(got[1]["d2"] - 0.09) < 1e-12
        # beyond segment start: clamped to t=0
        assert got[2]["sid"] == 0 and got[2]["t"] == 0.0
        # beyond segment end: clamped to t=1
        assert got[3]["sid"] == 0 and got[3]["t"] == 1.0

    def test_tiebreak_lowest_sid(self, spark):
        from geomatics_geotk_spark.operators import trajectory

        # (5, 0.5) is exactly 0.5 from seg 0 (projection (5,0)) and 0.5
        # from seg 1 (projection (5,0.5) is ON seg 1 → d2=0) — pick a
        # true tie instead: (4,0) lies ON seg 0 (d2=0) and 1.0² + ... —
        # use a symmetric point: (5,0) is on BOTH segments (d2=0 each)
        pts = spark.createDataFrame([(1, 5.0, 0.0)], "event_id long, lon double, lat double")
        got = trajectory.snap_to_segments(pts, self.SEGS).collect()[0]["snap"]
        assert got["d2"] == 0.0 and got["sid"] == 0

    def test_degenerate_segment_raises(self, spark):
        import pytest

        from geomatics_geotk_spark.operators import trajectory

        pts = spark.createDataFrame([(1, 0.0, 0.0)], "event_id long, lon double, lat double")
        with pytest.raises(ValueError):
            trajectory.snap_to_segments(pts, [(0, 1.0, 1.0, 1.0, 1.0)])

    def test_plan_is_single_map_pass(self, spark):
        """Zero exchanges, zero Python nodes — the snap must be one
        scan-stage Column fold."""
        from geomatics_geotk_spark.operators import trajectory

        pts = spark.createDataFrame([(1, 5.0, 0.0)], "event_id long, lon double, lat double")
        plan = (
            trajectory.snap_to_segments(pts, self.SEGS)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestResampleTrack:
    def _pts(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
        )

    def test_ticks_owned_once_and_interpolated(self, spark):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, 1, t0, 0.0, 0.0),
            (1, 2, t0 + dt.timedelta(seconds=100), 10.0, 20.0),
            (1, 3, t0 + dt.timedelta(seconds=250), 40.0, 50.0),
        ]
        from geomatics_geotk_spark.operators import trajectory
        out = sorted(
            trajectory.resample_track(self._pts(spark, rows), period_s=50).collect(),
            key=lambda r: r.tick_us,
        )
        base = int(t0.timestamp()) * 1_000_000
        # grid ticks at +50s, +100s (owned by leg 1: (0,100]), +150, +200,
        # +250 (owned by leg 2: (100,250]) — five ticks, each exactly once
        assert [r.tick_us - base for r in out] == [
            50_000_000, 100_000_000, 150_000_000, 200_000_000, 250_000_000]
        assert (out[0].lon, out[0].lat) == (5.0, 10.0)    # midpoint of leg 1
        assert (out[1].lon, out[1].lat) == (10.0, 20.0)   # endpoint tick
        assert abs(out[2].lon - 20.0) < 1e-12             # 1/3 into leg 2
        assert (out[4].lon, out[4].lat) == (40.0, 50.0)

    def test_same_bucket_leg_emits_nothing(self, spark):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1, 0, 0, 10)
        rows = [(1, 1, t0, 0.0, 0.0),
                (1, 2, t0 + dt.timedelta(seconds=5), 1.0, 1.0)]
        from geomatics_geotk_spark.operators import trajectory
        assert trajectory.resample_track(self._pts(spark, rows), period_s=3600).count() == 0

    def test_single_window_exchange_no_python(self, spark):
        import datetime as dt
        import re
        from geomatics_geotk_spark import plans
        from geomatics_geotk_spark.operators import trajectory
        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, 1, t0, 0.0, 0.0),
                (1, 2, t0 + dt.timedelta(hours=13), 1.0, 1.0)]
        plan = plans.formatted_plan(
            trajectory.resample_track(self._pts(spark, rows), period_s=21600))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "Generate" in plan  # the map-side sequence explode


class TestLegCells:
    """Supercover rasterization semantics: the diagonal leg covers
    exactly the cells the segment passes through (not the full bbox),
    axis-aligned and degenerate legs stay total, and edge-touching
    counts as traversal."""

    def test_diagonal_covers_crossed_cells_only(self, spark):
        from geomatics_geotk_spark.operators import trajectory
        # leg (0.05, 0.05) -> (0.25, 0.15) on a 0.1 grid: bbox is 3x2
        # cells but the segment only passes through (0,0),(1,0),(1,1),(2,1)
        legs = spark.createDataFrame(
            [(1, 0.05, 0.05, 0.25, 0.15)],
            "leg_id long, plon double, plat double, lon double, lat double",
        )
        got = {
            (r["cx"], r["cy"])
            for r in trajectory.leg_cells(legs, 0.1).collect()
        }
        assert got == {(0, 0), (1, 0), (1, 1), (2, 1)}

    def test_vertical_leg_and_point_leg(self, spark):
        from geomatics_geotk_spark.operators import trajectory
        legs = spark.createDataFrame(
            [
                (1, 0.15, 0.05, 0.15, 0.35),  # vertical: dx == 0
                (2, 0.45, 0.45, 0.45, 0.45),  # zero-length: both deltas 0
            ],
            "leg_id long, plon double, plat double, lon double, lat double",
        )
        out = trajectory.leg_cells(legs, 0.1).collect()
        v = {(r["cx"], r["cy"]) for r in out if r["leg_id"] == 1}
        p = {(r["cx"], r["cy"]) for r in out if r["leg_id"] == 2}
        assert v == {(1, 0), (1, 1), (1, 2), (1, 3)}
        assert p == {(4, 4)}

    def test_bad_cell_size_rejected(self, spark):
        import pytest as _pytest
        from geomatics_geotk_spark.operators import trajectory
        legs = spark.createDataFrame(
            [(1, 0.0, 0.0, 1.0, 1.0)],
            "leg_id long, plon double, plat double, lon double, lat double",
        )
        with _pytest.raises(ValueError, match="positive"):
            trajectory.leg_cells(legs, 0.0)
