"""Trajectory operators over ordered point streams.

Per-entity ordered geometry — the moving-object view of the reference's
point/temporal kernels (``TemporalUtilities`` ordering semantics,
reference TemporalUtilities.java:40-70, applied to the per-user event
stream): stay-point detection (maximal runs of near-stationary
consecutive fixes) via the classic gaps-and-islands decomposition, and
radial-distance track simplification.

Scale shape: everything here is pure Column math over ONE window
exchange on the entity key (lag + running-sum share the same
partitioning/ordering, so Catalyst plans a single Exchange + Sort) plus
one aggregation exchange on (entity, run).  No Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Rational stand-in for cos(mid-latitude) so the break predicate is pure
# rational arithmetic — bit-identical between Spark and any SQL oracle
# evaluating the same expression tree (no libm in the hot predicate).
LON_SCALE = 0.65


def stay_points(
    pts: DataFrame,
    max_move_deg: float = 0.25,
    min_points: int = 2,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Maximal runs of consecutive fixes where every step moves less than
    ``max_move_deg`` (scaled-degree equirectangular distance), per entity.

    Gaps-and-islands: a step whose scaled displacement exceeds the
    threshold (or the first fix of an entity) BREAKS the run; the running
    sum of breaks labels each fix with its run id; runs with at least
    ``min_points`` fixes are stay points.  Output one row per stay:
    (entity, stay_id, n_points, t_start, t_end, clat, clon) where the
    centroid is the integer-microdegree-summed mean (order-independent
    across engines/partitionings).

    100 TB shape: lag + running-sum use the SAME window spec → one
    Exchange(entity) + one Sort; the stay rollup is one more exchange on
    (entity, stay_id).  Entities are the natural partition key of a
    trajectory store, so a table bucketed by entity runs this with zero
    wide shuffles.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two selects: the break flag must be a PLAIN column before the
    # running sum windows over it (Spark rejects window-over-window in
    # one projection); both windows share partitioning+ordering, so
    # Catalyst still plans a single Exchange + Sort.
    stepped = pts.select(
        F.col(entity_col),
        F.col(ts_col),
        F.col(order_col),
        F.col(lat_col),
        F.col(lon_col),
        F.lag(lat_col).over(w).alias("_plat"),
        F.lag(lon_col).over(w).alias("_plon"),
    )
    dx = (F.col(lon_col) - F.col("_plon")) * F.lit(LON_SCALE)
    dy = F.col(lat_col) - F.col("_plat")
    brk = (
        F.when(F.col("_plat").isNull(), F.lit(1))
        .when(dx * dx + dy * dy > F.lit(max_move_deg) * F.lit(max_move_deg), F.lit(1))
        .otherwise(F.lit(0))
    )
    labeled = stepped.select(
        F.col(entity_col),
        F.col(ts_col),
        F.col(lat_col),
        F.col(lon_col),
        F.sum(brk).over(run_w).alias("stay_id"),
    )
    # centroid accumulated as exact integer MICRODEGREES: round(x*1e6) is
    # the same double → same integer in every engine (a double→decimal
    # cast is NOT — DuckDB truncates where Spark rounds half-up), and the
    # bigint sum is order-independent.  1 µdeg ≈ 0.1 m — ample for a stay
    # centroid.
    ulat = F.round(F.col(lat_col) * F.lit(1000000.0)).cast("bigint")
    ulon = F.round(F.col(lon_col) * F.lit(1000000.0)).cast("bigint")
    stays = labeled.groupBy(entity_col, "stay_id").agg(
        F.count("*").alias("n_points"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        F.sum(ulat).alias("_slat"),
        F.sum(ulon).alias("_slon"),
    )
    return stays.where(F.col("n_points") >= min_points).select(
        entity_col,
        "stay_id",
        "n_points",
        "t_start",
        "t_end",
        (F.col("_slat") / (F.col("n_points") * F.lit(1000000.0))).alias("clat"),
        (F.col("_slon") / (F.col("n_points") * F.lit(1000000.0))).alias("clon"),
    )


def od_flows(
    stays: DataFrame,
    cell_deg: float = 0.5,
    entity_col: str = "user_id",
) -> DataFrame:
    """Origin→destination transition matrix over the stay sequence.

    Consecutive stays of one entity (ordered by t_start, stay_id) form a
    trip; origin/destination are the stay centroids snapped to a
    ``cell_deg`` grid (floor division — identical IEEE double op in any
    engine).  Output one row per (o_cell, d_cell): trip count + distinct
    entities, the mobility-flow rollup (self-loops kept — a same-cell
    move is a real observation).

    100 TB shape: the window runs over the STAY table (orders of
    magnitude smaller than fixes) on the same entity partitioning the
    stay rollup just produced, and the flow rollup is one
    map-side-combinable exchange on the 4-int cell key.  distinct
    entities per flow is the only partial-agg-resistant term; a hot flow
    cell is a hot KEY, never a window straggler.
    """
    w = Window.partitionBy(entity_col).orderBy("t_start", "stay_id")
    inv = F.lit(1.0 / cell_deg)
    cells = stays.select(
        F.col(entity_col),
        F.col("t_start"),
        F.col("stay_id"),
        F.floor(F.col("clat") * inv).alias("_olat"),
        F.floor(F.col("clon") * inv).alias("_olon"),
    )
    trips = cells.select(
        F.col(entity_col),
        F.col("_olat").alias("o_lat_cell"),
        F.col("_olon").alias("o_lon_cell"),
        F.lead("_olat").over(w).alias("d_lat_cell"),
        F.lead("_olon").over(w).alias("d_lon_cell"),
    ).where(F.col("d_lat_cell").isNotNull())
    return trips.groupBy("o_lat_cell", "o_lon_cell", "d_lat_cell", "d_lon_cell").agg(
        F.count("*").alias("trips"),
        F.countDistinct(entity_col).alias("entities"),
    )


def simplify_radial(
    pts: DataFrame,
    tolerance_deg: float = 0.1,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Radial-distance track simplification: keep a fix iff it moves at
    least ``tolerance_deg`` (scaled-degree) from the LAST KEPT fix.

    The sequential "last kept" anchor is re-expressed relationally with
    the standard two-window decomposition: a fix is kept iff the step
    from its predecessor exceeds the tolerance OR it is the entity's
    first/last fix (endpoint-preserving, the same contract as the
    reference's removeConsecutiveDuplicates last-point rule, reference
    GeodesyUtils.java:283 — generalized from exact-duplicate to
    tolerance).  This is the well-defined one-pass variant
    (predecessor-anchored, not kept-anchored): deterministic, pure
    Column, one window exchange — where true Douglas–Peucker would need
    per-entity recursion (applyInPandas), this keeps the 100 TB path
    JVM-only.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    dx = (F.col(lon_col) - F.lag(lon_col).over(w)) * F.lit(LON_SCALE)
    dy = F.col(lat_col) - F.lag(lat_col).over(w)
    first = F.lag(lat_col).over(w).isNull()
    last = F.lead(lat_col).over(w).isNull()
    big = dx * dx + dy * dy >= F.lit(tolerance_deg) * F.lit(tolerance_deg)
    return pts.withColumn("_keep", first | last | big).where(F.col("_keep")).drop("_keep")


def speed_flags(
    pts: DataFrame,
    vmax_mps: float = 55.0,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """GPS quality control: flag fixes whose implied speed from the
    PREVIOUS fix exceeds ``vmax_mps`` (``is_spike`` boolean column).

    The implied-speed test is the standard teleport/outlier filter of a
    trajectory ingest pipeline (the moving-object extension of the
    reference's consecutive-duplicate rule, GeodesyUtils.java:283 —
    there the threshold is "moved ~0 m", here it is "moved impossibly
    far").  Predecessor-anchored one-pass variant, same contract as
    :func:`simplify_radial`: each fix is judged against its physical
    predecessor, not against the last SURVIVING fix, so the decision is
    per-row deterministic and needs no sequential scan.

    The predicate is division-free — ``dist > vmax * dt`` rather than
    ``dist/dt > vmax`` — so zero/negative time deltas (duplicate or
    out-of-order timestamps, which DO occur in real feeds) are handled
    explicitly: a leg with ``dt <= 0`` is always a spike (teleporting
    backwards in time), never a divide-by-zero/NaN.  An entity's first
    fix has no predecessor and is never a spike.

    100 TB shape: ONE window exchange on the entity key (lag of
    lat/lon/epoch share the window spec) and pure JVM Column math —
    haversine from :mod:`..functions`, no Python, no second shuffle.
    On an entity-bucketed trajectory store the exchange disappears.
    """
    from ..functions import haversine_m

    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    plat = F.lag(lat_col).over(w)
    plon = F.lag(lon_col).over(w)
    dt = (us - F.lag(us).over(w)) / F.lit(1000000.0)
    dist = haversine_m(plat, plon, F.col(lat_col), F.col(lon_col))
    spike = F.when(plat.isNull(), F.lit(False)).otherwise(
        (dt <= F.lit(0.0)) | (dist > F.lit(float(vmax_mps)) * dt)
    )
    return pts.withColumn("is_spike", spike)


def simplify_error(
    pts: DataFrame,
    tolerance_deg: float = 0.1,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Simplification quality metric: per entity, the directed Hausdorff
    distance from the RAW track to its :func:`simplify_radial` output —
    max over raw fixes of (min over kept fixes of distance), in the same
    rational scaled-degree metric the simplifier thresholds on.  The
    companion report every lossy-compaction pipeline needs: "after
    simplification, no original fix is further than H from a kept fix."

    Engine-stability by construction: the squared distance is explicit
    double multiply/add in a fixed order (no libm except one final
    correctly-rounded sqrt), and min/max are exact selections — the
    result is BIT-identical in any IEEE engine evaluating the same
    expression tree, unlike a sum whose order varies.

    100 TB shape: kept fixes are a small per-entity subset, so the
    raw x kept join is entity-keyed (one exchange per side, never
    all-pairs across entities); both rollups group on supersets of the
    join key, so Catalyst reuses the join partitioning — no further
    exchange.  Output: (entity, n_fixes, err_sdeg).
    """
    kept = simplify_radial(
        pts, tolerance_deg, entity_col, ts_col, order_col, lat_col, lon_col
    ).select(
        F.col(entity_col).alias("_ke"),
        F.col(lat_col).alias("_klat"),
        F.col(lon_col).alias("_klon"),
    )
    raw = pts.select(entity_col, order_col, lat_col, lon_col)
    dx = (F.col(lon_col) - F.col("_klon")) * F.lit(LON_SCALE)
    dy = F.col(lat_col) - F.col("_klat")
    d2 = dx * dx + dy * dy
    per_fix = (
        raw.join(kept, F.col(entity_col) == F.col("_ke"))
        .groupBy(entity_col, order_col)
        .agg(F.min(d2).alias("_mind2"))
    )
    return per_fix.groupBy(entity_col).agg(
        F.count("*").alias("n_fixes"),
        F.sqrt(F.max("_mind2")).alias("err_sdeg"),
    )


def colocation_join(
    pts: DataFrame,
    radius_m: float = 2000.0,
    bucket_s: int = 3600,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat_deg: float = 66.0,
) -> DataFrame:
    """Spatio-temporal co-location: pairs of DIFFERENT entities observed
    within ``radius_m`` meters of each other in the same ``bucket_s``
    time bucket — the contact / encounter join of a mobility pipeline
    (the two-entity extension of the reference's point-distance
    predicate, DistanceUtilities.java point×point, composed with the
    temporal bucketing of TemporalUtilities).

    Distributed shape (NEVER all-pairs): each fix gets an integer time
    bucket (pure int64 division of epoch-micros — no float rounding at
    bucket edges) and a square grid cell sized so the radius never spans
    more than one cell step (``cell_deg`` ≥ radius in BOTH axes up to
    ``max_abs_lat_deg``).  The build side keeps its home cell; the probe
    side explodes the 3x3 neighbor ring; the equi-join key is
    (cell_x, cell_y, bucket), so every candidate pair meets in EXACTLY
    one task (ring cells are distinct, home cell is unique) and the
    exact haversine refine runs once per candidate.  ``entity_a <
    entity_b`` folds the symmetric pair space in half inside the join
    condition.

    100 TB shape: one shuffle per side on the (cell, bucket) key — fine
    key cardinality (cells x buckets), constant x9 probe fan-out, AQE
    skew-split absorbs hot venue-hour cells, and the refine is pure JVM
    Column math.  Output is meet-grained: (user_a, user_b, bucket,
    event_a, event_b, dist_m); roll up per pair downstream.

    Above ``max_abs_lat_deg`` the lon cell width may under-cover the
    radius (meridian convergence); raise it (cells grow) or pre-split
    polar entities before trusting recall there.
    """
    from ..functions import haversine_m

    lat_deg = radius_m / 111000.0
    lon_deg = radius_m / (110000.0 * math.cos(math.radians(max_abs_lat_deg)))
    cs = max(lat_deg, lon_deg)
    us_per_bucket = int(bucket_s) * 1_000_000
    base = pts.select(
        F.col(entity_col),
        F.col(order_col),
        F.col(lat_col),
        F.col(lon_col),
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {us_per_bucket}"
        ).alias("bucket"),
        F.floor(F.col(lat_col) / F.lit(cs)).alias("_cy"),
        F.floor(F.col(lon_col) / F.lit(cs)).alias("_cx"),
    )
    build = base.select(
        F.col(entity_col).alias("user_b"),
        F.col(order_col).alias("event_b"),
        F.col(lat_col).alias("_blat"),
        F.col(lon_col).alias("_blon"),
        F.col("bucket").alias("_bbkt"),
        F.col("_cy").alias("_bcy"),
        F.col("_cx").alias("_bcx"),
    )
    ring = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("_cy") + F.lit(dy)).alias("ry"),
                    (F.col("_cx") + F.lit(dx)).alias("rx"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("_r")
    probe = base.select(
        F.col(entity_col).alias("user_a"),
        F.col(order_col).alias("event_a"),
        F.col(lat_col).alias("_alat"),
        F.col(lon_col).alias("_alon"),
        F.col("bucket"),
        ring,
    )
    dist = haversine_m(
        F.col("_alat"), F.col("_alon"), F.col("_blat"), F.col("_blon")
    )
    return (
        probe.join(
            build,
            (F.col("_r.ry") == F.col("_bcy"))
            & (F.col("_r.rx") == F.col("_bcx"))
            & (F.col("bucket") == F.col("_bbkt"))
            & (F.col("user_a") < F.col("user_b")),
        )
        .where(dist <= F.lit(float(radius_m)))
        .select(
            "user_a", "user_b", "bucket", "event_a", "event_b",
            dist.alias("dist_m"),
        )
    )


def speed_filter(
    pts: DataFrame,
    vmax_mps: float = 55.0,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Drop the fixes :func:`speed_flags` marks as spikes (same
    columns in, same columns out — the composable pipeline stage)."""
    flagged = speed_flags(
        pts, vmax_mps, entity_col, ts_col, order_col, lat_col, lon_col
    )
    return flagged.where(~F.col("is_spike")).drop("is_spike")


def snap_to_segments(
    pts: DataFrame,
    segments: list[tuple[int, float, float, float, float]],
    lon_col: str = "lon",
    lat_col: str = "lat",
    out: str = "snap",
) -> DataFrame:
    """Map-matching primitive: snap each point to its nearest segment of
    a small road network (planar projection in coordinate space — the
    local-plane approximation every real-time matcher uses between
    geodesic refines).  ``segments`` is ``[(seg_id, ax, ay, bx, by)]``.

    Adds ``out`` = struct(d2, sid, t): squared planar distance, winning
    segment id, and the clamped projection parameter t ∈ [0,1] along it.
    Argmin ties break toward the LOWER seg_id: ``array_min`` over
    struct(d2, sid, t) candidates is the lexicographic (d2, sid) min.

    Scale shape: the network is UNROLLED AT PLAN TIME into one
    candidate struct per segment and the argmin is ``array_min`` over
    the literal-size array — zero joins, zero shuffles, zero Python,
    and (unlike the ``F.aggregate`` fold this replaced) no
    higher-order-function lambda: HOF folds run interpreted and
    re-evaluate the un-CSE'd projection expression once per struct
    field per comparison, which measured ~5.3 s for 100k points × 8
    segments on one core; the unrolled form computes each candidate
    once inside WholeStageCodegen (~10× less expression work).  A
    10^12-point GPS stream snaps in a single map pass.  This is the
    dimension-sized-network fast path; a continental network (10^7+
    segments) would instead cell-index segments and reuse the kNN
    cell-ring equi-join (`operators/knn.py`), with this per-segment
    projection as the per-cell refine.
    """
    segs = sorted((int(s[0]), *map(float, s[1:])) for s in segments)
    if not segs:
        raise ValueError("snap_to_segments: empty segment list")
    for sid, ax, ay, bx, by in segs:
        if (bx - ax) == 0.0 and (by - ay) == 0.0:
            raise ValueError(f"snap_to_segments: degenerate segment {sid}")
    px, py = F.col(lon_col), F.col(lat_col)
    cands = []
    for sid, ax, ay, bx, by in segs:
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        t_raw = ((px - F.lit(ax)) * F.lit(dx) + (py - F.lit(ay)) * F.lit(dy)) / F.lit(l2)
        t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        cx = F.lit(ax) + t * F.lit(dx)
        cy = F.lit(ay) + t * F.lit(dy)
        d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
        cands.append(F.struct(
            d2.alias("d2"), F.lit(sid).alias("sid"), t.alias("t")
        ))
    return pts.withColumn(out, F.array_min(F.array(*cands)))


def resample_track(
    pts: DataFrame,
    period_s: int = 21600,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_col: str = "event_id",
) -> DataFrame:
    """Fixed-period track regularization: one interpolated position per
    entity at every epoch-aligned grid tick covered by the track — the
    resampler that turns irregular GPS fixes into the uniform sequence
    models want.

    Each leg (prev fix, cur fix] owns the grid ticks strictly after prev
    and at-or-before cur (integer epoch-bucket arithmetic — every tick
    assigned exactly once, no float at bucket edges), and emits them via
    a per-leg sequence() explode; position is linear interpolation in
    time.  Shape: ONE window exchange on the entity (lag), then the
    generator runs map-side — output volume is duration/period per
    entity, independent of fix density, and a tick-dense leg explodes
    only its own row (no skew coupling across entities).  All arithmetic
    is integer-derived doubles (no trig), so the oracle replay is
    bit-exact unrounded.
    """
    us_per = int(period_s) * 1_000_000
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    legs = pts.select(
        F.col(entity_col).alias("entity"),
        us.alias("_t"), F.col(lon_col).alias("_x"), F.col(lat_col).alias("_y"),
        F.lag(us).over(w).alias("_pt"),
        F.lag(lon_col).over(w).alias("_px"),
        F.lag(lat_col).over(w).alias("_py"),
    ).where(F.col("_pt").isNotNull())
    lo = F.expr(f"_pt DIV {us_per} + 1")
    hi = F.expr(f"_t DIV {us_per}")
    ticks = legs.withColumn(
        "_k",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi))
            .otherwise(F.array().cast("array<bigint>"))
        ),
    )
    f = (F.col("_k") * F.lit(us_per) - F.col("_pt")) / (F.col("_t") - F.col("_pt"))
    return ticks.select(
        F.col("entity").alias(entity_col),
        (F.col("_k") * F.lit(us_per)).alias("tick_us"),
        (F.col("_px") + f * (F.col("_x") - F.col("_px"))).alias("lon"),
        (F.col("_py") + f * (F.col("_y") - F.col("_py"))).alias("lat"),
    )


def leg_cells(
    legs: DataFrame,
    cell_deg: float,
    x1_col: str = "plon",
    y1_col: str = "plat",
    x2_col: str = "lon",
    y2_col: str = "lat",
) -> DataFrame:
    """Supercover line rasterization: one row per (leg, grid cell) for
    every ``cell_deg``-sided cell the leg's segment touches — the
    raster-coverage twin of point tile assignment (a moving object
    covers the cells its LEGS cross, not just the cells its fixes land
    in).  Touching a cell edge counts as traversal.

    Shape for 100 TB: candidates are the leg's bbox cells (two nested
    map-side ``sequence`` explodes — output volume is the leg's own
    bbox, no skew coupling across legs), and the keep test is the
    Liang-Barsky slab intersection in pure Column arithmetic
    (+,−,·,/, least/greatest with CASE-guarded zero deltas) — zero
    joins, zero shuffles, zero Python; every op is shared-IEEE so a SQL
    oracle replays it bit-exactly.  A pathologically long leg explodes
    only its own row; cap leg length upstream if the use case allows.
    """
    if cell_deg <= 0:
        raise ValueError(f"leg_cells: cell_deg must be positive, got {cell_deg}")
    g = float(cell_deg)
    x1, y1 = F.col(x1_col), F.col(y1_col)
    x2, y2 = F.col(x2_col), F.col(y2_col)
    cx0 = F.floor(F.least(x1, x2) / g).cast("long")
    cx1 = F.floor(F.greatest(x1, x2) / g).cast("long")
    cy0 = F.floor(F.least(y1, y2) / g).cast("long")
    cy1 = F.floor(F.greatest(y1, y2) / g).cast("long")
    staged = (
        legs.withColumn("cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn("cy", F.explode(F.sequence(cy0, cy1)))
    )
    lox, hix = F.col("cx") * g, (F.col("cx") + 1) * g
    loy, hiy = F.col("cy") * g, (F.col("cy") + 1) * g
    dx, dy = x2 - x1, y2 - y1
    # slab entry/exit parameters; a zero delta degenerates to "always
    # inside" (0..1) when the fixed coordinate lies in the slab, else
    # "never" (2..-1) — candidates come from the bbox so the inside
    # branch is the one taken, but the guard keeps the operator total
    tx_a, tx_b = (lox - x1) / dx, (hix - x1) / dx
    ty_a, ty_b = (loy - y1) / dy, (hiy - y1) / dy
    tx_enter = F.when(dx != 0, F.least(tx_a, tx_b)).otherwise(
        F.when((x1 >= lox) & (x1 <= hix), F.lit(0.0)).otherwise(F.lit(2.0))
    )
    tx_exit = F.when(dx != 0, F.greatest(tx_a, tx_b)).otherwise(
        F.when((x1 >= lox) & (x1 <= hix), F.lit(1.0)).otherwise(F.lit(-1.0))
    )
    ty_enter = F.when(dy != 0, F.least(ty_a, ty_b)).otherwise(
        F.when((y1 >= loy) & (y1 <= hiy), F.lit(0.0)).otherwise(F.lit(2.0))
    )
    ty_exit = F.when(dy != 0, F.greatest(ty_a, ty_b)).otherwise(
        F.when((y1 >= loy) & (y1 <= hiy), F.lit(1.0)).otherwise(F.lit(-1.0))
    )
    t_enter = F.greatest(tx_enter, ty_enter, F.lit(0.0))
    t_exit = F.least(tx_exit, ty_exit, F.lit(1.0))
    return staged.where(t_enter <= t_exit)


def route_hausdorff(
    pts: DataFrame,
    routes: list[tuple[int, list[tuple[int, int]]]],
    entity_col: str = "user_id",
    ilat_col: str = "ilat",
    ilon_col: str = "ilon",
) -> DataFrame:
    """Directed Hausdorff route matching: assign each entity's point set
    to the reference route minimizing h(entity → route) = max over the
    entity's points of the min squared distance to any route vertex —
    the canonical-route classifier for GPS traces (which bus line / ferry
    lane / flight corridor does this track follow?).

    Distances are SQUARED INTEGER MICRODEGREES (BIGINT): every min/max
    fold is integer arithmetic, so the result is bit-exact at any
    parallelism and any SQL oracle evaluating the same algebra matches
    hash-for-hash (the staypoints lesson: round(x*1e6) is the same
    double→long everywhere).

    Scale shape: ``routes`` is a LITERAL dimension (a handful of routes
    × a few dozen vertices — the operator's contract, like the POI and
    zone dims elsewhere): per point row the min-to-each-route folds are
    |routes|·|vertices| inline codegen comparisons — ZERO joins, zero
    Python, no exchange before the single map-side-combined per-entity
    max aggregation.  The final argmin over |routes| per-entity maxima
    is an array_min over a struct array — still no second exchange.
    A corpus of 10^12 points is one scan + one |entities|-row shuffle.
    """
    if not routes:
        raise ValueError("route_hausdorff: routes must be non-empty")
    ila, ilo = F.col(ilat_col), F.col(ilon_col)
    min_cols = []
    for rid, verts in routes:
        if not verts:
            raise ValueError(f"route_hausdorff: route {rid} has no vertices")
        d2s = [
            (ila - F.lit(vlat)) * (ila - F.lit(vlat))
            + (ilo - F.lit(vlon)) * (ilo - F.lit(vlon))
            for vlat, vlon in verts
        ]
        min_cols.append(
            (F.least(*d2s) if len(d2s) > 1 else d2s[0]).alias(f"_m{rid}")
        )
    staged = pts.select(entity_col, *min_cols)
    agg = staged.groupBy(entity_col).agg(
        F.count("*").alias("n_points"),
        *[F.max(f"_m{rid}").alias(f"_h{rid}") for rid, _ in routes],
    )
    best = F.array_min(
        F.array(*[
            F.struct(
                F.col(f"_h{rid}").alias("h"), F.lit(rid).alias("r")
            )
            for rid, _ in routes
        ])
    )
    return agg.select(
        entity_col, "n_points",
        best["r"].alias("best_route"), best["h"].alias("h_sq_udeg"),
    )
