"""SQL mirrors of the transcendental geodesy kernels, for DuckDB oracles.

The driver's correctness gate hash-compares Spark output against ANSI SQL
run in DuckDB.  The haversine/crossing-number queries already have exact
SQL mirrors; this module generates SQL for the three remaining kernels:

- Vincenty inverse (``kernels/geodesic.py::inverse`` — the DWITHIN/kNN
  exact distance, reference ``TopologicalRelationships.java:149-196``),
- Vincenty direct (``kernels/geodesic.py::direct`` — calculateDestination,
  reference ``GeodesyUtils.java:110-132``),
- transverse-Mercator forward (``kernels/crs.py::tm_forward`` — the UTM
  reprojection of the reference's implicit setCRS).

Strategy: the kernels are fixed-point iterations over whole arrays with a
1e-12 break; the SQL unrolls a FIXED number of iterations (8).  Both
sides converge to the same fixed point (contraction factor ~f ≈ 3e-3, so
8 iterations land within 1e-15 of it for any non-antipodal input); the
only residual difference is libm last-ulp noise (~1e-13 deg / ~1e-10 m),
absorbed by rounding outputs to 7 dp (degrees, ~1 cm) / 3 dp (meters,
1 mm) on BOTH sides.

Each iteration step becomes one NESTED subquery level (``SELECT *, <new
cols> FROM (...)``) — items within a level never reference each other.
Lateral column aliases would be simpler to read, but DuckDB's binder
expands them by expression substitution, which goes exponential on an
8-deep iterative chain.

Every expression is a 1:1 transcription of the numpy kernel with the
same literals and operation order, so the IEEE doubles agree to the last
few ulps.
"""

from __future__ import annotations

# Shared WGS84 constant *expressions* (kept as expressions, not decimal
# literals, so DuckDB computes bit-identical doubles to numpy).
_F = "(1.0 / 298.257223563)"
_A = "6378137.0"
_B = f"({_A} * (1.0 - {_F}))"

_ITERS = 8

Levels = list[list[tuple[str, str]]]


def nest_levels(src_sql: str, levels: Levels, final_cols: list[str],
                cte_prefix: str = "_om") -> str:
    """Compose the iteration levels as chained MATERIALIZED CTEs:
    ``WITH p0 AS MATERIALIZED (src), p1 AS MATERIALIZED (SELECT *, … FROM
    p0), … SELECT final_cols FROM pN``.

    MATERIALIZED is load-bearing: DuckDB's optimizer inlines plain
    subqueries/CTEs by expression substitution, which goes exponential on
    an 8-deep iterative dependency chain (measured: minutes → ms).  The
    fence makes each level evaluate once over the (small) oracle input.
    """
    parts = [f"{cte_prefix}0 AS MATERIALIZED ({src_sql})"]
    for n, level in enumerate(levels, start=1):
        items = ", ".join(f"({expr}) AS {alias}" for alias, expr in level)
        parts.append(
            f"{cte_prefix}{n} AS MATERIALIZED "
            f"(SELECT *, {items} FROM {cte_prefix}{n - 1})"
        )
    return (
        f"WITH {', '.join(parts)} "
        f"SELECT {', '.join(final_cols)} FROM {cte_prefix}{len(levels)}"
    )


def vincenty_inverse_levels(lat1: str, lon1: str, lat2: str, lon2: str,
                            out: str = "dist_m", prefix: str = "_vi") -> Levels:
    """Nested-subquery levels computing ``out`` = Vincenty inverse distance
    in meters between (lat1,lon1) and (lat2,lon2) degrees.

    Mirrors kernels/geodesic.py::inverse with 8 unrolled iterations.
    """
    p = prefix
    levels: Levels = [
        [
            (f"{p}_l", f"radians({lon2}) - radians({lon1})"),
            (f"{p}_u1", f"atan((1.0 - {_F}) * tan(radians({lat1})))"),
            (f"{p}_u2", f"atan((1.0 - {_F}) * tan(radians({lat2})))"),
        ],
        [
            (f"{p}_su1", f"sin({p}_u1)"),
            (f"{p}_cu1", f"cos({p}_u1)"),
            (f"{p}_su2", f"sin({p}_u2)"),
            (f"{p}_cu2", f"cos({p}_u2)"),
            (f"{p}_lam0", f"{p}_l"),
        ],
    ]
    for i in range(1, _ITERS + 1):
        lam = f"{p}_lam{i - 1}"
        levels += [
            [(f"{p}_sl{i}", f"sin({lam})"), (f"{p}_cl{i}", f"cos({lam})")],
            [
                (
                    f"{p}_ss{i}",
                    f"sqrt(power({p}_cu2 * {p}_sl{i}, 2) + "
                    f"power({p}_cu1 * {p}_su2 - {p}_su1 * {p}_cu2 * {p}_cl{i}, 2))",
                ),
                (f"{p}_cs{i}", f"{p}_su1 * {p}_su2 + {p}_cu1 * {p}_cu2 * {p}_cl{i}"),
            ],
            [
                (f"{p}_sg{i}", f"atan2({p}_ss{i}, {p}_cs{i})"),
                (
                    f"{p}_sa{i}",
                    f"CASE WHEN {p}_ss{i} > 0 THEN "
                    f"{p}_cu1 * {p}_cu2 * {p}_sl{i} / {p}_ss{i} ELSE 0.0 END",
                ),
            ],
            [(f"{p}_c2a{i}", f"1.0 - {p}_sa{i} * {p}_sa{i}")],
            [
                (
                    f"{p}_c2m{i}",
                    f"CASE WHEN {p}_c2a{i} > 0 THEN "
                    f"{p}_cs{i} - 2.0 * {p}_su1 * {p}_su2 / {p}_c2a{i} ELSE 0.0 END",
                ),
                (
                    f"{p}_cc{i}",
                    f"{_F} / 16.0 * {p}_c2a{i} * (4.0 + {_F} * (4.0 - 3.0 * {p}_c2a{i}))",
                ),
            ],
            [
                (
                    f"{p}_lam{i}",
                    f"{p}_l + (1.0 - {p}_cc{i}) * {_F} * {p}_sa{i} * ({p}_sg{i} + "
                    f"{p}_cc{i} * {p}_ss{i} * ({p}_c2m{i} + {p}_cc{i} * {p}_cs{i} * "
                    f"(-1.0 + 2.0 * {p}_c2m{i} * {p}_c2m{i})))",
                ),
            ],
        ]
    n = _ITERS
    levels += [
        [(f"{p}_usq", f"{p}_c2a{n} * ({_A} * {_A} - {_B} * {_B}) / ({_B} * {_B})")],
        [
            (
                f"{p}_ba",
                f"1.0 + {p}_usq / 16384.0 * (4096.0 + {p}_usq * "
                f"(-768.0 + {p}_usq * (320.0 - 175.0 * {p}_usq)))",
            ),
            (
                f"{p}_bb",
                f"{p}_usq / 1024.0 * (256.0 + {p}_usq * "
                f"(-128.0 + {p}_usq * (74.0 - 47.0 * {p}_usq)))",
            ),
        ],
        [
            (
                f"{p}_ds",
                f"{p}_bb * {p}_ss{n} * ({p}_c2m{n} + {p}_bb / 4.0 * "
                f"({p}_cs{n} * (-1.0 + 2.0 * {p}_c2m{n} * {p}_c2m{n}) - "
                f"{p}_bb / 6.0 * {p}_c2m{n} * (-3.0 + 4.0 * {p}_ss{n} * {p}_ss{n}) * "
                f"(-3.0 + 4.0 * {p}_c2m{n} * {p}_c2m{n})))",
            ),
        ],
        [
            (
                out,
                f"CASE WHEN abs(radians({lat1}) - radians({lat2})) < 1e-15 "
                f"AND abs({p}_l) < 1e-15 THEN 0.0 "
                f"ELSE {_B} * {p}_ba * ({p}_sg{n} - {p}_ds) END",
            ),
        ],
    ]
    return levels


def vincenty_direct_levels(lat1: str, lon1: str, az: str, dist: str,
                           out_lat: str = "dest_lat", out_lon: str = "dest_lon",
                           prefix: str = "_vd") -> Levels:
    """Nested-subquery levels computing the Vincenty direct destination
    (out_lat, out_lon) in degrees from start (lat1, lon1) deg, azimuth
    ``az`` deg, distance ``dist`` m.

    Mirrors kernels/geodesic.py::direct with 8 unrolled iterations,
    including the [-180, 180) longitude normalization (floor-mod, matching
    numpy's sign convention, not SQL's fmod).
    """
    p = prefix
    levels: Levels = [
        [
            (f"{p}_la1", f"radians({lat1})"),
            (f"{p}_lo1", f"radians({lon1})"),
            (f"{p}_a1", f"radians({az})"),
        ],
        [
            (f"{p}_sa1", f"sin({p}_a1)"),
            (f"{p}_ca1", f"cos({p}_a1)"),
            (f"{p}_tu1", f"(1.0 - {_F}) * tan({p}_la1)"),
        ],
        [
            (f"{p}_cu1", f"1.0 / sqrt(1.0 + {p}_tu1 * {p}_tu1)"),
            # sigma1 — named _sig1, NOT _sg1, so the i=1 loop level's
            # {p}_sg1 (first sigma update) can't shadow it (ADVICE r2:
            # duplicate aliases relied on DuckDB's silent _1 renaming)
            (f"{p}_sig1", f"atan2({p}_tu1, {p}_ca1)"),
        ],
        [
            (f"{p}_su1", f"{p}_tu1 * {p}_cu1"),
            (f"{p}_sa", f"{p}_cu1 * {p}_sa1"),
        ],
        [(f"{p}_c2a", f"1.0 - {p}_sa * {p}_sa")],
        [(f"{p}_usq", f"{p}_c2a * ({_A} * {_A} - {_B} * {_B}) / ({_B} * {_B})")],
        [
            (
                f"{p}_ba",
                f"1.0 + {p}_usq / 16384.0 * (4096.0 + {p}_usq * "
                f"(-768.0 + {p}_usq * (320.0 - 175.0 * {p}_usq)))",
            ),
            (
                f"{p}_bb",
                f"{p}_usq / 1024.0 * (256.0 + {p}_usq * "
                f"(-128.0 + {p}_usq * (74.0 - 47.0 * {p}_usq)))",
            ),
        ],
        [(f"{p}_sg0", f"({dist}) / ({_B} * {p}_ba)")],
    ]
    for i in range(1, _ITERS + 1):
        sg = f"{p}_sg{i - 1}" if i > 1 else f"{p}_sg0"
        levels += [
            [
                (f"{p}_c2m{i}", f"cos(2.0 * {p}_sig1 + {sg})"),
                (f"{p}_ssg{i}", f"sin({sg})"),
                (f"{p}_csg{i}", f"cos({sg})"),
            ],
            [
                (
                    f"{p}_dsg{i}",
                    f"{p}_bb * {p}_ssg{i} * ({p}_c2m{i} + {p}_bb / 4.0 * "
                    f"({p}_csg{i} * (-1.0 + 2.0 * {p}_c2m{i} * {p}_c2m{i}) - "
                    f"{p}_bb / 6.0 * {p}_c2m{i} * (-3.0 + 4.0 * {p}_ssg{i} * {p}_ssg{i}) * "
                    f"(-3.0 + 4.0 * {p}_c2m{i} * {p}_c2m{i})))",
                ),
            ],
            [(f"{p}_sg{i}", f"({dist}) / ({_B} * {p}_ba) + {p}_dsg{i}")],
        ]
    n = _ITERS
    levels += [
        [
            (f"{p}_ss", f"sin({p}_sg{n})"),
            (f"{p}_cs", f"cos({p}_sg{n})"),
            (f"{p}_c2m", f"cos(2.0 * {p}_sig1 + {p}_sg{n})"),
        ],
        [
            (f"{p}_tmp", f"{p}_su1 * {p}_ss - {p}_cu1 * {p}_cs * {p}_ca1"),
            (
                f"{p}_lam",
                f"atan2({p}_ss * {p}_sa1, {p}_cu1 * {p}_cs - {p}_su1 * {p}_ss * {p}_ca1)",
            ),
            (f"{p}_cc", f"{_F} / 16.0 * {p}_c2a * (4.0 + {_F} * (4.0 - 3.0 * {p}_c2a))"),
        ],
        [
            (
                f"{p}_la2",
                f"atan2({p}_su1 * {p}_cs + {p}_cu1 * {p}_ss * {p}_ca1, "
                f"(1.0 - {_F}) * sqrt({p}_sa * {p}_sa + {p}_tmp * {p}_tmp))",
            ),
            (
                f"{p}_ld",
                f"{p}_lam - (1.0 - {p}_cc) * {_F} * {p}_sa * ({p}_sg{n} + "
                f"{p}_cc * {p}_ss * ({p}_c2m + {p}_cc * {p}_cs * "
                f"(-1.0 + 2.0 * {p}_c2m * {p}_c2m)))",
            ),
        ],
        [(f"{p}_lo2r", f"{p}_lo1 + {p}_ld")],
        # numpy mod: a - floor(a/b)*b (result sign follows divisor)
        [
            (
                f"{p}_lo2n",
                f"(({p}_lo2r + pi()) - floor((({p}_lo2r + pi()) / (2.0 * pi()))) "
                f"* (2.0 * pi())) - pi()",
            ),
        ],
        [(out_lat, f"degrees({p}_la2)"), (out_lon, f"degrees({p}_lo2n)")],
    ]
    return levels


def tm_inverse_levels(x: str, y: str, lon0_deg: float,
                      out_lon: str = "inv_lon", out_lat: str = "inv_lat",
                      prefix: str = "_ti") -> Levels:
    """Nested-subquery levels for the transverse-Mercator INVERSE
    (Snyder series) — mirror of kernels/crs.py::tm_inverse."""
    p = prefix
    return [
        [
            (f"{p}_e2", f"({_F} * (2.0 - {_F}))"),
            (f"{p}_x", f"({x}) - 500000.0"),
            (f"{p}_m", f"({y}) / 0.9996"),
        ],
        [
            (f"{p}_ep2", f"{p}_e2 / (1.0 - {p}_e2)"),
            (
                f"{p}_mu",
                f"{p}_m / ({_A} * (1.0 - {p}_e2 / 4.0 - 3.0 * power({p}_e2, 2) / 64.0 "
                f"- 5.0 * power({p}_e2, 3) / 256.0))",
            ),
            (f"{p}_e1", f"(1.0 - sqrt(1.0 - {p}_e2)) / (1.0 + sqrt(1.0 - {p}_e2))"),
        ],
        [
            (
                f"{p}_phi1",
                f"{p}_mu + ((3.0 * {p}_e1 / 2.0 - 27.0 * power({p}_e1, 3) / 32.0) * sin(2.0 * {p}_mu) "
                f"+ (21.0 * power({p}_e1, 2) / 16.0 - 55.0 * power({p}_e1, 4) / 32.0) * sin(4.0 * {p}_mu) "
                f"+ (151.0 * power({p}_e1, 3) / 96.0) * sin(6.0 * {p}_mu) "
                f"+ (1097.0 * power({p}_e1, 4) / 512.0) * sin(8.0 * {p}_mu))",
            ),
        ],
        [
            (f"{p}_s1", f"sin({p}_phi1)"),
            (f"{p}_c1v", f"cos({p}_phi1)"),
            (f"{p}_t1v", f"tan({p}_phi1)"),
        ],
        [
            (f"{p}_cc1", f"{p}_ep2 * {p}_c1v * {p}_c1v"),
            (f"{p}_tt1", f"{p}_t1v * {p}_t1v"),
            (f"{p}_n1", f"{_A} / sqrt(1.0 - {p}_e2 * {p}_s1 * {p}_s1)"),
            (f"{p}_r1", f"{_A} * (1.0 - {p}_e2) / power(1.0 - {p}_e2 * {p}_s1 * {p}_s1, 1.5)"),
        ],
        [(f"{p}_d", f"{p}_x / ({p}_n1 * 0.9996)")],
        [
            (
                f"{p}_phi",
                f"{p}_phi1 - ({p}_n1 * {p}_t1v / {p}_r1) * (power({p}_d, 2) / 2.0 "
                f"- (5.0 + 3.0 * {p}_tt1 + 10.0 * {p}_cc1 - 4.0 * {p}_cc1 * {p}_cc1 - 9.0 * {p}_ep2) "
                f"* power({p}_d, 4) / 24.0 "
                f"+ (61.0 + 90.0 * {p}_tt1 + 298.0 * {p}_cc1 + 45.0 * {p}_tt1 * {p}_tt1 "
                f"- 252.0 * {p}_ep2 - 3.0 * {p}_cc1 * {p}_cc1) * power({p}_d, 6) / 720.0)",
            ),
            (
                f"{p}_lam",
                f"radians({float(lon0_deg)!r}) + ({p}_d - (1.0 + 2.0 * {p}_tt1 + {p}_cc1) "
                f"* power({p}_d, 3) / 6.0 "
                f"+ (5.0 - 2.0 * {p}_cc1 + 28.0 * {p}_tt1 - 3.0 * {p}_cc1 * {p}_cc1 "
                f"+ 8.0 * {p}_ep2 + 24.0 * {p}_tt1 * {p}_tt1) * power({p}_d, 5) / 120.0) / {p}_c1v",
            ),
        ],
        [(out_lon, f"degrees({p}_lam)"), (out_lat, f"degrees({p}_phi)")],
    ]


def tm_forward_levels(lon: str, lat: str, lon0_deg: float,
                      out_e: str = "easting", out_n: str = "northing",
                      prefix: str = "_tm") -> Levels:
    """Nested-subquery levels for the transverse-Mercator forward
    projection (Snyder series) — mirror of kernels/crs.py::tm_forward
    (UTM north, k0=0.9996, false easting 500000)."""
    p = prefix
    return [
        [
            (f"{p}_e2", f"({_F} * (2.0 - {_F}))"),
            (f"{p}_phi", f"radians({lat})"),
            (f"{p}_dl", f"radians({lon}) - radians({float(lon0_deg)!r})"),
        ],
        [
            (f"{p}_ep2", f"{p}_e2 / (1.0 - {p}_e2)"),
            (f"{p}_sp", f"sin({p}_phi)"),
            (f"{p}_cp", f"cos({p}_phi)"),
            (f"{p}_tp", f"tan({p}_phi)"),
            (f"{p}_e4", f"{p}_e2 * {p}_e2"),
            (f"{p}_e6", f"{p}_e2 * {p}_e2 * {p}_e2"),
        ],
        [
            (f"{p}_n", f"{_A} / sqrt(1.0 - {p}_e2 * {p}_sp * {p}_sp)"),
            (f"{p}_t", f"{p}_tp * {p}_tp"),
            (f"{p}_c", f"{p}_ep2 * {p}_cp * {p}_cp"),
            (f"{p}_aa", f"{p}_dl * {p}_cp"),
            (
                f"{p}_m",
                f"{_A} * ((1.0 - {p}_e2 / 4.0 - 3.0 * {p}_e4 / 64.0 - 5.0 * {p}_e6 / 256.0) * {p}_phi "
                f"- (3.0 * {p}_e2 / 8.0 + 3.0 * {p}_e4 / 32.0 + 45.0 * {p}_e6 / 1024.0) * sin(2.0 * {p}_phi) "
                f"+ (15.0 * {p}_e4 / 256.0 + 45.0 * {p}_e6 / 1024.0) * sin(4.0 * {p}_phi) "
                f"- (35.0 * {p}_e6 / 3072.0) * sin(6.0 * {p}_phi))",
            ),
        ],
        [
            (
                out_e,
                f"0.9996 * {p}_n * ({p}_aa + (1.0 - {p}_t + {p}_c) * {p}_aa * {p}_aa * {p}_aa / 6.0 "
                f"+ (5.0 - 18.0 * {p}_t + {p}_t * {p}_t + 72.0 * {p}_c - 58.0 * {p}_ep2) "
                f"* power({p}_aa, 5) / 120.0) + 500000.0",
            ),
            (
                out_n,
                f"0.9996 * ({p}_m + {p}_n * {p}_tp * ({p}_aa * {p}_aa / 2.0 "
                f"+ (5.0 - {p}_t + 9.0 * {p}_c + 4.0 * {p}_c * {p}_c) * power({p}_aa, 4) / 24.0 "
                f"+ (61.0 - 58.0 * {p}_t + {p}_t * {p}_t + 600.0 * {p}_c - 330.0 * {p}_ep2) "
                f"* power({p}_aa, 6) / 720.0))",
            ),
        ],
    ]
