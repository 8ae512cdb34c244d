"""Vectorized geodesic kernels on the WGS84 ellipsoid (pure numpy).

Re-expresses the reference's geodesy calculator semantics
(geomatics-geotk ``GeodesyUtils.java:110-132`` calculateDestination — the
geodesic *direct* problem — and the orthodromic-distance evaluation used by
DWithin/Beyond in ``TopologicalRelationships.java:149-196``) as batch numpy
functions suitable for Arrow-backed pandas UDFs.  The reference delegates to
Apache SIS ``GeodeticCalculator``; we implement Vincenty's direct and inverse
formulae, which agree with SIS/Karney to well below the reference test
tolerances (1e-4 deg / ~10 m, ``VerifyGeodesyUtils.java:79-109``).

All functions take/return numpy arrays (degrees / meters) and never loop
per row in Python: iteration loops are fixed-point loops over whole arrays.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)

_EPS = 1e-12
_MAX_ITER = 200


def direct(lat_deg, lon_deg, azimuth_deg, distance_m):
    """Geodesic direct problem (Vincenty), vectorized.

    Given start point(s), initial azimuth(s) (degrees clockwise from north,
    any sign — the reference normalizes to [-180, 180], which Vincenty's
    trig makes irrelevant) and distance(s) in meters, return
    ``(lat2_deg, lon2_deg)`` destination arrays.

    Reference semantics: ``GeodesyUtils.calculateDestination``
    (``GeodesyUtils.java:110-132``).
    """
    lat1 = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon1 = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    alpha1 = np.deg2rad(np.asarray(azimuth_deg, dtype=np.float64))
    s = np.asarray(distance_m, dtype=np.float64)

    a, b, f = WGS84_A, WGS84_B, WGS84_F

    sin_a1, cos_a1 = np.sin(alpha1), np.cos(alpha1)
    tan_u1 = (1.0 - f) * np.tan(lat1)
    cos_u1 = 1.0 / np.sqrt(1.0 + tan_u1 * tan_u1)
    sin_u1 = tan_u1 * cos_u1

    sigma1 = np.arctan2(tan_u1, cos_a1)
    sin_alpha = cos_u1 * sin_a1
    cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    big_a = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))

    sigma = s / (b * big_a)
    sigma_prev = np.full_like(sigma, np.inf)
    cos_2sm = np.cos(2.0 * sigma1 + sigma)
    for _ in range(_MAX_ITER):
        cos_2sm = np.cos(2.0 * sigma1 + sigma)
        sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)
        delta_sigma = big_b * sin_sigma * (
            cos_2sm
            + big_b / 4.0 * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
                - big_b / 6.0 * cos_2sm * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                * (-3.0 + 4.0 * cos_2sm * cos_2sm)
            )
        )
        sigma_prev = sigma
        sigma = s / (b * big_a) + delta_sigma
        if np.all(np.abs(sigma - sigma_prev) < _EPS):
            break

    sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)
    cos_2sm = np.cos(2.0 * sigma1 + sigma)

    tmp = sin_u1 * sin_sigma - cos_u1 * cos_sigma * cos_a1
    lat2 = np.arctan2(
        sin_u1 * cos_sigma + cos_u1 * sin_sigma * cos_a1,
        (1.0 - f) * np.sqrt(sin_alpha * sin_alpha + tmp * tmp),
    )
    lam = np.arctan2(sin_sigma * sin_a1, cos_u1 * cos_sigma - sin_u1 * sin_sigma * cos_a1)
    c = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
    lon_diff = lam - (1.0 - c) * f * sin_alpha * (
        sigma + c * sin_sigma * (cos_2sm + c * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
    )
    lon2 = lon1 + lon_diff
    # normalize lon to [-180, 180)
    lon2 = (lon2 + np.pi) % (2.0 * np.pi) - np.pi
    return np.rad2deg(lat2), np.rad2deg(lon2)


def inverse(lat1_deg, lon1_deg, lat2_deg, lon2_deg):
    """Geodesic inverse problem (Vincenty), vectorized.

    Returns orthodromic distance in meters between point arrays — the
    distance evaluated by the reference's DWithin/Beyond predicates
    (``TopologicalRelationships.java:149-196``, SIS GeodeticCalculator).
    Coincident points return 0.  Near-antipodal pairs that fail to
    converge fall back to the spherical haversine value (error < 0.6%;
    never exercised by reference vectors).
    """
    lat1 = np.deg2rad(np.asarray(lat1_deg, dtype=np.float64))
    lon1 = np.deg2rad(np.asarray(lon1_deg, dtype=np.float64))
    lat2 = np.deg2rad(np.asarray(lat2_deg, dtype=np.float64))
    lon2 = np.deg2rad(np.asarray(lon2_deg, dtype=np.float64))

    a, b, f = WGS84_A, WGS84_B, WGS84_F
    big_l = lon2 - lon1
    u1 = np.arctan((1.0 - f) * np.tan(lat1))
    u2 = np.arctan((1.0 - f) * np.tan(lat2))
    sin_u1, cos_u1 = np.sin(u1), np.cos(u1)
    sin_u2, cos_u2 = np.sin(u2), np.cos(u2)

    lam = big_l.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos_2sm = np.zeros_like(lam)

    for _ in range(_MAX_ITER):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cos_u2 * sin_lam) ** 2 + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam) ** 2
        )
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma > 0, cos_u1 * cos_u2 * sin_lam / np.where(sin_sigma == 0, 1.0, sin_sigma), 0.0)
            cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
            cos_2sm = np.where(
                cos_sq_alpha > 0,
                cos_sigma - 2.0 * sin_u1 * sin_u2 / np.where(cos_sq_alpha == 0, 1.0, cos_sq_alpha),
                0.0,
            )
        c = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
        lam_prev = lam
        lam = big_l + (1.0 - c) * f * sin_alpha * (
            sigma + c * sin_sigma * (cos_2sm + c * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
        )
        newly = np.abs(lam - lam_prev) < _EPS
        converged |= newly
        # iterate all the way to the machine fixed point (not merely the
        # 1e-12 convergence flag): the DuckDB oracle mirror
        # (oracle_math.vincenty_inverse_levels) unrolls a fixed 8
        # iterations, and stopping at 1e-12 rad leaves ~1e-6 m drift —
        # visible at the oracle's 1 mm rounding.  Contraction is ~f per
        # step, so this adds only a couple of iterations.
        if np.all(converged) and np.all(np.abs(lam - lam_prev) < 1e-16):
            break

    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    big_a = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = big_b * sin_sigma * (
        cos_2sm
        + big_b / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
            - big_b / 6.0 * cos_2sm * (-3.0 + 4.0 * sin_sigma * sin_sigma)
            * (-3.0 + 4.0 * cos_2sm * cos_2sm)
        )
    )
    dist = b * big_a * (sigma - delta_sigma)

    coincident = (np.abs(lat1 - lat2) < 1e-15) & (np.abs(big_l) < 1e-15)
    dist = np.where(coincident, 0.0, dist)
    if not np.all(converged):
        dist = np.where(converged | coincident, dist, haversine_m(lat1_deg, lon1_deg, lat2_deg, lon2_deg))
    return dist


def haversine_m(lat1_deg, lon1_deg, lat2_deg, lon2_deg, radius=6371008.8):
    """Great-circle (spherical) distance in meters, vectorized.

    Cheap prefilter companion to :func:`inverse`; also the semantics of the
    engine's ``st_distance_sphere`` SQL-parity function.
    """
    lat1 = np.deg2rad(np.asarray(lat1_deg, dtype=np.float64))
    lon1 = np.deg2rad(np.asarray(lon1_deg, dtype=np.float64))
    lat2 = np.deg2rad(np.asarray(lat2_deg, dtype=np.float64))
    lon2 = np.deg2rad(np.asarray(lon2_deg, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * radius * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


# UCUM length-unit factors → meters (GmlUtils.java:220-240 lengthInMeters).
UCUM_TO_METERS = {
    "m": 1.0,
    "km": 1000.0,
    "mi": 1609.34,
    "M": 1852.0,
    "NM": 1852.0,
    "[nmi_i]": 1852.0,
}


def length_in_meters(value: float, uom: str) -> float:
    """UCUM length symbol (possibly a URI with #fragment) → meters.

    Reference: ``GmlUtils.java:220-240`` (``lengthInMeters``) — URI values
    take the fragment; unknown symbols raise.
    """
    sym = uom.rsplit("#", 1)[-1] if "#" in uom else uom
    try:
        return float(value) * UCUM_TO_METERS[sym]
    except KeyError as exc:
        raise ValueError(f"Unsupported unit of measure: {uom!r}") from exc
