"""CRS normalization + coordinate transforms, vectorized (pure numpy).

Re-expresses the reference's CRS handling:

- CRS-id normalization: URN / http-URI → ``"AUTHORITY:CODE"``
  (``GeodesyUtils.java:222-240`` getAbbreviatedCRSIdentifier) and
  http-URI → URN (``GeodesyUtils.java:254-271`` convertSRSNameToURN).
- Axis-order normalization to a right-handed (lon, lat) CS
  (``GeodesyUtils.java:144-171`` transformRingToRightHandedCS): geographic
  CRSs whose axis order is (lat, lon) — EPSG:4326 / EPSG:4258 — get their
  ordinates swapped; CRS84 and projected CRSs are already x=east.
- Reprojection between the CRSs exercised by the reference tests
  (``TopologicalRelationships.java:261-271`` setCRS): EPSG:4326, EPSG:4258
  (ETRS89 ≈ WGS84 at test tolerance), OGC CRS84, and the UTM zones
  EPSG:32610 / EPSG:32632 via closed-form transverse-Mercator (Snyder
  series, sub-mm vs. the EPSG method for in-zone coordinates).

Everything operates on whole numpy arrays; the Spark layer calls these from
Arrow-batched pandas UDFs (no per-row Python).
"""

from __future__ import annotations

import re

import numpy as np

# ---------------------------------------------------------------------------
# CRS identifier normalization
# ---------------------------------------------------------------------------

#: CRSs with (lat, lon) axis order in their official definition.
LATLON_ORDER = {"EPSG:4326", "EPSG:4258"}

#: Geographic CRSs treated as same-datum at reference test tolerance.
GEOGRAPHIC = {"EPSG:4326", "EPSG:4258", "CRS:84", "OGC:CRS84"}

_URN_RE = re.compile(r"^urn:ogc:def:crs:([^:]+):[^:]*:(.+)$", re.IGNORECASE)
_HTTP_RE = re.compile(r"^https?://www\.opengis\.net/def/crs/([^/]+)/[^/]*/(.+)$", re.IGNORECASE)
_ABBREV_RE = re.compile(r"^([A-Za-z_0-9]+):(.+)$")


def abbreviated_crs_id(srs_name: str) -> str:
    """URN or http CRS reference → ``"AUTHORITY:CODE"``.

    Reference: ``GeodesyUtils.java:222-240`` — splits the identifier on
    ':' or '/' after the "crs" component; unknown schemes raise.
    WGS84 special cases map to the canonical spellings used across the
    engine: ``CRS:84`` for OGC CRS84.
    """
    s = srs_name.strip()
    m = _URN_RE.match(s)
    if m:
        auth, code = m.group(1), m.group(2)
    else:
        m = _HTTP_RE.match(s)
        if m:
            auth, code = m.group(1), m.group(2)
        else:
            m = _ABBREV_RE.match(s)
            if m and "://" not in s and not s.lower().startswith(("http", "urn")):
                auth, code = m.group(1), m.group(2)
            else:
                raise ValueError(f"Unsupported CRS reference: {srs_name!r}")
    auth = auth.upper()
    if auth == "OGC" and code.upper() in {"CRS84", "84"}:
        return "CRS:84"
    if auth == "CRS":
        return f"CRS:{code}"
    return f"{auth}:{code}"


def srs_name_to_urn(srs_name: str) -> str:
    """http CRS URI (or already-URN) → OGC URN form.

    Reference: ``GeodesyUtils.java:254-271`` — version "0" or empty is
    dropped (empty version component in the URN).
    """
    s = srs_name.strip()
    if s.lower().startswith("urn:"):
        return s
    m = _HTTP_RE.match(s)
    if not m:
        raise ValueError(f"Unsupported CRS reference: {srs_name!r}")
    auth, code = m.group(1), m.group(2)
    ver = s.split("/crs/", 1)[1].split("/")[1] if "/crs/" in s else ""
    if ver == "0":
        ver = ""
    return f"urn:ogc:def:crs:{auth}:{ver}:{code}"


def normalize_crs(crs: str) -> str:
    """Any accepted CRS spelling → canonical ``AUTHORITY:CODE``."""
    if not crs:
        return "CRS:84"
    c = crs.strip()
    if c.lower().startswith(("urn:", "http:", "https:")):
        c = abbreviated_crs_id(c)
    c = c.upper().replace("OGC:CRS84", "CRS:84")
    if c in {"CRS84", "CRS:84", "OGC:84"}:
        return "CRS:84"
    return c


def is_latlon_order(crs: str) -> bool:
    return normalize_crs(crs) in LATLON_ORDER


# ---------------------------------------------------------------------------
# Transverse Mercator (Snyder 1987, Map Projections — A Working Manual, ch. 8)
# ---------------------------------------------------------------------------

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996

#: supported projected CRSs → central meridian (deg); all northern UTM,
#: false easting 500000, false northing 0.
UTM_LON0 = {
    "EPSG:32610": -123.0,
    "EPSG:32632": 9.0,
}


def _meridian_arc(phi):
    e2, e4, e6 = _E2, _E2 * _E2, _E2 * _E2 * _E2
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def tm_forward(lon_deg, lat_deg, lon0_deg):
    """Geographic → transverse-Mercator easting/northing (UTM north)."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.deg2rad(lon0_deg)

    sin_phi, cos_phi, tan_phi = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin_phi**2)
    t = tan_phi**2
    c = _EP2 * cos_phi**2
    a_ = (lam - lam0) * cos_phi
    m = _meridian_arc(phi)

    x = _K0 * n * (
        a_ + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * _EP2) * a_**5 / 120
    ) + 500000.0
    y = _K0 * (
        m + n * tan_phi * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a_**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    return x, y


def tm_inverse(x, y, lon0_deg):
    """Transverse-Mercator easting/northing → geographic (lon, lat) deg."""
    x = np.asarray(x, dtype=np.float64) - 500000.0
    y = np.asarray(y, dtype=np.float64)
    lam0 = np.deg2rad(lon0_deg)

    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = mu + (
        (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)

    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * _EP2 - 3 * c1 * c1) * d**6 / 720
    )
    lam = lam0 + (
        d - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * _EP2 + 24 * t1 * t1) * d**5 / 120
    ) / cos1
    return np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Unified transform: any supported CRS ↔ lon/lat (CRS:84 frame)
# ---------------------------------------------------------------------------


def to_lonlat(x, y, crs: str):
    """(x, y) ordinates *as stored* in ``crs`` (native axis order) → (lon, lat).

    For EPSG:4326/4258 the stored order is (lat, lon) so x is latitude —
    this function performs the right-handed axis swap of
    ``GeodesyUtils.java:144-171``.  Projected CRSs run the TM inverse.
    """
    c = normalize_crs(crs)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if c in UTM_LON0:
        return tm_inverse(x, y, UTM_LON0[c])
    if c in LATLON_ORDER:
        return y, x  # stored (lat, lon) → (lon, lat)
    if c == "CRS:84":
        return x, y
    raise ValueError(f"Unsupported CRS: {crs!r}")


def from_lonlat(lon, lat, crs: str):
    """(lon, lat) → ordinates in ``crs`` native axis order (inverse of to_lonlat)."""
    c = normalize_crs(crs)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if c in UTM_LON0:
        return tm_forward(lon, lat, UTM_LON0[c])
    if c in LATLON_ORDER:
        return lat, lon
    if c == "CRS:84":
        return lon, lat
    raise ValueError(f"Unsupported CRS: {crs!r}")


def transform(x, y, src_crs: str, dst_crs: str):
    """Reproject ordinate arrays src → dst (reference ``setCRS`` semantics,
    ``TopologicalRelationships.java:261-271``): harmonize both operands into
    a common CRS before predicate evaluation."""
    if normalize_crs(src_crs) == normalize_crs(dst_crs):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = to_lonlat(x, y, src_crs)
    return from_lonlat(lon, lat, dst_crs)


# ---------------------------------------------------------------------------
# Domain of validity (EPSG area-of-use) for the CRSs the engine supports.
# Reference: GeodesyUtils.java:56-66 getDomainOfValidity.
# Envelopes are (west, south, east, north) in CRS:84 lon/lat degrees.
# ---------------------------------------------------------------------------

DOMAIN_OF_VALIDITY = {
    "EPSG:4326": (-180.0, -90.0, 180.0, 90.0),
    "CRS:84": (-180.0, -90.0, 180.0, 90.0),
    "EPSG:4258": (-16.1, 32.88, 40.18, 84.73),
    "EPSG:32610": (-126.0, 0.0, -120.0, 84.0),
    "EPSG:32632": (6.0, 0.0, 12.0, 84.0),
}


def domain_of_validity(crs: str):
    c = normalize_crs(crs)
    try:
        return DOMAIN_OF_VALIDITY[c]
    except KeyError as exc:
        raise ValueError(f"No domain of validity for CRS {crs!r}") from exc
