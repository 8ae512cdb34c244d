"""Kernel unit tests porting the reference's golden numeric vectors.

Every vector below is copied from geomatics-geotk's JUnit tests / fixtures
(file:line cited per test; see FIXTURES.md §2) and asserted at the
reference's own tolerances.
"""

import numpy as np
import pytest

from geomatics_geotk_spark.kernels import crs, geodesic, geometry, temporal

YVR = (49.194722, -123.183889)


# ---------------------------------------------------------------------------
# Geodesic direct problem — VerifyGeodesyUtils.java:79-109
# ---------------------------------------------------------------------------

class TestGeodesicDirect:
    def test_north_1nm(self):
        lat, lon = geodesic.direct([YVR[0]], [YVR[1]], [0.0], [1852.0])
        assert abs(lat[0] - (YVR[0] + 0.016667)) < 1e-4
        assert abs(lon[0] - YVR[1]) < 1.5e-4

    def test_east_1nm(self):
        lat, lon = geodesic.direct([YVR[0]], [YVR[1]], [90.0], [1852.0])
        assert abs(lat[0] - YVR[0]) < 1e-4
        assert abs(lon[0] - (YVR[1] + 0.025310)) < 1.5e-4

    def test_west_1nm(self):
        lat, lon = geodesic.direct([YVR[0]], [YVR[1]], [270.0], [1852.0])
        assert abs(lat[0] - YVR[0]) < 1e-4
        assert abs(lon[0] - (YVR[1] - 0.025310)) < 1.5e-4

    def test_azimuth_normalization_irrelevant(self):
        # reference normalizes azimuth to ±180 (GeodesyUtils.java:110-132);
        # trig makes 270 ≡ −90
        lat1, lon1 = geodesic.direct([YVR[0]], [YVR[1]], [270.0], [1852.0])
        lat2, lon2 = geodesic.direct([YVR[0]], [YVR[1]], [-90.0], [1852.0])
        assert abs(lat1[0] - lat2[0]) < 1e-12 and abs(lon1[0] - lon2[0]) < 1e-12


class TestGeodesicInverse:
    def test_atkinson_jericho_distance(self):
        # VerifyTopologicalRelationships.java:119-140: Atkinson↔Jericho
        # < 8 km TRUE, < 3 nmi (5556 m) FALSE ⇒ distance in (5556, 8000)
        d = geodesic.inverse([49.3304], [-123.2646], [49.2756], [-123.2015])
        assert 5556.0 < d[0] < 8000.0

    def test_roundtrip_direct_inverse(self):
        lat, lon = geodesic.direct([YVR[0]], [YVR[1]], [37.0], [12345.0])
        d = geodesic.inverse([YVR[0]], [YVR[1]], lat, lon)
        assert abs(d[0] - 12345.0) < 0.01

    def test_coincident_zero(self):
        d = geodesic.inverse([YVR[0]], [YVR[1]], [YVR[0]], [YVR[1]])
        assert d[0] == 0.0


# ---------------------------------------------------------------------------
# UCUM units — VerifyGmlUtils / GmlUtils.java:220-240
# ---------------------------------------------------------------------------

class TestUnits:
    def test_nautical_mile_M(self):
        assert abs(geodesic.length_in_meters(100, "M") - 185200.0) <= 1.0

    def test_km(self):
        assert abs(geodesic.length_in_meters(12, "km") - 12000.0) <= 0.5

    def test_mile(self):
        assert geodesic.length_in_meters(1, "mi") == pytest.approx(1609.34)

    def test_nmi_i(self):
        assert geodesic.length_in_meters(1, "[nmi_i]") == 1852.0

    def test_uri_fragment(self):
        assert geodesic.length_in_meters(2, "http://example.com/ucum#km") == 2000.0

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            geodesic.length_in_meters(1, "furlong")


# ---------------------------------------------------------------------------
# CRS ids — GeodesyUtils.java:222-271
# ---------------------------------------------------------------------------

class TestCrsIds:
    def test_urn_abbrev(self):
        assert crs.abbreviated_crs_id("urn:ogc:def:crs:EPSG::4326") == "EPSG:4326"

    def test_http_abbrev(self):
        assert crs.abbreviated_crs_id("http://www.opengis.net/def/crs/EPSG/0/4326") == "EPSG:4326"

    def test_crs84(self):
        assert crs.abbreviated_crs_id("urn:ogc:def:crs:OGC:1.3:CRS84") == "CRS:84"

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError):
            crs.abbreviated_crs_id("ftp://nope/crs/EPSG/0/4326")

    def test_http_to_urn_version0_dropped(self):
        assert crs.srs_name_to_urn("http://www.opengis.net/def/crs/EPSG/0/4326") == "urn:ogc:def:crs:EPSG::4326"

    def test_domain_of_validity(self):
        w, s, e, n = crs.domain_of_validity("EPSG:32610")
        assert (w, e) == (-126.0, -120.0)


# ---------------------------------------------------------------------------
# Axis swap + transforms
# ---------------------------------------------------------------------------

class TestTransforms:
    def test_right_handed_axis_swap(self):
        # VerifyGeodesyUtils.java:112-122: 4326 ring (lat,lon) stored;
        # first coord x after transform = −123.1839
        lon, lat = crs.to_lonlat([49.1947], [-123.1839], "EPSG:4326")
        assert lon[0] == -123.1839 and lat[0] == 49.1947

    def test_utm10_roundtrip_atkinson(self):
        # FIXTURES §1.3: Point Atkinson (49.3304, −123.2646) ↔ UTM10 (480775, 5464220)
        x, y = crs.from_lonlat([-123.2646], [49.3304], "EPSG:32610")
        assert abs(x[0] - 480775) < 2.0 and abs(y[0] - 5464220) < 2.0
        lon, lat = crs.to_lonlat(x, y, "EPSG:32610")
        assert abs(lon[0] + 123.2646) < 1e-7 and abs(lat[0] - 49.3304) < 1e-7

    def test_utm32_point_in_dutch_polygon_area(self):
        # VerifyTopologicalRelationships.java:34-40 point UTM32N (358626, 5793259)
        # must land near the Polygon.xml area (~52.27N, 6.93E)
        lon, lat = crs.to_lonlat([358626.0], [5793259.0], "EPSG:32632")
        assert abs(lat[0] - 52.27) < 0.05 and abs(lon[0] - 6.93) < 0.05

    def test_transform_identity(self):
        x, y = crs.transform([1.0], [2.0], "EPSG:4326", "urn:ogc:def:crs:EPSG::4326")
        assert x[0] == 1.0 and y[0] == 2.0


# ---------------------------------------------------------------------------
# Dedup ppm ratio rule — VerifyGeodesyUtils.java:168-209
# ---------------------------------------------------------------------------

class TestDedupPpm:
    def test_three_to_two(self):
        coords = np.array([
            [55.233333, -36.166667],
            [55.231164, -36.894373],
            [55.23116339, -36.89437371],
        ])
        out = geometry.remove_consecutive_duplicates(coords, 1.0)
        assert len(out) == 2

    def test_ring_closure_preserved(self):
        # 8-point UTM ring with next-to-last ≈ first ⇒ 7 points, first == last
        ring = np.array([
            [486602.0, 5449119.0],
            [516675.0, 5452049.0],
            [503729.0, 5463799.0],
            [480775.0, 5464220.0],
            [470000.0, 5460000.0],
            [460000.0, 5455000.0],
            [486602.1, 5449119.1],   # ≈ first within 1 ppm
            [486602.0, 5449119.0],
        ])
        out = geometry.remove_consecutive_duplicates(ring, 1.0)
        assert len(out) == 7
        assert np.array_equal(out[0], out[-1])

    def test_zero_ordinate_kept(self):
        # ratio test divides by zero ⇒ NaN ⇒ comparison false ⇒ kept
        coords = np.array([[0.0, 1.0], [0.0, 1.0]])
        out = geometry.remove_consecutive_duplicates(coords, 1.0)
        assert len(out) == 2


# ---------------------------------------------------------------------------
# Arc densification — GmlUtils.java:98-128, VerifyGmlUtils
# ---------------------------------------------------------------------------

class TestArcDensify:
    def test_arc_by_center_point_10nm(self):
        lat, lon = geometry.infer_points_on_arc(YVR[0], YVR[1], 10 * 1852.0, 90.0, 360.0)
        assert len(lat) == 5
        # last point = 10 NM due north
        assert abs(lat[-1] - (49.19472 + 0.16653)) < 1.5e-4
        assert abs(lon[-1] - (-123.18389)) < 1.5e-4

    def test_circle_by_center_point_5km(self):
        lat, lon = geometry.infer_points_on_arc(YVR[0], YVR[1], 5000.0, 0.0, 0.0)
        assert len(lat) == 5
        assert abs(lat[0] - (49.19472 + 0.04496)) < 1.5e-4

    def test_end_angle_zero_becomes_360(self):
        lat0, lon0 = geometry.infer_points_on_arc(YVR[0], YVR[1], 1000.0, 0.0, 0.0)
        lat1, lon1 = geometry.infer_points_on_arc(YVR[0], YVR[1], 1000.0, 0.0, 360.0)
        assert np.allclose(lat0, lat1) and np.allclose(lon0, lon1)


# ---------------------------------------------------------------------------
# Predicates — VerifyTopologicalRelationships golden rows (FIXTURES §2.3)
# ---------------------------------------------------------------------------

# gml/Polygon-InteriorLinearRing.xml exterior (EPSG:4326 lat,lon per fixture,
# here already axis-swapped to lon,lat)
POLY_BC = [geometry._coords(
    "-123.1839 49.1947, -122.7710 49.2210, -122.9086 49.2740, "
    "-122.9487 49.3269, -123.2646 49.3304, -123.1839 49.1947"
)]

# gml/Polygon.xml vicinity (NL polygon around 52.27N 6.93E) — synthesized
# convex stand-in with the fixture's first exterior/interior coords on it.
POLY_NL = [geometry._coords(
    "6.90 52.25, 6.96 52.25, 6.96 52.29, 6.90 52.29, 6.90 52.25"
)]


class TestPredicates:
    def test_point_utm32_intersects_nl_polygon(self):
        # VerifyTopologicalRelationships.java:34-40 — cross-CRS point∈polygon
        lon, lat = crs.to_lonlat([358626.0], [5793259.0], "EPSG:32632")
        pt = ("point", [np.array([[lon[0], lat[0]]])])
        assert geometry.intersects(*pt, "polygon", POLY_NL)

    def test_linestring_disjoint_bc_polygon(self):
        # :43-49 — LineString (50.0 −121.5; 50.5 −121.0; 50.5 −120.7) misses polygon
        line = ("linestring", [np.array([[-121.5, 50.0], [-121.0, 50.5], [-120.7, 50.5]])])
        assert not geometry.intersects(*line, "polygon", POLY_BC)
        assert geometry.disjoint(*line, "polygon", POLY_BC)

    def test_contains_within_symmetry(self):
        # :101-116 — Polygon contains Point-2 (52.27316, 6.93263); swapped = within
        pt = ("point", [np.array([[6.93263, 52.27316]])])
        assert geometry.contains("polygon", POLY_NL, *pt)
        assert geometry.within(*pt, "polygon", POLY_NL)

    def test_dwithin_atkinson_jericho(self):
        # :119-140 — < 8 km true; < 3 nmi false (both CRSs harmonized first)
        d = geodesic.inverse([49.3304], [-123.2646], [49.2756], [-123.2015])[0]
        assert d < geodesic.length_in_meters(8, "km")
        assert not (d < geodesic.length_in_meters(3, "[nmi_i]"))

    def test_dwithin_utm_pair(self):
        # :143-152 — Polygon-32610 ↔ LineString-3 within 5 km (planar UTM ok too;
        # we harmonize to lon/lat and use geodesic min vertex distance)
        ring = geometry._coords(
            "486602 5449119, 516675 5452049, 503729 5463799, 480775 5464220, 486602 5449119"
        )
        line = geometry._coords("516675 5447049, 518675 5445049")
        (ax, ay), (bx, by) = geometry.nearest_points(ring, line)
        alon, alat = crs.to_lonlat([ax], [ay], "EPSG:32610")
        blon, blat = crs.to_lonlat([bx], [by], "EPSG:32610")
        dmin = geodesic.inverse(alat, alon, blat, blon)[0]
        assert dmin < 5000.0

    def test_equals_topo_rotated_ring(self):
        a = ("polygon", [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
        b = ("polygon", [np.array([[1.0, 1.0], [0, 1], [0, 0], [1, 0], [1, 1]], dtype=float)])
        assert geometry.equals_topo(*a, *b)

    def test_touches_point_on_boundary(self):
        pt = ("point", [np.array([[0.5, 0.0]])])
        sq = ("polygon", [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
        assert geometry.touches(*pt, *sq)
        inside = ("point", [np.array([[0.5, 0.5]])])
        assert not geometry.touches(*inside, *sq)

    def test_crosses_line_polygon(self):
        sq = ("polygon", [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
        line = ("linestring", [np.array([[-0.5, 0.5], [0.5, 0.5]])])
        assert geometry.crosses(*line, *sq)

    def test_crosses_corner_clip_both_endpoints_outside(self):
        # clips the lower-left corner of the unit square: neither endpoint
        # inside, but the interior enters and exits (JTS crosses = true) —
        # the r2 ADVICE fidelity gap, now caught via proper edge crossings
        sq = ("polygon", [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
        clip = ("linestring", [np.array([[-0.2, 0.3], [0.3, -0.2]])])
        assert geometry.crosses(*clip, *sq)
        # near-miss variant passing outside the corner: not crossing
        miss = ("linestring", [np.array([[-0.2, 0.1], [0.1, -0.2]])])
        assert not geometry.crosses(*miss, *sq)

    def test_crosses_interior_to_boundary_is_not_crossing(self):
        # a line from a strictly-interior point ENDING ON the boundary
        # never reaches the exterior — JTS says within, not crosses
        sq = ("polygon", [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)])
        line = ("linestring", [np.array([[0.5, 0.5], [1.0, 0.5]])])
        assert not geometry.crosses(*line, *sq)

    def test_overlaps_polygons(self):
        a = ("polygon", [np.array([[0.0, 0.0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)])
        b = ("polygon", [np.array([[1.0, 1.0], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)])
        assert geometry.overlaps(*a, *b)
        c = ("polygon", [np.array([[5.0, 5.0], [6, 5], [6, 6], [5, 6], [5, 5]], dtype=float)])
        assert not geometry.overlaps(*a, *c)

    def test_hole_excluded(self):
        outer = np.array([[0.0, 0.0], [4, 0], [4, 4], [0, 4], [0, 0]])
        hole = np.array([[1.0, 1.0], [3, 1], [3, 3], [1, 3], [1, 1]])
        inside_hole = geometry.points_in_polygon(np.array([2.0]), np.array([2.0]), [outer, hole])
        in_solid = geometry.points_in_polygon(np.array([0.5]), np.array([0.5]), [outer, hole])
        assert not inside_hole[0] and in_solid[0]


# ---------------------------------------------------------------------------
# Envelopes — VerifyExtents.java (FIXTURES §2.4)
# ---------------------------------------------------------------------------

class TestEnvelopes:
    def test_multigeometry_extent_upper_corner(self):
        # square 49..50 × −123.5..−122.5 plus point (50.55, −122.22)
        sq = geometry.envelope_as_polygon(-123.5, 49.0, -122.5, 50.0)
        pt = np.array([[-122.22, 50.55]])
        env = geometry.envelope_of([sq, pt])
        assert env[2] == -122.22 and env[3] == 50.55

    def test_coalesce_crs84_boxes(self):
        # (−117.6 32.0..−116.2 33.5) ∪ (−116.0 32.6..−115.0 34.0)
        a = (-117.6, 32.0, -116.2, 33.5)
        b = (-116.0, 32.6, -115.0, 34.0)
        lo = (min(a[0], b[0]), min(a[1], b[1]))
        hi = (max(a[2], b[2]), max(a[3], b[3]))
        assert lo == (-117.6, 32.0) and hi == (-115.0, 34.0)

    def test_antipodes(self):
        lat, lon = geometry.antipode([49.19, 48.11, -31.94], [-123.18, 16.57, 115.97])
        assert np.allclose(lat, [-49.19, -48.11, 31.94])
        assert np.allclose(lon, [56.82, -163.43, -64.03])

    def test_antipodal_envelope_utm(self):
        # envelopes/Envelope-UTM.xml EPSG:32610 (514432 5429689)-(529130 5451619)
        # antipodal lower corner ≈ (−49.22, 57.20) tol 0.01 (VerifyExtents:294-300)
        lon, lat = crs.to_lonlat([514432.0, 529130.0], [5429689.0, 5451619.0], "EPSG:32610")
        alat, alon = geometry.antipode(lat, lon)
        assert abs(min(alat) - (-49.22)) < 0.01
        assert abs(min(alon) - 57.20) < 0.01

    def test_envelope_as_polygon_ccw_closed(self):
        ring = geometry.envelope_as_polygon(0, 0, 2, 1)
        assert len(ring) == 5 and np.array_equal(ring[0], ring[-1])
        area2 = sum(
            ring[i, 0] * ring[i + 1, 1] - ring[i + 1, 0] * ring[i, 1]
            for i in range(4)
        )
        assert area2 > 0  # CCW

    def test_bbox_intersects(self):
        assert geometry.envelopes_intersect((0, 0, 2, 2), (1, 1, 3, 3))
        assert not geometry.envelopes_intersect((0, 0, 1, 1), (2, 2, 3, 3))


# ---------------------------------------------------------------------------
# Convex hull / posList
# ---------------------------------------------------------------------------

class TestCoordOps:
    def test_convex_hull_square_with_interior(self):
        pts = np.array([[0.0, 0.0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.7]])
        hull = geometry.convex_hull(pts)
        assert len(hull) == 5  # closed square
        assert np.array_equal(hull[0], hull[-1])

    def test_poslist_stride3_drops_z(self):
        out = geometry.extract_coords_from_poslist([1, 2, 99, 3, 4, 98], 3)
        assert out.shape == (2, 2)
        assert np.array_equal(out, [[1, 2], [3, 4]])

    def test_wkt_roundtrip(self):
        k, p = geometry.parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.4 0.2, 0.3 0.4, 0.2 0.2))")
        assert k == "polygon" and len(p) == 2 and p[0].shape == (5, 2)
        k2, p2 = geometry.parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        assert k2 == "multipolygon" and len(p2) == 2

    def test_wkt_point(self):
        k, p = geometry.parse_wkt("POINT (-123.1839 49.1947)")
        assert k == "point" and p[0][0, 0] == -123.1839


# ---------------------------------------------------------------------------
# Temporal — VerifyTemporalUtils / VerifyTemporalComparator (FIXTURES §2.7)
# ---------------------------------------------------------------------------

T0 = np.datetime64("2015-12-03T10:15:30", "us")


def _m(months):
    # calendar-month shift on a fixed date (Dec 3) — ok for test vectors
    y, mo = 2015, 12 + months
    y += (mo - 1) // 12
    mo = (mo - 1) % 12 + 1
    return np.datetime64(f"{y:04d}-{mo:02d}-03T10:15:30", "us")


class TestTemporal:
    def test_instant_during_period(self):
        m = temporal.relation_mask("During", [T0], [None], [_m(-10)], [_m(5)])
        assert m[0]

    def test_period_contains_instant(self):
        m = temporal.relation_mask("Contains", [_m(-10)], [_m(5)], [T0], [None])
        assert m[0]

    def test_before_after(self):
        assert temporal.relation_mask("Before", [_m(-10)], [_m(-5)], [T0], [None])[0]
        assert temporal.relation_mask("After", [T0], [None], [_m(-10)], [_m(-5)])[0]

    def test_extent_padding(self):
        # {instant t, period [t−5M, t−1M]} → [t−5M−1h, t+1h]
        b, e = temporal.temporal_extent([T0, _m(-5)], [None, _m(-1)])
        assert b == _m(-5) - temporal.HOUR
        assert e == T0 + temporal.HOUR

    def test_extent_during_member_irrelevant(self):
        # {instant t, period [t−5M, t+2M]} → [t−5M−1h, t+2M+1h] (duration ≈ P7M)
        b, e = temporal.temporal_extent([T0, _m(-5)], [None, _m(2)])
        assert b == _m(-5) - temporal.HOUR and e == _m(2) + temporal.HOUR

    def test_split_interval_meets(self):
        parts = temporal.split_interval(_m(-1), _m(1), 2)
        assert len(parts) == 2
        assert parts[0][1] == parts[1][0]  # first MEETS second
        assert parts[0][0] == _m(-1) and parts[1][1] == _m(1)

    def test_comparator_order(self):
        # instant < later instant; instant > earlier period; period < later period
        begins = [T0, _m(1), _m(-5)]
        ends = [None, None, _m(-1)]
        order = temporal.comparator_key(begins, ends)
        assert list(order) == [2, 0, 1]

    def test_meets_metby(self):
        assert temporal.relation_mask("Meets", [_m(-1)], [T0], [T0], [_m(1)])[0]
        assert temporal.relation_mask("MetBy", [T0], [_m(1)], [_m(-1)], [T0])[0]

    def test_overlaps(self):
        assert temporal.relation_mask("Overlaps", [_m(-2)], [T0], [_m(-1)], [_m(1)])[0]
        assert temporal.relation_mask("OverlappedBy", [_m(-1)], [_m(1)], [_m(-2)], [T0])[0]

    def test_begins_ends(self):
        assert temporal.relation_mask("Begins", [_m(-1)], [T0], [_m(-1)], [_m(1)])[0]
        assert temporal.relation_mask("BegunBy", [_m(-1)], [_m(1)], [_m(-1)], [T0])[0]
        assert temporal.relation_mask("Ends", [T0], [_m(1)], [_m(-1)], [_m(1)])[0]
        assert temporal.relation_mask("EndedBy", [_m(-1)], [_m(1)], [T0], [_m(1)])[0]
