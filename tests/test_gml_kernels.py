"""GML decode + flattening vs the reference's Verify* goldens.

Vectors come straight from the reference test classes
(VerifyCurveCoordinateListFactory.java:43-110,
VerifySurfaceCoordinateListFactory.java:49-137, VerifyExtents,
VerifyGmlUtils) run against the reference's own fixture files under
/root/reference/src/test/resources — the flattening counts 5/8/9/42, the
reversed-orientable first coordinate, the two-patch union → 6 boundary
points, and the AIXM extension-element surfaces.
"""

import os

import numpy as np
import pytest

from geomatics_geotk_spark.kernels import gml

RES_DIR = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES_DIR), reason="reference fixtures not available"
)


def load(rel: str) -> str:
    with open(os.path.join(RES_DIR, rel)) as f:
        return f.read()


def geom(rel: str):
    return gml.parse(load(rel))


class TestCurveFlattening:
    def test_curve_with_arc_by_center_point(self):
        # VerifyCurveCoordinateListFactory.curveWithArcByCenterPoint
        coords = gml.curve_coordinate_list(geom("gml/Curve-ArcByCenterPoint.xml"))
        assert len(coords) == 5  # TOTAL_ARC_POINTS

    def test_line_string(self):
        coords = gml.curve_coordinate_list(geom("gml/LineString.xml"))
        assert len(coords) == 3

    def test_composite_curve(self):
        # member concat with srsName inheritance → 8 points
        coords = gml.curve_coordinate_list(geom("gml/CompositeCurve.xml"))
        assert len(coords) == 8

    def test_orientable_curve_reversed(self):
        # orientation "-" reverses the base curve; first coordinate golden
        coords = gml.curve_coordinate_list(geom("gml/OrientableCurve.xml"))
        assert len(coords) == 5
        assert coords[0] == pytest.approx((49.361246, -123.183889))

    def test_tripartite_curve(self):
        # GeodesicString(2) + ArcByCenterPoint(5) + GeodesicString(2) = 9
        coords = gml.curve_coordinate_list(geom("gml/Curve-tripartite.xml"))
        assert len(coords) == 9

    def test_polygon_exterior_via_curve_factory(self):
        # createCoordinateList(exterior ring) → 42
        elem = geom("gml/Polygon.xml")
        ext = [c for c in elem if gml._local(c.tag) == "exterior"][0]
        ring = next(iter(ext))
        ring.set("srsName", elem.get("srsName"))
        assert len(gml.curve_coordinate_list(ring)) == 42

    def test_arc_points_lie_on_radius(self):
        # each densified arc point sits ~10 NM from the YVR center
        from geomatics_geotk_spark.kernels import geodesic

        coords = gml.curve_coordinate_list(geom("gml/Curve-ArcByCenterPoint.xml"))
        d = geodesic.inverse(
            coords[:, 0], coords[:, 1],
            np.full(len(coords), 49.194722), np.full(len(coords), -123.183889),
        )
        assert np.allclose(d, 10 * 1852.0, rtol=1e-6)


class TestSurfaceBoundaries:
    def test_polygon_exterior(self):
        assert len(gml.surface_exterior_boundary(geom("gml/Polygon.xml"))) == 42

    def test_polygon_interior(self):
        ints = gml.surface_interior_boundaries(geom("gml/Polygon.xml"))
        assert len(ints) == 1 and len(ints[0]) == 9

    def test_surface_single_patch(self):
        assert len(gml.surface_exterior_boundary(geom("gml/Surface-PolygonPatch-1.xml"))) == 42
        ints = gml.surface_interior_boundaries(geom("gml/Surface-PolygonPatch-1.xml"))
        assert len(ints) == 1 and len(ints[0]) == 9

    def test_surface_two_patch_union(self):
        # the JTS-union golden: quad + edge-adjacent triangle → 6 points
        coords = gml.surface_exterior_boundary(geom("gml/Surface-PolygonPatch-2.xml"))
        assert len(coords) == 6
        # the boundary must be the pentagon hull vertices (shared edge gone)
        pts = {tuple(p) for p in coords}
        assert (516675.0, 5452049.0) in pts and (532639.0, 5473874.0) in pts
        assert not _edge_in(coords, (516675.0, 5452049.0), (503729.0, 5463799.0))

    def test_surface_tripartite_exterior(self):
        assert len(gml.surface_exterior_boundary(geom("gml/Surface-PolygonPatch-3.xml"))) == 9

    def test_aixm_surface_extension_element(self):
        assert len(gml.surface_exterior_boundary(geom("gml/AIXMSurface.xml"))) == 10
        ints = gml.surface_interior_boundaries(geom("gml/AIXMSurface-2.xml"))
        assert len(ints) == 1 and len(ints[0]) == 4


def _edge_in(ring, a, b):
    pts = [tuple(p) for p in ring]
    for i in range(len(pts) - 1):
        if {pts[i], pts[i + 1]} == {a, b}:
            return True
    return False


class TestSrsMachinery:
    def test_set_srs_on_collection_members(self):
        # MultiCurve.xml: 4 members, one already carries srsName=32632 —
        # stamped members inherit 4326, the existing one is left as is
        # (GmlUtils.java:153-180 "left as is")
        elem = geom("gml/MultiCurve.xml")
        n = gml.set_srs_name_on_collection_members(elem)
        srs = [
            member.get("srsName")
            for prop in elem
            if gml._local(prop.tag) in {"curveMember", "curveMembers"}
            for member in prop
        ]
        assert n == len(srs) - 1  # both kinds of properties, one pre-set
        assert srs.count("urn:ogc:def:crs:EPSG::32632") == 1
        assert all(s in {"urn:ogc:def:crs:EPSG::4326", "urn:ogc:def:crs:EPSG::32632"} for s in srs)

    def test_find_crs_reference_self(self):
        elem = geom("gml/Point.xml")
        assert gml.find_crs_reference(elem, elem) == "urn:ogc:def:crs:EPSG::4326"

    def test_find_crs_reference_inherited(self):
        xml = (
            '<gml:MultiPoint xmlns:gml="http://www.opengis.net/gml/3.2" '
            'srsName="urn:ogc:def:crs:EPSG::4258">'
            "<gml:pointMember><gml:Point><gml:pos>1 2</gml:pos></gml:Point>"
            "</gml:pointMember></gml:MultiPoint>"
        )
        root = gml.parse(xml)
        pt = next(iter(next(iter(root))))
        assert gml.find_crs_reference(pt, root) == "urn:ogc:def:crs:EPSG::4258"
        assert pt.get("srsName") == "urn:ogc:def:crs:EPSG::4258"  # side effect

    def test_find_crs_reference_bounded_by(self):
        xml = (
            '<f xmlns:gml="http://www.opengis.net/gml/3.2">'
            "<gml:boundedBy><gml:Envelope srsName=\"urn:ogc:def:crs:EPSG::32610\">"
            "<gml:lowerCorner>0 0</gml:lowerCorner><gml:upperCorner>1 1</gml:upperCorner>"
            "</gml:Envelope></gml:boundedBy>"
            "<gml:Point><gml:pos>3 4</gml:pos></gml:Point></f>"
        )
        root = gml.parse(xml)
        pt = [e for e in root.iter() if gml._local(e.tag) == "Point"][0]
        assert gml.find_crs_reference(pt, root) == "urn:ogc:def:crs:EPSG::32610"


class TestValidationAndEnvelopes:
    def test_min_curve_segment_length_ladder(self):
        # GmlUtils.java:267-277
        assert gml.min_curve_segment_length("ArcByCenterPoint") == 1
        assert gml.min_curve_segment_length("CircleByCenterPoint") == 1
        assert gml.min_curve_segment_length("ArcString") == 3
        assert gml.min_curve_segment_length("Arc") == 3
        assert gml.min_curve_segment_length("Circle") == 3
        assert gml.min_curve_segment_length("LineStringSegment") == 2
        assert gml.min_curve_segment_length("GeodesicString") == 2

    def test_validate_curve_segments(self):
        assert gml.validate_curve_segments(geom("gml/Curve-ArcByCenterPoint.xml")) == []
        bad = gml.parse(
            '<gml:Curve xmlns:gml="http://www.opengis.net/gml/3.2" '
            'srsName="urn:ogc:def:crs:EPSG::4326"><gml:segments>'
            "<gml:Arc><gml:pos>1 2</gml:pos><gml:pos>3 4</gml:pos></gml:Arc>"
            "</gml:segments></gml:Curve>"
        )
        v = gml.validate_curve_segments(bad)
        assert len(v) == 1 and "Arc" in v[0]

    def test_create_envelope_ows_bbox(self):
        env = gml.create_envelope(load("envelopes/BoundingBox-4326.xml"))
        assert env == {"crs": "EPSG:4326", "lower": (32.0, -117.6), "upper": (33.5, -116.2)}

    def test_create_envelope_gml_utm(self):
        env = gml.create_envelope(load("envelopes/Envelope-UTM.xml"))
        assert env["crs"] == "EPSG:32610"
        assert env["lower"] == (514432.0, 5429689.0)

    def test_create_envelope_empty_crs_defaults_crs84(self):
        env = gml.create_envelope(load("envelopes/WGS84BoundingBox.xml"))
        assert env["crs"] == "CRS:84"
        assert env["lower"] == (-116.0, 32.6)


class TestTemporalParsing:
    def test_time_instant_offset(self):
        t = gml.gml_to_temporal(load("gml/temporal/TimeInstant-Offset.xml"))
        assert t["kind"] == "instant" and t["begin"].startswith("2016-06-30T12:51:29")

    def test_time_period_utc(self):
        t = gml.gml_to_temporal(load("gml/temporal/TimePeriod-UTC.xml"))
        assert t["kind"] == "period" and t["end"].startswith("2016-07-10T22:05:39")

    def test_date_only_rejected(self):
        # "Not an ISO instant" per GmlUtils.java:474-487
        with pytest.raises(ValueError, match="Not an ISO instant"):
            gml.gml_to_temporal(load("gml/temporal/TimeInstant-Date.xml"))


class TestSparkGmlScan:
    def test_decode_all_reference_fixtures(self, spark):
        """End-to-end: read every reference GML fixture through the Spark
        scan operator; the known-kind files must decode with no error and
        reproduce the flattening-count goldens."""
        from geomatics_geotk_spark.sources.gml import read_gml_files, decode_gml

        df = decode_gml(read_gml_files(spark, f"{RES_DIR}/gml/*.xml"))
        rows = {
            os.path.basename(r["path"]): r["geom"].asDict()
            for r in df.collect()
        }
        assert len(rows) == 38
        # every fixture except the (non-geometry) feature collection
        # decodes cleanly — incl. Multi*, property-wrapped, Envelope,
        # and the comma-separated posList variant
        errored = [f for f, r in rows.items() if r["error"] is not None]
        assert errored == ["FeatureCollection-1.xml"]
        golden_counts = {
            "Curve-ArcByCenterPoint.xml": 5,
            "LineString.xml": 3,
            "CompositeCurve.xml": 8,
            "OrientableCurve.xml": 5,
            "Curve-tripartite.xml": 9,
            "Polygon.xml": 42,
            "Surface-PolygonPatch-1.xml": 42,
            "Surface-PolygonPatch-2.xml": 6,
            "Surface-PolygonPatch-3.xml": 9,
            "AIXMSurface.xml": 10,
            "Point.xml": 1,
        }
        for fname, want in golden_counts.items():
            got = rows[fname]
            assert got["error"] is None, f"{fname}: {got['error']}"
            assert got["n_points"] == want, f"{fname}: {got['n_points']} != {want}"
        assert rows["OrientableCurve.xml"]["first_x"] == pytest.approx(49.361246)
        assert rows["Polygon.xml"]["n_interior_rings"] == 1
        assert rows["Polygon.xml"]["n_interior_points"] == 9
        assert rows["Point.xml"]["crs"] == "urn:ogc:def:crs:EPSG::4326"


class TestRemoteRingHref:
    """Remote Ring member resolution — CurveCoordinateListFactory.java:
    198-218 (the reference dereferences xlink:href curve members; this
    engine resolves through a pluggable resolver, here the local-fixture
    store)."""

    GML = "http://www.opengis.net/gml/3.2"
    XLINK = "http://www.w3.org/1999/xlink"

    def _ring_xml(self, href: str) -> str:
        return (
            f'<gml:Ring xmlns:gml="{self.GML}" xmlns:xlink="{self.XLINK}" '
            f'srsName="urn:ogc:def:crs:OGC:1.3:CRS84">'
            f'<gml:curveMember xlink:href="{href}"/>'
            f'<gml:curveMember><gml:LineString>'
            f"<gml:posList>2 1 0 0</gml:posList>"
            f"</gml:LineString></gml:curveMember>"
            f"</gml:Ring>"
        )

    def _store(self) -> dict:
        remote = (
            f'<gml:LineString xmlns:gml="{self.GML}" gml:id="seg1">'
            f"<gml:posList>0 0 1 0 2 1</gml:posList></gml:LineString>"
        )
        doc = (
            f'<gml:FeatureCollection xmlns:gml="{self.GML}">'
            f'<gml:featureMember>{remote}</gml:featureMember>'
            f"</gml:FeatureCollection>"
        )
        return {"https://example.org/curves.xml": doc,
                "https://example.org/line-only.xml": remote}

    def test_whole_document_href(self):
        resolver = gml.local_href_resolver(self._store())
        ring = gml.parse(self._ring_xml("https://example.org/line-only.xml"))
        coords = gml.curve_coordinate_list(ring, "", resolver)
        assert [tuple(p) for p in coords] == [
            (0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (2.0, 1.0), (0.0, 0.0)
        ]

    def test_fragment_href(self):
        resolver = gml.local_href_resolver(self._store())
        ring = gml.parse(self._ring_xml("https://example.org/curves.xml#seg1"))
        coords = gml.curve_coordinate_list(ring, "", resolver)
        assert len(coords) == 5 and tuple(coords[0]) == (0.0, 0.0)

    def test_unresolvable_href_raises(self):
        resolver = gml.local_href_resolver(self._store())
        ring = gml.parse(self._ring_xml("https://example.org/missing.xml"))
        with pytest.raises(ValueError, match="Unresolvable"):
            gml.curve_coordinate_list(ring, "", resolver)

    def test_no_resolver_raises(self):
        ring = gml.parse(self._ring_xml("https://example.org/line-only.xml"))
        with pytest.raises(ValueError, match="resolver"):
            gml.curve_coordinate_list(ring, "")


class TestOverlappingPatchUnion:
    """OVERLAPPING surface patches (legal GML; JTS union semantics) —
    r2 verdict item 4: the odd-edge-count rule only covered edge-adjacent
    patches; overlapping and partially-shared edges now route to the
    general edge-splitting union."""

    GML = "http://www.opengis.net/gml/3.2"

    def _surface(self, *rings_pos: str) -> str:
        patches = "".join(
            f"<gml:PolygonPatch><gml:exterior><gml:LinearRing>"
            f"<gml:posList>{pos}</gml:posList>"
            f"</gml:LinearRing></gml:exterior></gml:PolygonPatch>"
            for pos in rings_pos
        )
        return (
            f'<gml:Surface xmlns:gml="{self.GML}" '
            f'srsName="urn:ogc:def:crs:OGC:1.3:CRS84">'
            f"<gml:patches>{patches}</gml:patches></gml:Surface>"
        )

    @staticmethod
    def _area(ring) -> float:
        x, y = ring[:-1, 0], ring[:-1, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))

    def test_overlapping_patches_union_area(self):
        # [0,2]^2 ∪ [1,3]^2: area 7, 8 boundary vertices, closed ring
        s = gml.parse(self._surface(
            "0 0 2 0 2 2 0 2 0 0", "1 1 3 1 3 3 1 3 1 1"
        ))
        b = gml.surface_exterior_boundary(s)
        assert tuple(b[0]) == tuple(b[-1])
        assert self._area(b) == pytest.approx(7.0)
        assert len(b) - 1 == 8
        assert (1.0, 1.0) not in {tuple(p) for p in b}  # interior corner gone

    def test_partially_shared_edge_union(self):
        # square [0,2]^2 + box [2,3]x[0.5,1.5] sharing PART of an edge
        s = gml.parse(self._surface(
            "0 0 2 0 2 2 0 2 0 0", "2 0.5 3 0.5 3 1.5 2 1.5 2 0.5"
        ))
        b = gml.surface_exterior_boundary(s)
        assert self._area(b) == pytest.approx(5.0)
        assert tuple(b[0]) == tuple(b[-1])

    def test_edge_adjacent_still_fast_path_golden(self):
        # complete shared edge: odd-edge-count result unchanged
        s = gml.parse(self._surface(
            "0 0 1 0 1 1 0 1 0 0", "1 0 2 0 2 1 1 1 1 0"
        ))
        b = gml.surface_exterior_boundary(s)
        assert self._area(b) == pytest.approx(2.0)
        assert {tuple(p) for p in b[:-1]} == {
            (0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (0.0, 1.0)
        }
