"""GML 3.2.1 geometry decode + curve/surface flattening (pure Python/numpy).

The reference's actual front door is GML DOM: every predicate/extent entry
point unmarshals gml:* elements (``GmlUtils.java:414-433``,
``TopologicalRelationships.java:227-247``).  This module re-expresses that
decode + the coordinate-list factories as batch-friendly functions the
Spark layer calls from Arrow-batched UDFs (``sources/gml.py``):

- curve flattening dispatch (``CurveCoordinateListFactory.java:64-218``):
  Curve segments by kind (``CurveSegmentType.java:23-95``), LineString,
  CompositeCurve member concat with srsName inheritance (:140-151),
  OrientableCurve "-" reversal (:161-169), Ring/LinearRing incl. curve
  members (:178-218; remote-href members resolved via a caller-supplied
  resolver, mirroring the unmarshal-URI path at :198-204);
- arc densification to TOTAL_ARC_POINTS via the geodesic direct kernel
  (``GmlUtils.java:98-128``);
- surface boundary extraction with multi-patch union
  (``SurfaceCoordinateListFactory.java:70-263``): patch exteriors merged
  exactly like JTS ``GeometryCollection.union()`` for edge-adjacent
  patches (edge-cancellation — patches of a valid gml:Surface share
  complete edges), interior-ring sets per patch;
- srsName resolution (``GmlUtils.java:299-327`` findCRSReference,
  :153-180 setSrsNameOnCollectionMembers);
- segment-length validation (``GmlUtils.java:267-277``);
- envelope text parsing (``Extents.java:285-326`` createEnvelope);
- temporal primitive parsing (``GmlUtils.java:466-506``).

Coordinates keep the CRS's NATIVE axis order, exactly like the reference's
JTS coordinates (EPSG:4326 ⇒ (lat, lon)); axis normalization to (lon,lat)
is a separate step (``kernels/crs.py::to_lonlat``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import defaultdict

import numpy as np

from . import geodesic
from .geometry import TOTAL_ARC_POINTS, extract_coords_from_poslist

GML_NS = "http://www.opengis.net/gml/3.2"

CURVE_KINDS = {"Curve", "LineString", "CompositeCurve", "OrientableCurve"}
SURFACE_KINDS = {"Surface", "Polygon"}
RING_KINDS = {"Ring", "LinearRing"}

#: segment local-name → segment kind (CurveCoordinateListFactory.java:52-62)
SEGMENT_TYPE = {
    "LineStringSegment": "LINE_STRING",
    "GeodesicString": "GEODESIC_STRING",
    "Geodesic": "GEODESIC_STRING",
    "ArcByCenterPoint": "ARC_BY_CENTER",
    "CircleByCenterPoint": "ARC_BY_CENTER",
    "ArcString": "ARC_STRING",
    "Arc": "ARC_STRING",
    "Circle": "ARC_STRING",
}

#: patch local-name set (SurfaceCoordinateListFactory.java:62-68)
PATCH_TYPES = {"PolygonPatch", "Rectangle", "Triangle"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse(xml_text: str) -> ET.Element:
    return ET.fromstring(xml_text)


def _find_child(elem: ET.Element, *local_names: str):
    for c in elem:
        if _local(c.tag) in local_names:
            return c
    return None


def _children(elem: ET.Element, *local_names: str):
    return [c for c in elem if _local(c.tag) in local_names]


def _floats(text: str) -> list[float]:
    # tolerate comma-delimited tuples ("49.1778, -123.2125") — some real
    # GML uses the deprecated gml:coordinates separator inside posList
    return [float(v.rstrip(",")) for v in (text or "").split() if v.rstrip(",")]


def unwrap_property(elem: ET.Element) -> ET.Element:
    """A lone property wrapper (gml:geometryMember & co.) around a single
    geometry is transparent — the reference unmarshals the child."""
    name = _local(elem.tag)
    if (name.endswith("Member") or name.lower().endswith("member")) and len(elem) == 1:
        return next(iter(elem))
    return elem


def _pos_coords(elem: ET.Element) -> np.ndarray:
    """coords from child gml:posList (stride = CRS dim, 2 here) or a
    sequence of gml:pos elements (``GmlUtils.java:250-258``)."""
    pos_list = _find_child(elem, "posList")
    if pos_list is not None:
        return extract_coords_from_poslist(_floats(pos_list.text), 2)
    pts = [_floats(p.text)[:2] for p in _children(elem, "pos")]
    if not pts:
        raise ValueError(f"No posList/pos under <{_local(elem.tag)}>")
    return np.array(pts, dtype=np.float64)


# ---------------------------------------------------------------------------
# srsName resolution
# ---------------------------------------------------------------------------


def find_crs_reference(elem: ET.Element, root: ET.Element) -> str:
    """srsName of elem: self → nearest ancestor → ancestor feature's
    boundedBy/Envelope → child posList/pos.  Mirrors the XPath chain of
    ``GmlUtils.java:299-327`` (and, like the reference, writes the
    resolved value back onto the element)."""
    parents = {c: p for p in root.iter() for c in p}
    chain = [elem]
    while chain[-1] in parents:
        chain.append(parents[chain[-1]])
    for e in chain:  # ancestor-or-self, nearest first
        srs = e.get("srsName", "")
        if srs:
            if e is not elem:
                elem.set("srsName", srs)
            return srs
    for e in chain[1:]:  # ancestor with boundedBy/Envelope
        bb = _find_child(e, "boundedBy")
        if bb is not None:
            env = _find_child(bb, "Envelope")
            if env is not None and env.get("srsName", ""):
                srs = env.get("srsName")
                elem.set("srsName", srs)
                return srs
    child = _find_child(elem, "posList", "pos")
    if child is not None and child.get("srsName", ""):
        srs = child.get("srsName")
        elem.set("srsName", srs)
        return srs
    return ""


def set_srs_name_on_collection_members(root: ET.Element) -> int:
    """Push a Multi* collection's srsName onto members lacking one
    (``GmlUtils.java:153-180``; ISO 19136 cl. 10.1.3.2).  Returns the
    number of members stamped."""
    stamped = 0
    for geom in root.iter():
        name = _local(geom.tag)
        srs = geom.get("srsName", "")
        if not name.startswith("Multi") or not srs:
            continue
        member_name = name[5:].lower()
        for prop in geom:
            pl = _local(prop.tag).lower()
            if pl not in {f"{member_name}member", f"{member_name}members"}:
                continue
            for member in prop:
                if not member.get("srsName", ""):
                    member.set("srsName", srs)
                    stamped += 1
    return stamped


# ---------------------------------------------------------------------------
# Curve flattening
# ---------------------------------------------------------------------------


def min_curve_segment_length(segment_type_name: str) -> int:
    """Minimum direct positions per curve-segment type
    (``GmlUtils.java:267-277``): *ByCenterPoint ⇒ 1; ArcString/Arc/
    Circle ⇒ 3; else 2."""
    if segment_type_name.endswith("ByCenterPoint"):
        return 1
    if segment_type_name in {"ArcString", "Arc", "Circle"}:
        return 3
    return 2


def _is_latlon(srs_name: str) -> bool:
    from . import crs as crs_k

    try:
        return crs_k.is_latlon_order(srs_name)
    except ValueError:
        return False


def _arc_segment_coords(segment: ET.Element, srs_name: str) -> np.ndarray:
    """ArcByCenterPoint/CircleByCenterPoint densified to TOTAL_ARC_POINTS
    (``GmlUtils.java:98-128``); Circle ⇒ 0..360, endAngle 0 ⇒ 360."""
    center = _pos_coords(segment)[0]
    is_circle = _local(segment.tag) == "CircleByCenterPoint"
    if is_circle:
        start_angle, end_angle = 0.0, 360.0
    else:
        sa = _find_child(segment, "startAngle")
        ea = _find_child(segment, "endAngle")
        start_angle = float(sa.text) if sa is not None else 0.0
        end_angle = float(ea.text) if ea is not None else 360.0
    radius_el = _find_child(segment, "radius")
    radius_m = geodesic.length_in_meters(float(radius_el.text), radius_el.get("uom", "m"))
    if _is_latlon(srs_name):
        clat, clon = center[0], center[1]
    else:  # lon,lat-ordered geographic CRS (CRS:84)
        clon, clat = center[0], center[1]
    if end_angle == 0:
        end_angle = 360.0
    angles = np.linspace(start_angle, end_angle, TOTAL_ARC_POINTS)
    lats, lons = geodesic.direct(
        np.full(TOTAL_ARC_POINTS, clat), np.full(TOTAL_ARC_POINTS, clon),
        angles, np.full(TOTAL_ARC_POINTS, radius_m),
    )
    if _is_latlon(srs_name):
        return np.column_stack([lats, lons])
    return np.column_stack([lons, lats])


def _segment_coords(segment: ET.Element, srs_name: str) -> np.ndarray:
    """One curve segment → coords (``CurveSegmentType.java:23-95``)."""
    kind = SEGMENT_TYPE.get(_local(segment.tag))
    if kind is None:
        raise ValueError(f"Unsupported curve segment type: {_local(segment.tag)}")
    if not srs_name:
        raise ValueError("No CRS supplied for curve segment.")
    if kind == "ARC_BY_CENTER":
        return _arc_segment_coords(segment, srs_name)
    # LINE_STRING / GEODESIC_STRING / ARC_STRING: explicit vertices
    return _pos_coords(segment)


def curve_coordinate_list(elem: ET.Element, inherited_srs: str = "",
                          href_resolver=None) -> np.ndarray:
    """Flatten any GML curve/ring geometry to an (n,2) coordinate array —
    the dispatch of ``CurveCoordinateListFactory.createCoordinateList``
    (:64-91) with all member kinds."""
    name = _local(elem.tag)
    srs = elem.get("srsName", "") or inherited_srs
    if name == "LineString":
        return _pos_coords(elem)
    if name == "Curve":
        segs = _find_child(elem, "segments")
        if segs is None:
            raise ValueError("gml:Curve without gml:segments")
        parts = [_segment_coords(s, srs) for s in segs]
        return np.vstack(parts)
    if name == "CompositeCurve":
        # member concat; srsName inherited when the member lacks one;
        # in-line members assumed (href ignored) — :140-151
        parts = []
        for prop in _children(elem, "curveMember"):
            member = next(iter(prop), None)
            if member is None:
                continue
            parts.append(curve_coordinate_list(member, srs, href_resolver))
        return np.vstack(parts)
    if name == "OrientableCurve":
        base = _find_child(elem, "baseCurve")
        member = next(iter(base), None)
        coords = curve_coordinate_list(member, srs, href_resolver)
        if elem.get("orientation", "+") == "-":
            coords = coords[::-1]  # :161-169
        return coords
    if name == "LinearRing":
        return _pos_coords(elem)
    if name == "Ring":
        # structurally a composite curve; members may be remote hrefs
        # resolved through the caller's resolver (:178-218)
        parts = []
        for prop in _children(elem, "curveMember"):
            href = prop.get("{http://www.w3.org/1999/xlink}href") or prop.get("href")
            if href:
                if href_resolver is None:
                    raise ValueError(f"Remote ring member requires a resolver: {href}")
                member = parse(href_resolver(href))
            else:
                member = next(iter(prop), None)
            parts.append(curve_coordinate_list(member, srs, href_resolver))
        return np.vstack(parts)
    raise ValueError(f"Unsupported curve type: {name}")


def local_href_resolver(documents: dict[str, str]):
    """Resolver for remote Ring members (``CurveCoordinateListFactory.
    java:198-218``): the reference dereferences an ``xlink:href`` on a
    ``curveMember`` by loading the target document and extracting the
    referenced element.  This engine keeps the resolution pluggable (no
    network I/O inside a Spark kernel); this factory builds a resolver
    over an in-memory {uri: xml_text} store — the local-fixture mirror of
    the reference's URL fetch, used in tests and by callers that stage
    remote documents beside the data.

    href forms: ``uri`` (whole document is the member element) or
    ``uri#id`` / ``#id`` (element with matching ``gml:id``; a bare
    fragment searches every stored document, the reference's
    same-document case).
    """

    def resolve(href: str) -> str:
        uri, _, frag = href.partition("#")
        if uri:
            if uri not in documents:
                raise ValueError(f"Unresolvable ring member href: {href!r}")
            xml = documents[uri]
            if not frag:
                return xml
            roots = [parse(xml)]
        else:
            roots = [parse(x) for x in documents.values()]
        for root in roots:
            for el in root.iter():
                gid = el.get("{http://www.opengis.net/gml/3.2}id") or el.get("id")
                if gid == frag:
                    return ET.tostring(el, encoding="unicode")
        raise ValueError(f"Unresolvable ring member href: {href!r}")

    return resolve


def validate_curve_segments(elem: ET.Element) -> list[str]:
    """Segment-length validation: every segment must carry at least
    ``min_curve_segment_length`` direct positions.  Returns violation
    messages (empty = valid)."""
    out = []
    for seg_parent in elem.iter():
        if _local(seg_parent.tag) != "segments":
            continue
        for seg in seg_parent:
            name = _local(seg.tag)
            need = min_curve_segment_length(name)
            try:
                got = len(_pos_coords(seg))
            except ValueError:
                got = 0
            if got < need:
                out.append(f"{name}: {got} positions < required {need}")
    return out


# ---------------------------------------------------------------------------
# Surface boundary extraction
# ---------------------------------------------------------------------------


def _ring_edges(ring: np.ndarray):
    """Undirected edge keys of a closed ring (first==last assumed; if not
    closed, the implicit closing edge is added, as JTS polygons do)."""
    pts = [tuple(p) for p in ring]
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return [frozenset((pts[i], pts[i + 1])) for i in range(len(pts) - 1)
            if pts[i] != pts[i + 1]]


def _chain_edges(edges: list[tuple]) -> np.ndarray:
    """Chain undirected edges into a closed ring starting at the
    lexicographically smallest vertex."""
    adj: dict[tuple, list[tuple]] = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    if not adj:
        return np.zeros((0, 2))
    start = min(adj)
    path = [start]
    prev = None
    cur = start
    while True:
        nxts = [n for n in sorted(adj[cur]) if n != prev or adj[cur].count(n) > 1]
        if not nxts:
            break
        nxt = nxts[0]
        path.append(nxt)
        prev, cur = cur, nxt
        if cur == start:
            break
    return np.array(path, dtype=np.float64)


def _close(ring: np.ndarray) -> np.ndarray:
    if tuple(ring[0]) != tuple(ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _rings_overlap(rings: list[np.ndarray]) -> bool:
    """True when any two patch rings touch beyond COMPLETE shared edges:
    a proper edge crossing, a vertex of one strictly inside another, or a
    vertex lying ON the other's boundary without being a vertex OF it
    (the partial-shared-edge signature).  Edge-adjacent patches of a
    valid gml:Surface share whole edges vertex-to-vertex, so they stay on
    the exact odd-edge-count fast path.
    """
    from . import geometry as geom_k

    closed = [_close(r) for r in rings]
    vsets = [{_snap(p) for p in r} for r in closed]
    for i in range(len(closed)):
        for j in range(i + 1, len(closed)):
            a, b = closed[i], closed[j]
            if geom_k.segments_cross_proper_any(a, b):
                return True
            a_in = geom_k.points_in_ring(a[:, 0], a[:, 1], b)
            b_in = geom_k.points_in_ring(b[:, 0], b[:, 1], a)
            a_on = geom_k.points_on_ring(a[:, 0], a[:, 1], b)
            b_on = geom_k.points_on_ring(b[:, 0], b[:, 1], a)
            if (a_in & ~a_on).any() or (b_in & ~b_on).any():
                return True
            for k in np.nonzero(a_on)[0]:
                if _snap(a[k]) not in vsets[j]:
                    return True
            for k in np.nonzero(b_on)[0]:
                if _snap(b[k]) not in vsets[i]:
                    return True
    return False


_SNAP = 1e-9


def _snap(p) -> tuple:
    return (round(float(p[0]) / _SNAP) * _SNAP, round(float(p[1]) / _SNAP) * _SNAP)


def _split_params(a: np.ndarray, b: np.ndarray, others: list[np.ndarray]) -> list[float]:
    """Parameters t ∈ (0,1) where segment a→b meets any edge of the other
    rings — proper crossings, endpoint touches, and collinear-overlap
    endpoints all split the edge."""
    d = b - a
    den_ab = d[0] * d[0] + d[1] * d[1]
    ts: list[float] = []
    for ring in others:
        c, e = ring[:-1], ring[1:]
        f = e - c
        denom = d[0] * f[:, 1] - d[1] * f[:, 0]
        diff = c - a
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (diff[:, 0] * f[:, 1] - diff[:, 1] * f[:, 0]) / denom
            u = (diff[:, 0] * d[1] - diff[:, 1] * d[0]) / denom
        ok = (denom != 0) & (t > 1e-12) & (t < 1 - 1e-12) & (u >= -1e-12) & (u <= 1 + 1e-12)
        ts.extend(t[ok].tolist())
        # collinear overlap: project the other edge's endpoints onto a→b
        if den_ab > 0:
            for q in (c, e):
                tq = ((q[:, 0] - a[0]) * d[0] + (q[:, 1] - a[1]) * d[1]) / den_ab
                cross = (q[:, 0] - a[0]) * d[1] - (q[:, 1] - a[1]) * d[0]
                on = (np.abs(cross) <= 1e-12 * np.sqrt(den_ab)) & (tq > 1e-12) & (tq < 1 - 1e-12)
                ts.extend(tq[on].tolist())
    return ts


def _union_boundary_overlapping(rings: list[np.ndarray]) -> np.ndarray:
    """General polygon union boundary (OVERLAPPING patches): split every
    edge at its intersections with the other rings, drop sub-edges whose
    midpoint lies strictly inside any other patch, cancel coincident
    sub-edge pairs (shared boundaries), chain the rest.  Reproduces the
    JTS ``GeometryCollection.union()`` exterior for simple overlapping
    patches — the case the odd-edge-count fast path cannot handle
    (``SurfaceCoordinateListFactory.java:196-201``; r2 verdict item 4)."""
    from . import geometry as geom_k

    closed = [_close(r) for r in rings]
    count: dict[frozenset, int] = defaultdict(int)
    for i, ring in enumerate(closed):
        others = [closed[j] for j in range(len(closed)) if j != i]
        for k in range(len(ring) - 1):
            a, b = ring[k], ring[k + 1]
            if tuple(a) == tuple(b):
                continue
            ts = sorted(set([0.0, 1.0] + _split_params(a, b, others)))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                p0 = a + t0 * (b - a)
                p1 = a + t1 * (b - a)
                mid = a + 0.5 * (t0 + t1) * (b - a)
                strictly_inside = False
                for o in others:
                    inside = geom_k.points_in_ring(
                        np.array([mid[0]]), np.array([mid[1]]), o
                    )[0]
                    on = geom_k.points_on_ring(
                        np.array([mid[0]]), np.array([mid[1]]), o
                    )[0]
                    if inside and not on:
                        strictly_inside = True
                        break
                if not strictly_inside:
                    count[frozenset((_snap(p0), _snap(p1)))] += 1
    surviving = [tuple(sorted(e)) for e, c in count.items() if c % 2 == 1 and len(e) == 2]
    return _chain_edges(surviving)


def union_boundary(rings: list[np.ndarray]) -> np.ndarray:
    """Exterior boundary of a set of polygon patches — the engine's
    re-expression of the JTS ``GeometryCollection.union()`` the reference
    applies to surface patches (``SurfaceCoordinateListFactory.java:
    177-201``).

    Edge-adjacent patches (the valid-gml:Surface case — patches meet
    along complete shared edges): the union boundary is exactly the set
    of edges used an odd number of times, chained into a closed ring
    starting at the lexicographically smallest vertex.  OVERLAPPING
    patches (legal GML, handled by JTS union) are detected and routed to
    the general edge-splitting union.  A single patch passes through
    unchanged (JTS union of one polygon is itself)."""
    if len(rings) == 1:
        return _close(rings[0])
    if _rings_overlap(rings):
        return _union_boundary_overlapping(rings)
    count: dict[frozenset, int] = defaultdict(int)
    for ring in rings:
        for e in _ring_edges(ring):
            count[e] += 1
    surviving = [tuple(sorted(e)) for e, c in count.items() if c % 2 == 1 and len(e) == 2]
    return _chain_edges(surviving)


def _patch_rings(patch: ET.Element, srs: str, href_resolver=None):
    """(exterior_coords, [interior_coords…]) of one surface patch."""
    ext_prop = _find_child(patch, "exterior")
    ext_ring = next(iter(ext_prop), None)
    if not ext_ring.get("srsName", ""):
        ext_ring.set("srsName", srs)  # SurfaceCoordinateListFactory.java:189-191
    ext = curve_coordinate_list(ext_ring, srs, href_resolver)
    ints = []
    for int_prop in _children(patch, "interior"):
        ring = next(iter(int_prop), None)
        if not ring.get("srsName", ""):
            ring.set("srsName", srs)
        ints.append(curve_coordinate_list(ring, srs, href_resolver))
    return ext, ints


def surface_exterior_boundary(elem: ET.Element, inherited_srs: str = "",
                              href_resolver=None) -> np.ndarray:
    """Exterior boundary coords of gml:Surface (patches merged) or
    gml:Polygon — ``SurfaceCoordinateListFactory.createCoordinateList``
    (:70-114, :177-214).  Works for extension elements substituting for
    gml:Surface (e.g. aixm:Surface) exactly like the DOM variant."""
    name = _local(elem.tag)
    srs = elem.get("srsName", "") or inherited_srs
    if name == "Polygon" or (_find_child(elem, "patches") is None
                             and _find_child(elem, "exterior") is not None):
        ext_prop = _find_child(elem, "exterior")
        ring = next(iter(ext_prop), None)
        if not ring.get("srsName", ""):
            ring.set("srsName", srs)
        return curve_coordinate_list(ring, srs, href_resolver)
    patches_el = _find_child(elem, "patches")
    if patches_el is None:
        raise ValueError(f"Unsupported surface type: {name}")
    rings = []
    for patch in patches_el:
        if _local(patch.tag) not in PATCH_TYPES:
            raise ValueError(f"Unsupported surface patch type: {_local(patch.tag)}")
        ext, _ = _patch_rings(patch, srs, href_resolver)
        rings.append(ext)
    return union_boundary(rings)


def surface_interior_boundaries(elem: ET.Element, inherited_srs: str = "",
                                href_resolver=None) -> list[np.ndarray]:
    """Interior boundary coord lists (``SurfaceCoordinateListFactory.java:
    123-167, :222-263``) — one entry per distinct interior ring."""
    name = _local(elem.tag)
    srs = elem.get("srsName", "") or inherited_srs
    out = []
    if name == "Polygon" or (_find_child(elem, "patches") is None):
        for int_prop in _children(elem, "interior"):
            ring = next(iter(int_prop), None)
            if not ring.get("srsName", ""):
                ring.set("srsName", srs)
            out.append(curve_coordinate_list(ring, srs, href_resolver))
        return out
    for patch in _find_child(elem, "patches"):
        _, ints = _patch_rings(patch, srs, href_resolver)
        out.extend(ints)
    return out


# ---------------------------------------------------------------------------
# Geometry → coordinate list (type dispatch; GeometryCoordinateList.java)
# ---------------------------------------------------------------------------


def geometry_coordinate_list(elem: ET.Element, inherited_srs: str = "",
                             href_resolver=None) -> np.ndarray:
    """Point/Curve/Surface dispatch (``GeometryCoordinateList.java:25-42``,
    ``GeometryType.java:8-34``); Multi\\*/Collection members are processed
    per member and concatenated — the reference's callers loop collection
    members the same way (``Extents.java:86-117``) after the srsName
    push-down."""
    name = _local(elem.tag)
    srs = elem.get("srsName", "") or inherited_srs
    if name == "Point":
        return _pos_coords(elem)
    if name in CURVE_KINDS or name in RING_KINDS:
        return curve_coordinate_list(elem, srs, href_resolver)
    if name.startswith("Multi") or name == "GeometryCollection":
        parts = []
        for prop in elem:
            pl = _local(prop.tag).lower()
            if not (pl.endswith("member") or pl.endswith("members")):
                continue
            for member in prop:
                parts.append(geometry_coordinate_list(member, srs, href_resolver))
        if not parts:
            raise ValueError(f"Empty geometry collection: {name}")
        return np.vstack(parts)
    # everything else with patches/exterior is a surface (incl. aixm:Surface)
    return surface_exterior_boundary(elem, srs, href_resolver)


# ---------------------------------------------------------------------------
# Envelope text parsing — Extents.java:285-326
# ---------------------------------------------------------------------------


def create_envelope(xml_text: str) -> dict:
    """Parse ows:BoundingBox / ows:WGS84BoundingBox / gml:Envelope into a
    typed envelope: {"crs", "lower": (a,b), "upper": (a,b)} with
    ordinates in the CRS's native axis order.  Empty CRS reference (or
    explicit CRS84 URN) ⇒ default geographic lon,lat (CRS:84)."""
    from . import crs as crs_k

    elem = parse(xml_text)
    ns = elem.tag.rsplit("}", 1)[0].lstrip("{") if "}" in elem.tag else ""
    crs_ref = elem.get("crs", "") or elem.get("srsName", "")
    if not crs_ref or crs_ref == "urn:ogc:def:crs:OGC:1.3:CRS84":
        crs_id = "CRS:84"
    else:
        crs_id = crs_k.abbreviated_crs_id(crs_ref)
    lower_name = "lowerCorner" if ns == GML_NS else "LowerCorner"
    upper_name = "upperCorner" if ns == GML_NS else "UpperCorner"
    lower = _floats(_find_child(elem, lower_name).text)
    upper = _floats(_find_child(elem, upper_name).text)
    return {"crs": crs_id, "lower": tuple(lower), "upper": tuple(upper)}


# ---------------------------------------------------------------------------
# Temporal primitive parsing — GmlUtils.java:466-506
# ---------------------------------------------------------------------------


def gml_to_temporal(xml_text: str) -> dict:
    """gml:TimeInstant → {"kind": "instant", "begin": iso} ;
    gml:TimePeriod → {"kind": "period", "begin": iso, "end": iso}.
    ISO-8601 frames only; date-only values rejected ("Not an ISO
    instant"), like the reference."""
    from datetime import datetime

    def parse_iso(text: str) -> str:
        t = text.strip()
        try:
            dt = datetime.fromisoformat(t.replace("Z", "+00:00"))
        except ValueError as exc:
            raise ValueError(f"Not an ISO instant: {text}") from exc
        if dt.tzinfo is None or "T" not in t:
            raise ValueError(f"Not an ISO instant: {text}")
        return dt.isoformat()

    elem = parse(xml_text)
    name = _local(elem.tag)
    frame = elem.get("frame", "")
    if name == "TimeInstant":
        pos = _find_child(elem, "timePosition")
        frame = pos.get("frame", "") or frame
        if frame and "8601" not in frame:
            raise ValueError(f"Unsupported temporal reference frame: {frame}")
        return {"kind": "instant", "begin": parse_iso(pos.text)}
    if name == "TimePeriod":
        begin = _find_child(elem, "beginPosition")
        end = _find_child(elem, "endPosition")
        return {
            "kind": "period",
            "begin": parse_iso(begin.text),
            "end": parse_iso(end.text),
        }
    raise ValueError(f"Not a temporal primitive: {name}")
