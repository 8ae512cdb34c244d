"""Batch DE-9IM kernels: MANY document geometries vs ONE zone polygon.

The per-pair kernels in :mod:`kernels.geometry` reproduce the reference's
JTS predicate calls (``TopologicalRelationships.java:57-96``) one pair at
a time.  Inside a spatial-join refine batch, thousands of candidate pairs
share the same zone, so this module evaluates a whole same-kind group of
document geometries against the zone polygon with concatenated coordinate
arrays and ``reduceat`` segment reductions — no Python loop over pairs.

Semantics contract: for every predicate and every input, the batch result
equals running the per-pair kernel in a loop (property-tested in
``tests/test_geometry_batch.py`` against randomized geometries).  The
per-pair kernels stay the single source of truth for semantics; anything
this module does not cover (multi* parts, ``touches``) falls back to them
in the caller.

Layout: a group is a list of ``parts`` (same simple kind).  Coordinates
concatenate into flat (V,2)/(S,2) arrays with ``np.logical_*.reduceat``
offsets per document — vectorized over V vertices / S segments × the
zone's E edges, looping only over the zone's few rings.
"""

from __future__ import annotations

import numpy as np

from . import geometry as geom_k

# predicates with a batch implementation for simple (non-multi) kinds
BATCHABLE = {"intersects", "within", "contains", "crosses", "overlaps", "equals_topo"}


# ---------------------------------------------------------------------------
# concatenation helpers
# ---------------------------------------------------------------------------


def _concat_rings(list_of_ring_lists):
    """Concatenate every ring of every doc.

    Returns (coords (V,2), ring_offsets, ring_is_hole, doc_ring_offsets)
    where ring_offsets index ring starts in coords, ring_is_hole marks
    rings past index 0 of each doc, doc_ring_offsets index each doc's
    first ring in the ring arrays.
    """
    coords, ring_off, is_hole, doc_off = [], [], [], []
    v = 0
    r = 0
    for rings in list_of_ring_lists:
        doc_off.append(r)
        for j, ring in enumerate(rings):
            ring_off.append(v)
            is_hole.append(j > 0)
            coords.append(np.asarray(ring, dtype=np.float64))
            v += len(ring)
            r += 1
    return (
        np.vstack(coords) if coords else np.zeros((0, 2)),
        np.array(ring_off, dtype=np.int64),
        np.array(is_hole, dtype=bool),
        np.array(doc_off, dtype=np.int64),
    )


def _concat_verts(arrs):
    """[(n_i,2)] → (coords (V,2), offsets (D,)) for per-doc reduceat."""
    offsets = np.zeros(len(arrs), dtype=np.int64)
    v = 0
    for i, a in enumerate(arrs):
        offsets[i] = v
        v += len(a)
    return (np.vstack(arrs) if arrs else np.zeros((0, 2))), offsets


def _reduce_any(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    if len(mask) == 0:
        return np.zeros(len(offsets), dtype=bool)
    return _reduceat_safe(np.logical_or, np.asarray(mask, dtype=bool), offsets, False)


def _reduce_all(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    if len(mask) == 0:
        return np.ones(len(offsets), dtype=bool)
    return _reduceat_safe(np.logical_and, np.asarray(mask, dtype=bool), offsets, True)


def _segments_of(arrs):
    """[(n_i,2) polylines/rings] → (a1 (S,2), a2 (S,2), seg_offsets (D,)).

    Documents contribute ``n_i - 1`` consecutive segments each; a doc may
    contribute 0 segments (single vertex), which reduceat handles via
    repeated offsets (empty slice → identity element).
    """
    a1, a2 = [], []
    offsets = np.zeros(len(arrs), dtype=np.int64)
    s = 0
    for i, a in enumerate(arrs):
        offsets[i] = s
        if len(a) > 1:
            a1.append(a[:-1])
            a2.append(a[1:])
            s += len(a) - 1
    return (
        np.vstack(a1) if a1 else np.zeros((0, 2)),
        np.vstack(a2) if a2 else np.zeros((0, 2)),
        offsets,
    )


def _reduceat_safe(op, mask, offsets, identity):
    """reduceat tolerating empty slices (repeated offsets) and a trailing
    empty group — np.ufunc.reduceat yields mask[offset] for offset pairs
    with offset_i == offset_{i+1} ONLY when offset_i < len(mask); guard by
    appending a sentinel identity element."""
    if len(offsets) == 0:
        return np.zeros(0, dtype=bool)
    ext = np.concatenate([mask, np.array([identity], dtype=mask.dtype)])
    out = op.reduceat(ext, offsets)
    # repeated offsets (empty groups) produce ext[offset], which for an
    # empty group must be the identity, not the first element of the NEXT
    # group — patch them explicitly
    sizes = np.diff(np.concatenate([offsets, [len(mask)]]))
    out[sizes == 0] = identity
    return out


# ---------------------------------------------------------------------------
# core vectorized tests
# ---------------------------------------------------------------------------


def _verts_in_zone(coords: np.ndarray, zone_rings) -> np.ndarray:
    """Strict even-odd inside test (holes honored) for all V vertices —
    same kernel the per-pair path uses (points_in_polygon)."""
    if len(coords) == 0:
        return np.zeros(0, dtype=bool)
    return geom_k.points_in_polygon(coords[:, 0], coords[:, 1], zone_rings)


def _verts_on_zone(coords: np.ndarray, zone_rings) -> np.ndarray:
    """On-boundary test for all V vertices vs every zone ring."""
    on = np.zeros(len(coords), dtype=bool)
    for r in zone_rings:
        on |= geom_k.points_on_ring(coords[:, 0], coords[:, 1], r)
    return on


def _segs_hit_zone(a1: np.ndarray, a2: np.ndarray, zone_rings) -> np.ndarray:
    """Per doc-segment: does it intersect (proper or touch) any zone ring
    segment?  Vectorized (S × E) orientation tests per ring — the batch
    twin of :func:`geometry.segments_intersect_any`."""
    S = len(a1)
    hit = np.zeros(S, dtype=bool)
    if S == 0:
        return hit
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    ax2, ay2 = a2[:, 0][:, None], a2[:, 1][:, None]
    for r in zone_rings:
        if len(r) < 2:
            continue
        b1, b2 = r[:-1], r[1:]
        bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
        bx2, by2 = b2[:, 0][None, :], b2[:, 1][None, :]
        d1 = geom_k._orient(ax1, ay1, ax2, ay2, bx1, by1)
        d2 = geom_k._orient(ax1, ay1, ax2, ay2, bx2, by2)
        d3 = geom_k._orient(bx1, by1, bx2, by2, ax1, ay1)
        d4 = geom_k._orient(bx1, by1, bx2, by2, ax2, ay2)
        proper = ((d1 * d2) < 0) & ((d3 * d4) < 0)

        def on_seg(px, py, qx, qy, rx, ry):
            return (
                (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
                & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
            )

        touch = (
            ((d1 == 0) & on_seg(ax1, ay1, ax2, ay2, bx1, by1))
            | ((d2 == 0) & on_seg(ax1, ay1, ax2, ay2, bx2, by2))
            | ((d3 == 0) & on_seg(bx1, by1, bx2, by2, ax1, ay1))
            | ((d4 == 0) & on_seg(bx1, by1, bx2, by2, ax2, ay2))
        )
        hit |= (proper | touch).any(axis=1)
    return hit


def _segs_cross_proper_zone(a1: np.ndarray, a2: np.ndarray, zone_rings) -> np.ndarray:
    """Per doc-segment: PROPER crossing (both orientation products
    strictly negative) vs any zone ring segment — batch twin of
    :func:`geometry.segments_cross_proper_any`."""
    S = len(a1)
    hit = np.zeros(S, dtype=bool)
    if S == 0:
        return hit
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    ax2, ay2 = a2[:, 0][:, None], a2[:, 1][:, None]
    for r in zone_rings:
        if len(r) < 2:
            continue
        b1, b2 = r[:-1], r[1:]
        bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
        bx2, by2 = b2[:, 0][None, :], b2[:, 1][None, :]
        d1 = geom_k._orient(ax1, ay1, ax2, ay2, bx1, by1)
        d2 = geom_k._orient(ax1, ay1, ax2, ay2, bx2, by2)
        d3 = geom_k._orient(bx1, by1, bx2, by2, ax1, ay1)
        d4 = geom_k._orient(bx1, by1, bx2, by2, ax2, ay2)
        hit |= (((d1 * d2) < 0) & ((d3 * d4) < 0)).any(axis=1)
    return hit


def _zone_verts_in_docs(zone_ext: np.ndarray, doc_rings):
    """(any_in (D,), all_in (D,)): zone EXTERIOR vertices strictly inside
    each doc polygon (even-odd with the doc's holes) — the ``rings_b[0]
    in a`` branch of :func:`geometry.polygons_intersect`, fully
    vectorized: per zone vertex, one crossing-parity pass over ALL docs'
    edges at once.
    """
    coords, ring_off, is_hole, doc_off = _concat_rings(doc_rings)
    n_rings = len(ring_off)
    D = len(doc_rings)
    if len(coords) == 0 or len(zone_ext) == 0:
        return np.zeros(D, dtype=bool), np.zeros(D, dtype=bool)
    # ring edges: within each ring, edge i connects vertex i to vertex
    # i-1 (wrapping) — same traversal as points_in_ring
    V = len(coords)
    ring_of_vertex = np.repeat(
        np.arange(n_rings), np.diff(np.concatenate([ring_off, [V]]))
    )
    prev = np.arange(V) - 1
    starts = ring_off
    ends = np.concatenate([ring_off[1:], [V]]) - 1
    prev[starts] = ends  # wrap: first vertex pairs with last
    xi, yi = coords[:, 0], coords[:, 1]
    xj, yj = coords[prev, 0], coords[prev, 1]

    any_in = np.zeros(D, dtype=bool)
    all_in = np.ones(D, dtype=bool)
    for t in range(len(zone_ext)):
        px, py = zone_ext[t, 0], zone_ext[t, 1]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (py - yi) / (yj - yi) + xi
        contrib = cond & (px < xcross)
        parity = _reduceat_safe(np.logical_xor, contrib, ring_off, False)
        ext_parity = parity[doc_off]
        hole_any = _reduceat_safe(np.logical_or, parity & is_hole, doc_off, False)
        inside = ext_parity & ~hole_any
        any_in |= inside
        all_in &= inside
    return any_in, all_in


# ---------------------------------------------------------------------------
# batch predicates
# ---------------------------------------------------------------------------


def _doc_arrays(kind: str, geoms):
    """Per-kind coordinate decomposition.

    point/linestring: verts = the single coordinate array; segments from
    it.  polygon: ext_verts = exterior ring only (what polygons_intersect
    / within test), segments from ALL rings.
    """
    if kind == "polygon":
        verts = [g[0] for g in geoms]
        seg_arrs = []
        seg_doc_sizes = []
        for g in geoms:
            n = sum(max(len(r) - 1, 0) for r in g)
            seg_doc_sizes.append(n)
            seg_arrs.extend(g)
        # build per-doc segment offsets over the flattened ring list
        a1_list, a2_list = [], []
        for r in seg_arrs:
            if len(r) > 1:
                a1_list.append(r[:-1])
                a2_list.append(r[1:])
        a1 = np.vstack(a1_list) if a1_list else np.zeros((0, 2))
        a2 = np.vstack(a2_list) if a2_list else np.zeros((0, 2))
        seg_off = np.zeros(len(geoms), dtype=np.int64)
        s = 0
        for i, n in enumerate(seg_doc_sizes):
            seg_off[i] = s
            s += n
    else:
        verts = [g[0] for g in geoms]
        a1, a2, seg_off = _segments_of(verts)
    vcoords, voff = _concat_verts(verts)
    return vcoords, voff, a1, a2, seg_off


def batch_predicate(predicate: str, kind: str, geoms, zone_rings) -> np.ndarray:
    """Evaluate ``predicate(kind, parts_i, 'polygon', zone_rings)`` for a
    list of same-kind simple geometries — identical result to looping the
    per-pair kernels (the property tests enforce this)."""
    D = len(geoms)
    if D == 0:
        return np.zeros(0, dtype=bool)
    if predicate == "equals_topo":
        # per-doc normalized comparison (O(V) byte compares; no
        # coordinate math to vectorize)
        return np.array(
            [geom_k.equals_topo(kind, g, "polygon", zone_rings) for g in geoms],
            dtype=bool,
        )

    vcoords, voff, a1, a2, seg_off = _doc_arrays(kind, geoms)
    v_in = _verts_in_zone(vcoords, zone_rings)
    any_in = _reduce_any(v_in, voff)
    all_in = _reduce_all(v_in, voff)

    if predicate == "crosses":
        if kind == "linestring":
            # geometry.crosses line×polygon: inside-evidence (vertex
            # strictly in OR proper boundary crossing) AND
            # outside-evidence (vertex strictly outside closure OR proper
            # crossing) — the batch twin of the upgraded per-pair rule
            v_on = _verts_on_zone(vcoords, zone_rings)
            proper = _reduce_any(_segs_cross_proper_zone(a1, a2, zone_rings), seg_off)
            ins = any_in | proper
            outs = _reduce_any(~v_in & ~v_on, voff) | proper
            return ins & outs
        return np.zeros(D, dtype=bool)  # point/polygon → False (per-pair rule)

    if predicate in ("intersects", "overlaps", "within", "contains"):
        seg_hit = _reduce_any(_segs_hit_zone(a1, a2, zone_rings), seg_off)

    if predicate == "intersects":
        if kind == "point":
            v_on = _verts_on_zone(vcoords, zone_rings)
            return any_in | _reduce_any(v_on, voff)
        if kind == "linestring":
            return any_in | seg_hit
        # polygon×polygon: envelope gate, then verts-in either way or edges
        env_z = geom_k.envelope_of(zone_rings)
        env_ok = np.array(
            [geom_k.envelopes_intersect(geom_k.envelope_of(g), env_z) for g in geoms]
        )
        z_any_in, _ = _zone_verts_in_docs(zone_rings[0], geoms)
        return env_ok & (any_in | z_any_in | seg_hit)

    if predicate == "within":
        if kind == "point":
            return all_in
        if kind == "linestring":
            v_on = _verts_on_zone(vcoords, zone_rings)
            all_in_or_on = _reduce_all(v_in | v_on, voff)
            return all_in_or_on & ((any_in & ~seg_hit) | all_in)
        return all_in & ~seg_hit  # polygon: exterior verts all strictly in

    if predicate == "contains":
        # zone within doc — only a polygon doc can contain a polygon zone
        if kind != "polygon":
            return np.zeros(D, dtype=bool)
        _, z_all_in = _zone_verts_in_docs(zone_rings[0], geoms)
        return z_all_in & ~seg_hit

    if predicate == "overlaps":
        if kind != "polygon":
            return np.zeros(D, dtype=bool)  # dim mismatch vs polygon zone
        z_any_in, z_all_in = _zone_verts_in_docs(zone_rings[0], geoms)
        env_z = geom_k.envelope_of(zone_rings)
        env_ok = np.array(
            [geom_k.envelopes_intersect(geom_k.envelope_of(g), env_z) for g in geoms]
        )
        inter = env_ok & (any_in | z_any_in | seg_hit)
        within_doc_zone = all_in & ~seg_hit
        within_zone_doc = z_all_in & ~seg_hit
        return inter & ~within_doc_zone & ~within_zone_doc & (
            any_in | z_any_in | seg_hit
        )

    raise ValueError(f"no batch path for predicate {predicate!r}")
