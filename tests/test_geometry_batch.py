"""Batch DE-9IM kernels must equal the per-pair kernels exactly.

The per-pair kernels (kernels/geometry.py) are the semantic source of
truth (they mirror TopologicalRelationships.java:57-96); the batch module
(kernels/geometry_batch.py) re-expresses them as concatenated-array math
for the spatial-join refine.  These tests sweep randomized lines /
polygons / points against randomized zone polygons (with holes) and
assert bit-identical predicate vectors.
"""

from __future__ import annotations

import numpy as np
import pytest

from geomatics_geotk_spark.kernels import geometry as geom_k
from geomatics_geotk_spark.kernels import geometry_batch as gb

RNG = np.random.default_rng(20260817)

PREDICATES = ["intersects", "within", "contains", "crosses", "overlaps", "equals_topo"]


def _rand_zone(rng, with_hole: bool):
    """Random rectangle-ish zone, optionally with a centered hole."""
    cx, cy = rng.uniform(-2, 2, 2)
    w, h = rng.uniform(0.5, 2.0, 2)
    ext = np.array([
        [cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h],
        [cx - w, cy + h], [cx - w, cy - h],
    ])
    rings = [ext]
    if with_hole:
        hw, hh = w * 0.3, h * 0.3
        rings.append(np.array([
            [cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh],
            [cx - hw, cy + hh], [cx - hw, cy - hh],
        ]))
    return rings


def _rand_line(rng):
    n = rng.integers(2, 6)
    start = rng.uniform(-3, 3, 2)
    steps = rng.uniform(-1.2, 1.2, (n - 1, 2))
    return [np.vstack([start, start + np.cumsum(steps, axis=0)])]


def _rand_poly(rng, maybe_equal_zone=None):
    if maybe_equal_zone is not None and rng.random() < 0.15:
        # plant exact-equal (possibly rotated/reversed) copies to exercise
        # equals_topo's normalization
        ext = maybe_equal_zone[0][:-1]
        k = rng.integers(0, len(ext))
        ext = np.roll(ext, k, axis=0)
        if rng.random() < 0.5:
            ext = ext[::-1]
        return [np.vstack([ext, ext[:1]])] + [r.copy() for r in maybe_equal_zone[1:]]
    cx, cy = rng.uniform(-3, 3, 2)
    w, h = rng.uniform(0.2, 1.8, 2)
    return [np.array([
        [cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h],
        [cx - w, cy + h], [cx - w, cy - h],
    ])]


def _rand_point(rng):
    return [rng.uniform(-3, 3, (1, 2))]


@pytest.mark.parametrize("predicate", PREDICATES)
@pytest.mark.parametrize("kind", ["point", "linestring", "polygon"])
def test_batch_equals_perpair(predicate, kind):
    rng = np.random.default_rng(abs(hash((predicate, kind))) % (2**32))
    for trial in range(30):
        zone = _rand_zone(rng, with_hole=bool(trial % 3 == 0))
        n = int(rng.integers(1, 12))
        if kind == "point":
            geoms = [_rand_point(rng) for _ in range(n)]
        elif kind == "linestring":
            geoms = [_rand_line(rng) for _ in range(n)]
        else:
            geoms = [_rand_poly(rng, maybe_equal_zone=zone) for _ in range(n)]
        expect = np.array(
            [
                bool(getattr(geom_k, predicate)(kind, g, "polygon", zone))
                for g in geoms
            ],
            dtype=bool,
        )
        got = gb.batch_predicate(predicate, kind, geoms, zone)
        assert got.dtype == bool and len(got) == n
        np.testing.assert_array_equal(
            got, expect,
            err_msg=f"{predicate}/{kind} trial {trial}: batch != per-pair",
        )


def test_batch_empty_group():
    zone = _rand_zone(np.random.default_rng(0), with_hole=False)
    out = gb.batch_predicate("intersects", "linestring", [], zone)
    assert out.shape == (0,)


def test_batch_single_vertex_line_mixed():
    """A degenerate 1-point 'line' among normal ones (empty segment group)
    must not shift neighbouring docs' reductions."""
    rng = np.random.default_rng(7)
    zone = _rand_zone(rng, with_hole=False)
    geoms = [_rand_line(rng), [np.array([[0.0, 0.0]])], _rand_line(rng)]
    expect = np.array(
        [bool(geom_k.intersects("linestring", g, "polygon", zone)) for g in geoms]
    )
    got = gb.batch_predicate("intersects", "linestring", geoms, zone)
    np.testing.assert_array_equal(got, expect)
