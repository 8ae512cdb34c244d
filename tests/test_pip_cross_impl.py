"""Cross-implementation consistency: the JVM Column crossing-number test
(functions.point_in_polygon_col) must agree bit-for-bit with the numpy
kernel (kernels.geometry.points_in_polygon) — the spatial join mixes both
(kernel classifies zone cells, Column refines candidates), so any
divergence silently corrupts join row sets."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark.functions import (
    envelope_intersects_polygon_col,
    point_in_polygon_col,
)
from geomatics_geotk_spark.kernels import geometry as geom_k


def _random_polygon(rng, n_verts, with_hole):
    """Random star-shaped polygon (angle-sorted radii) + optional hole."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    radii = rng.uniform(0.3, 1.0, n_verts)
    xs, ys = radii * np.cos(angles), radii * np.sin(angles)
    ext = np.column_stack([xs, ys])
    ext = np.vstack([ext, ext[:1]])
    rings = [ext]
    if with_hole:
        hr = rng.uniform(0.05, 0.15)
        ha = np.sort(rng.uniform(0, 2 * np.pi, 5))
        hole = np.column_stack([hr * np.cos(ha), hr * np.sin(ha)])
        rings.append(np.vstack([hole, hole[:1]]))
    return rings


@pytest.mark.parametrize("with_hole", [False, True])
def test_column_pip_equals_kernel(spark, with_hole):
    rng = np.random.default_rng(7 if with_hole else 5)
    cases = []
    for case in range(20):
        rings = _random_polygon(rng, int(rng.integers(4, 12)), with_hole)
        px = rng.uniform(-1.2, 1.2, 50)
        py = rng.uniform(-1.2, 1.2, 50)
        expected = geom_k.points_in_polygon(px, py, rings)
        ext = [(float(x), float(y)) for x, y in rings[0]]
        ints = [[(float(x), float(y)) for x, y in r] for r in rings[1:]]
        for x, y, e in zip(px, py, expected):
            cases.append((case, float(x), float(y), ext, ints, bool(e)))
    df = spark.createDataFrame(
        cases,
        "case int, lon double, lat double, "
        "exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>, expected boolean",
    )
    got = df.withColumn(
        "got",
        point_in_polygon_col(
            F.col("lon"), F.col("lat"), F.col("exterior"), F.col("interiors")
        ),
    )
    bad = got.where(F.col("got") != F.col("expected")).count()
    assert bad == 0


def test_column_envelope_refine_equals_kernel(spark):
    rng = np.random.default_rng(11)
    cases = []
    for case in range(30):
        rings = _random_polygon(rng, int(rng.integers(4, 10)), False)
        for _ in range(10):
            x0, y0 = rng.uniform(-1.5, 1.2, 2)
            w, h = rng.uniform(0.05, 0.8, 2)
            env = geom_k.envelope_as_polygon(x0, y0, x0 + w, y0 + h)
            expected = geom_k.polygons_intersect([env], rings)
            ext = [(float(x), float(y)) for x, y in rings[0]]
            cases.append(
                (case, float(x0), float(y0), float(x0 + w), float(y0 + h),
                 ext, [], bool(expected))
            )
    df = spark.createDataFrame(
        cases,
        "case int, xmin double, ymin double, xmax double, ymax double, "
        "exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>, expected boolean",
    )
    got = df.withColumn(
        "got",
        envelope_intersects_polygon_col(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("exterior"), F.col("interiors"),
        ),
    )
    bad = got.where(F.col("got") != F.col("expected")).count()
    assert bad == 0
