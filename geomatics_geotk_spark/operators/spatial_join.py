"""Point-in-polygon / spatial-predicate joins: filter-and-refine over the
cell grid.

The reference evaluates predicates one pair at a time
(``TopologicalRelationships.java:57-96``: unmarshal → CRS-harmonize → JTS
DE-9IM).  At 10^12 documents that is an O(N·M) loop; this module lifts it
into the classic spatial hash join:

1. **decode** (scan-side, JVM regexp — no Python): extract the single
   ``kind='geo'`` span's WKT POINT into lon/lat sibling columns, leaving
   the ``spans`` array untouched (span-sequence invariant);
2. **cell-encode** both sides (JVM bit math, :func:`functions.cell_id_col`);
   zones explode into their covering cells, each flagged ``full`` (cell
   entirely inside the polygon — refine skipped) or ``partial``;
3. **equi-join on cell_id** — broadcast for small zone sets, shuffle with
   explicit hot-cell salting for large/skewed ones (AQE skew-split stays
   on as belt-and-suspenders);
4. **refine** only the partial-cell candidates with the vectorized
   crossing-number kernel (Arrow batch → numpy), reproducing the
   reference's exact predicate semantics.

CRS harmonization (reference ``setCRS``, ``TopologicalRelationships.java:
261-271``) happens once on the zone side at prepare time — zones are the
small side, so the transform cost is O(M), not O(N).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import cells
from ..functions import cell_id_col, point_in_polygon_col, wkt_point_lat, wkt_point_lon
from ..kernels import crs as crs_k
from ..kernels import geometry as geom_k

DEFAULT_RES = 12


def decode_geo_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Extract lon/lat from the single ``kind='geo'`` span (WKT POINT).

    Pure Column expressions (filter + regexp in JVM); ``spans`` is carried
    opaquely — never exploded — so per-doc span sequence is preserved.
    """
    geo_text = F.element_at(
        F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("geo")), 1
    )["text"]
    return docs.withColumn("lon", wkt_point_lon(geo_text)).withColumn(
        "lat", wkt_point_lat(geo_text)
    )


def tile_assign(docs: DataFrame, res: int = DEFAULT_RES,
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Append the Z-order ``cell_id`` (the engine's tile assignment) —
    whole-stage-codegen'd JVM bit math."""
    return docs.withColumn("cell_id", cell_id_col(F.col(lon_col), F.col(lat_col), res))


# ---------------------------------------------------------------------------
# Zone preparation (driver-side over the SMALL side; O(M) work)
# ---------------------------------------------------------------------------


def _zone_rings_lonlat(row) -> list[np.ndarray]:
    """zones-table row → [exterior, *interiors] as (n,2) lon/lat arrays,
    CRS-harmonized (reference setCRS semantics) and axis-normalized."""
    rings = [np.array([[p["x"], p["y"]] for p in row["exterior"]], dtype=np.float64)]
    for hole in row["interiors"] or []:
        rings.append(np.array([[p["x"], p["y"]] for p in hole], dtype=np.float64))
    out = []
    for r in rings:
        lon, lat = crs_k.to_lonlat(r[:, 0], r[:, 1], row["crs"])
        out.append(np.column_stack([lon, lat]))
    return out


def _segs_hit_boxes(rings: list[np.ndarray], x0, y0, x1, y1) -> np.ndarray:
    """(n_cells,) bool: does any ring segment intersect each axis box?

    Vectorized slab clipping over (segments × cells); a segment wholly
    inside a box counts as a hit (strictly more conservative than the
    ring-edge test — such cells classify partial and the exact refine
    decides, so join row sets are unchanged).
    """
    hit = np.zeros(x0.shape, dtype=bool)
    for r in rings:
        ax, ay = r[:-1, 0][:, None], r[:-1, 1][:, None]
        bx, by = r[1:, 0][:, None], r[1:, 1][:, None]
        dx, dy = bx - ax, by - ay
        with np.errstate(divide="ignore", invalid="ignore"):
            tx0 = (x0[None, :] - ax) / dx
            tx1 = (x1[None, :] - ax) / dx
            ty0 = (y0[None, :] - ay) / dy
            ty1 = (y1[None, :] - ay) / dy
        txmin = np.minimum(tx0, tx1)
        txmax = np.maximum(tx0, tx1)
        tymin = np.minimum(ty0, ty1)
        tymax = np.maximum(ty0, ty1)
        # degenerate axes: inside-slab ⇒ (-inf, inf), outside ⇒ empty
        deg_x = dx == 0
        in_x = (ax >= x0[None, :]) & (ax <= x1[None, :])
        txmin = np.where(deg_x, np.where(in_x, -np.inf, np.inf), txmin)
        txmax = np.where(deg_x, np.where(in_x, np.inf, -np.inf), txmax)
        deg_y = dy == 0
        in_y = (ay >= y0[None, :]) & (ay <= y1[None, :])
        tymin = np.where(deg_y, np.where(in_y, -np.inf, np.inf), tymin)
        tymax = np.where(deg_y, np.where(in_y, np.inf, -np.inf), tymax)
        tmin = np.maximum(np.maximum(txmin, tymin), 0.0)
        tmax = np.minimum(np.minimum(txmax, tymax), 1.0)
        hit |= (tmin <= tmax).any(axis=0)
    return hit


def _classify_zone_cells(rings: list[np.ndarray], res: int, margin_m: float = 0.0):
    """Covering cells of a polygon with full/partial classification —
    vectorized numpy over (cells × ring segments).  Returns
    (kept_cell_ids, full_mask) arrays.

    With ``margin_m`` > 0 the covering box expands by the distance margin
    (conservative meridian/parallel degrees) and EVERY cell in the
    expanded box is kept — the DWithin candidate disk, where cells not
    touching the polygon are still within reach of it.  full = cell
    entirely inside the polygon (distance 0; refine skipped).
    """
    xmin, ymin, xmax, ymax = geom_k.envelope_of(rings)
    if margin_m > 0.0:
        mlat = margin_m / 110_000.0  # conservative meridian degree
        max_abs_lat = min(89.9, max(abs(ymin), abs(ymax)) + mlat)
        mlon = margin_m / (111_320.0 * np.cos(np.deg2rad(max_abs_lat)))
        carr = cells.cells_covering(xmin - mlon, ymin - mlat, xmax + mlon, ymax + mlat, res)
    else:
        carr = cells.cells_covering(xmin, ymin, xmax, ymax, res)
    cx0, cy0, cx1, cy1 = cells.cell_bounds_many(carr)
    corners_in = np.ones(len(carr), dtype=bool)
    corners_any = np.zeros(len(carr), dtype=bool)
    for gx, gy in ((cx0, cy0), (cx1, cy0), (cx1, cy1), (cx0, cy1)):
        c_in = geom_k.points_in_polygon(gx, gy, rings)
        corners_in &= c_in
        corners_any |= c_in
    hits = _segs_hit_boxes(rings, cx0, cy0, cx1, cy1)
    full_mask = corners_in & ~hits
    if margin_m > 0.0:
        return carr, full_mask
    fx, fy = rings[0][0, 0], rings[0][0, 1]
    first_in = (fx >= cx0) & (fx <= cx1) & (fy >= cy0) & (fy <= cy1)
    keep = full_mask | corners_any | hits | first_in
    return carr[keep], full_mask[keep]


def prepare_zones(zones: DataFrame, res: int = DEFAULT_RES):
    """Zone polygons → (zone_cells DataFrame, {zone_id: rings} dict),
    prepared on the DRIVER (zones collected).

    Used only by callers that need the ring_map dict for a broadcast
    pandas-UDF refine (``refine='pandas'``, geometry_join).  The default
    Column-refine join path uses :func:`prepare_zones_distributed`, which
    never touches the driver — prefer that for large zone sides.
    """
    spark = zones.sparkSession
    rows = zones.collect()
    cell_rows = []
    ring_map: dict[str, list[np.ndarray]] = {}
    for row in rows:
        rings = _zone_rings_lonlat(row)
        ring_map[row["zone_id"]] = rings
        kept, full_mask = _classify_zone_cells(rings, res)
        ext = [(float(x), float(y)) for x, y in rings[0]]
        ints = [[(float(x), float(y)) for x, y in r] for r in rings[1:]]
        for c, full in zip(kept.tolist(), full_mask.tolist()):
            # rings ride along on partial cells only — full cells skip
            # the refine, so the broadcast stays lean where it can
            cell_rows.append(
                (int(c), row["zone_id"], bool(full),
                 [] if full else ext, [] if full else ints)
            )
    zone_cells = spark.createDataFrame(
        cell_rows,
        "cell_id long, zone_id string, full boolean, "
        "exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>",
    )
    return zone_cells, ring_map


_ZPREP_SCHEMA = T.StructType([
    T.StructField("exterior", T.ArrayType(T.StructType([
        T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType()),
    ]))),
    T.StructField("interiors", T.ArrayType(T.ArrayType(T.StructType([
        T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType()),
    ])))),
    T.StructField("cells", T.ArrayType(T.StructType([
        T.StructField("cell_id", T.LongType()), T.StructField("full", T.BooleanType()),
    ]))),
])


def prep_zone_struct(zones: DataFrame, res: int = DEFAULT_RES,
                     margin_m: float = 0.0) -> DataFrame:
    """(zone_id, _z(exterior, interiors, cells)) computed ZONE-PARALLEL:
    CRS harmonization + covering-cell classification inside a pandas UDF
    on the executors.  The driver never materializes a zone or a cell —
    10^6 zones is just more partitions.  ``margin_m`` expands the covering
    cells by a distance margin (the DWithin candidate disk).

    Downstream shapes: explode ``_z.cells`` for the cell equi-join;
    project ``_z.exterior``/``_z.interiors`` for a (zone_id → rings)
    attach join — rings reach the refine on join rows, never via a
    driver-built broadcast dict.
    """

    @F.pandas_udf(_ZPREP_SCHEMA)
    def prep(exterior: pd.Series, interiors: pd.Series, crs: pd.Series) -> pd.DataFrame:
        out = []
        for ext, ints, c in zip(exterior, interiors, crs):
            row = {"exterior": ext, "interiors": ints, "crs": c}
            rings = _zone_rings_lonlat(row)
            kept, full_mask = _classify_zone_cells(rings, res, margin_m)
            out.append({
                "exterior": [{"x": float(x), "y": float(y)} for x, y in rings[0]],
                "interiors": [
                    [{"x": float(x), "y": float(y)} for x, y in r] for r in rings[1:]
                ],
                "cells": [
                    {"cell_id": int(cc), "full": bool(fl)}
                    for cc, fl in zip(kept.tolist(), full_mask.tolist())
                ],
            })
        return pd.DataFrame(out)

    # single-eval barrier: _z feeds both the cell explode and the ring
    # projection — without this Catalyst re-runs the (expensive) zone
    # classification once per consumer
    prep = prep.asNondeterministic()
    return zones.withColumn("_z", prep("exterior", "interiors", "crs"))


def prepare_zones_distributed(zones: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """zone_cells(cell_id, zone_id, full, exterior, interiors) computed
    ZONE-PARALLEL (:func:`prep_zone_struct`) then exploded as Column ops —
    the identical row set to :func:`prepare_zones` (same kernels,
    cross-checked in tests/test_distributed_expansion.py).  Rings ride on
    partial-cell rows; full cells carry empty rings (refine skipped).
    """
    z = prep_zone_struct(zones, res)
    c = z.select(
        "zone_id",
        F.col("_z.exterior").alias("_ext"),
        F.col("_z.interiors").alias("_int"),
        F.explode("_z.cells").alias("_c"),
    )
    empty_ext = F.array().cast("array<struct<x:double,y:double>>")
    empty_int = F.array().cast("array<array<struct<x:double,y:double>>>")
    return c.select(
        F.col("_c.cell_id").alias("cell_id"),
        "zone_id",
        F.col("_c.full").alias("full"),
        F.when(F.col("_c.full"), empty_ext).otherwise(F.col("_ext")).alias("exterior"),
        F.when(F.col("_c.full"), empty_int).otherwise(F.col("_int")).alias("interiors"),
    )


def _rings_from_row(ext, ints) -> list[np.ndarray]:
    """Arrow-decoded ring columns (list of {x,y} structs / list of lists)
    → [exterior, *interiors] as (n,2) float64 arrays, for refine UDFs
    that receive zone rings ON THE JOIN ROW instead of a broadcast dict."""
    rings = [np.array([[p["x"], p["y"]] for p in ext], dtype=np.float64)]
    for hole in (ints if ints is not None else []):
        rings.append(np.array([[p["x"], p["y"]] for p in hole], dtype=np.float64))
    return rings


def flat_ring_cols(ext_col, int_col):
    """(exterior array<struct<x,y>>, interiors) → (array<double>,
    array<array<double>>) flattened [x0,y0,x1,y1,…] Column expressions.

    Rings ride every candidate join row; as list<struct> Arrow hands the
    refine UDF per-row PYTHON DICT lists (the conversion dominated the
    dwithin_zones refine at 10^6 candidates).  Flat double arrays arrive
    as numpy — reshape(-1,2) and go."""
    ext = F.flatten(F.transform(ext_col, lambda p: F.array(p["x"], p["y"])))
    ints = F.transform(
        int_col, lambda h: F.flatten(F.transform(h, lambda p: F.array(p["x"], p["y"])))
    )
    return ext, ints


def _rings_from_flat(ext, ints) -> list[np.ndarray]:
    """Flat [x0,y0,…] arrays (numpy from Arrow) → [(n,2) float64 rings]."""
    rings = [np.asarray(ext, dtype=np.float64).reshape(-1, 2)]
    for hole in (ints if ints is not None else []):
        rings.append(np.asarray(hole, dtype=np.float64).reshape(-1, 2))
    return rings


def _pip_refine_udf(ring_map_bc):
    """Vectorized crossing-number refine: (lon, lat, zone_id, full) → bool.

    ``full=true`` rows (cell entirely inside the polygon) short-circuit to
    true without touching the kernel; the rest are grouped by zone via
    integer ``factorize`` codes (string equality per zone over the whole
    batch was the hot spot) and tested batch-wise in numpy.
    """

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, zone_id: pd.Series, full: pd.Series) -> pd.Series:
        rings_by_zone = ring_map_bc.value
        fullv = full.to_numpy(dtype=bool)
        out = fullv.copy()
        todo = np.nonzero(~fullv)[0]
        if len(todo):
            lon_np = lon.to_numpy(dtype=np.float64)[todo]
            lat_np = lat.to_numpy(dtype=np.float64)[todo]
            codes, uniques = pd.factorize(zone_id.to_numpy()[todo])
            for k, z in enumerate(uniques):
                rings = rings_by_zone.get(z)
                if rings is None:
                    continue
                m = codes == k
                out[todo[m]] = geom_k.points_in_polygon(lon_np[m], lat_np[m], rings)
        return pd.Series(out)

    return pip


# ---------------------------------------------------------------------------
# The join
# ---------------------------------------------------------------------------


def spatial_join(
    docs: DataFrame,
    zones: DataFrame,
    res: int = DEFAULT_RES,
    strategy: str = "broadcast",
    predicate: str = "intersects",
    salt: int = 0,
    hot_cell_threshold: int = 200_000,
    lon_col: str = "lon",
    lat_col: str = "lat",
    refine: str = "column",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs(points) ⋈ zones(polygons) under a spatial predicate.

    predicate: 'intersects' | 'within' (point vs polygon: identical row
    sets under the half-open boundary rule) | 'disjoint' (anti-join of
    intersects — reference TopologicalRelationships.java:71-73).

    strategy:
      - 'broadcast': zone_cells broadcast; no shuffle of docs at all.
      - 'shuffle': hash-shuffle both sides on cell_id; with ``salt`` > 0,
        hot cells (estimated count > hot_cell_threshold) get their zone
        rows replicated ×salt and doc rows spread across salt sub-keys —
        the explicit skew handling the north rule demands.

    Zone preparation: 'shuffle' (the large-zone-side strategy) prepares
    zone cells fully distributed (:func:`prepare_zones_distributed` — the
    driver never materializes a zone or cell, so a 10^6-zone side is just
    more partitions).  'broadcast' keeps the driver-side
    :func:`prepare_zones`: a side small enough to broadcast to every
    executor is by definition driver-sized, and the driver path keeps the
    flagship plan 100% JVM (no Arrow eval anywhere — asserted in
    tests/test_plans_bucketing.py).  ``refine='pandas'`` also needs the
    driver path for its broadcast ring dict.
    """
    spark = docs.sparkSession
    if refine == "column" and strategy == "shuffle":
        zone_cells = prepare_zones_distributed(zones, res)
        ring_bc = None
    else:
        zone_cells, ring_map = prepare_zones(zones, res)
        ring_bc = spark.sparkContext.broadcast(ring_map)

    pts = docs if "cell_id" in docs.columns else tile_assign(docs, res, lon_col, lat_col)

    if predicate == "disjoint":
        matched = spatial_join(
            docs, zones, res, strategy, "intersects", salt, hot_cell_threshold,
            lon_col, lat_col,
        )
        if id_col not in docs.columns:
            raise ValueError(
                f"disjoint anti-join needs a unique id column; {id_col!r} "
                f"not in {docs.columns}"
            )
        return docs.join(matched.select(id_col).distinct(), id_col, "left_anti")

    if strategy == "broadcast":
        joined = pts.join(F.broadcast(zone_cells), "cell_id", "inner")
    elif strategy == "shuffle":
        if salt > 0:
            # explicit hot-cell salting: estimate per-cell doc counts on a
            # sample, replicate zone rows for hot cells only
            hot = [
                r["cell_id"]
                for r in pts.sample(0.01, seed=42)
                .groupBy("cell_id").count()
                .where(F.col("count") * 100 > hot_cell_threshold)
                .collect()
            ]
            if hot:
                salts = spark.range(salt).select(F.col("id").cast("int").alias("salt"))
                zc_hot = (
                    zone_cells.where(F.col("cell_id").isin(hot)).crossJoin(salts)
                )
                zc_cold = zone_cells.where(~F.col("cell_id").isin(hot)).withColumn(
                    "salt", F.lit(0)
                )
                zc = zc_hot.unionByName(zc_cold)
                pts = pts.withColumn(
                    "salt",
                    F.when(
                        F.col("cell_id").isin(hot),
                        F.pmod(F.xxhash64(F.col(pts.columns[0])), F.lit(salt)).cast("int"),
                    ).otherwise(F.lit(0)),
                )
                joined = pts.join(zc, ["cell_id", "salt"], "inner").drop("salt")
            else:
                joined = pts.join(zone_cells, "cell_id", "inner")
        else:
            joined = pts.join(zone_cells, "cell_id", "inner")
    else:
        raise ValueError(f"unknown strategy: {strategy}")

    if refine == "column":
        # JVM fast path: crossing-number as whole-stage-codegen'd Column
        # math over the rings shipped on the broadcast side — no Python,
        # no Arrow, in the 10^12-doc hot loop.
        pip_col = point_in_polygon_col(
            F.col(lon_col), F.col(lat_col), F.col("exterior"), F.col("interiors")
        )
        refined = joined.where(F.col("full") | pip_col)
    else:
        pip = _pip_refine_udf(ring_bc)
        refined = joined.where(
            pip(F.col(lon_col), F.col(lat_col), F.col("zone_id"), F.col("full"))
        )
    return refined.drop("full", "exterior", "interiors")


def dwithin_zone_join(
    docs: DataFrame,
    zones: DataFrame,
    distance_m: float,
    res: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    strategy: str = "broadcast",
) -> DataFrame:
    """docs(points) within ``distance_m`` of polygon ZONES — the
    geometry×geometry DWithin of the reference
    (``TopologicalRelationships.java:149-179``): JTS ``nearestPoints``
    witness pair + orthodromic distance, lifted to filter-and-refine:

    1. zone side: covering cells of the polygon envelope EXPANDED by the
       distance margin, each flagged full (cell inside the polygon ⇒
       distance 0, refine skipped) — dimension-side prep, broadcast;
    2. docs equi-join on cell_id;
    3. refine (Arrow batch, grouped by zone): inside test, else the
       planar nearest witness on the rings (vertex/segment projections —
       exactly JTS DistanceOp's reduction) and the exact Vincenty
       distance of the witness pair.

    Returns doc columns… + zone_id + dist_m (0.0 for interior points).

    Zone prep is FULLY DISTRIBUTED (:func:`prep_zone_struct` — pandas UDF
    per zone, margin-expanded covering cells, Column explode): the driver
    never collects a zone, so a 10^6-zone side is just more partitions
    (r2 verdict item 2; the old driver-side ``zones.collect()`` + ring
    dict broadcast is gone).  Rings reach the refine ON JOIN ROWS via a
    (zone_id → rings) attach join.  ``strategy='broadcast'`` broadcasts
    the cell and ring tables (dimension-sized zone sets); ``'shuffle'``
    hash-partitions both joins on their keys for zone sides too large to
    broadcast.
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"dwithin_zone_join: unknown strategy {strategy!r}")
    if res is None:
        res = cells.res_for_meters(max(distance_m, 500.0) * 4)

    z = prep_zone_struct(zones, res, margin_m=distance_m)
    zone_cells = z.select(
        "zone_id", F.explode("_z.cells").alias("_c")
    ).select(F.col("_c.cell_id").alias("cell_id"), "zone_id", F.col("_c.full").alias("full"))
    flat_ext, flat_int = flat_ring_cols(F.col("_z.exterior"), F.col("_z.interiors"))
    zone_rings = z.select(
        "zone_id", flat_ext.alias("_zext"), flat_int.alias("_zint")
    )
    if strategy == "broadcast":
        zone_cells = F.broadcast(zone_cells)
        zone_rings = F.broadcast(zone_rings)

    pts = tile_assign(docs.drop("cell_id"), res, lon_col, lat_col)
    cand = pts.join(zone_cells, "cell_id", "inner").join(zone_rings, "zone_id", "inner")
    # full cells never touch the rings (distance 0 short-circuit) — null
    # them out so the Arrow transfer only pays for partial candidates
    cand = cand.withColumn(
        "_zext", F.when(F.col("full"), F.lit(None)).otherwise(F.col("_zext"))
    ).withColumn(
        "_zint", F.when(F.col("full"), F.lit(None)).otherwise(F.col("_zint"))
    )

    from ..kernels import geodesic

    @F.pandas_udf(T.DoubleType())
    def zone_dist(lon: pd.Series, lat: pd.Series, zone_id: pd.Series,
                  full: pd.Series, zext: pd.Series, zint: pd.Series) -> pd.Series:
        lon_np = lon.to_numpy(dtype=np.float64)
        lat_np = lat.to_numpy(dtype=np.float64)
        out = np.full(len(lon_np), np.inf)
        out[full.to_numpy(dtype=bool)] = 0.0
        todo = np.nonzero(~full.to_numpy(dtype=bool))[0]
        if len(todo):
            codes, uniques = pd.factorize(zone_id.to_numpy()[todo])
            for k in range(len(uniques)):
                m = todo[codes == k]
                rings = _rings_from_flat(zext.iloc[m[0]], zint.iloc[m[0]])
                px, py = lon_np[m], lat_np[m]
                inside = geom_k.points_in_polygon(px, py, rings)
                best = np.full(len(m), np.inf)
                bqx = np.zeros(len(m))
                bqy = np.zeros(len(m))
                for r in rings:
                    d2, qx, qy = geom_k._nearest_on_segments(px, py, r[:-1], r[1:])
                    better = d2 < best
                    best = np.where(better, d2, best)
                    bqx = np.where(better, qx, bqx)
                    bqy = np.where(better, qy, bqy)
                dist = geodesic.inverse(py, px, bqy, bqx)
                out[m] = np.where(inside, 0.0, dist)
        return pd.Series(out)

    # single-eval barrier: the refine column feeds BOTH the filter and the
    # output; without this Catalyst inlines the (expensive) Arrow UDF into
    # each consumer and evaluates it twice per candidate
    zone_dist = zone_dist.asNondeterministic()
    cand = cand.withColumn(
        "dist_m",
        zone_dist(F.col(lon_col), F.col(lat_col), F.col("zone_id"),
                  F.col("full"), F.col("_zext"), F.col("_zint")),
    )
    return cand.where(F.col("dist_m") < F.lit(distance_m)).drop("full", "_zext", "_zint")


def beyond_join(
    docs: DataFrame,
    pois: DataFrame,
    distance_m: float,
    res: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "doc_id",
) -> DataFrame:
    """BEYOND: docs with NO poi within ``distance_m`` — the anti-join of
    DWITHIN (reference ``isBeyond``, TopologicalRelationships.java:194-196)."""
    near = dwithin_join(docs, pois, distance_m, res, lon_col, lat_col)
    if id_col not in docs.columns:
        raise ValueError(
            f"beyond anti-join needs a unique id column; {id_col!r} "
            f"not in {docs.columns}"
        )
    return docs.join(near.select(id_col).distinct(), id_col, "left_anti")


def expand_poi_cells(
    pois: DataFrame,
    res: int,
    k_rings: int,
    id_col: str = "poi_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(cell_id, poi_id, poi_lon, poi_lat): each poi exploded into its
    cell disk — pure Column math on the DataFrame side, so a 10^7-poi
    table expands distributed (the driver never materializes it)."""
    from ..functions import disk_cells_col

    return pois.select(
        F.col(id_col).alias("poi_id"),
        F.col(x_col).alias("poi_lon"),
        F.col(y_col).alias("poi_lat"),
        F.explode(
            disk_cells_col(F.col(x_col), F.col(y_col), res, k_rings)
        ).alias("cell_id"),
    )


def dwithin_join(
    docs: DataFrame,
    pois: DataFrame,
    distance_m: float,
    res: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    exact: bool = True,
    strategy: str = "broadcast",
) -> DataFrame:
    """docs × pois pairs with geodesic distance < distance_m (DWITHIN).

    Reference: ``TopologicalRelationships.isWithinDistance``
    (``TopologicalRelationships.java:149-179``), nearest-points +
    orthodromic distance.  Join shape: cell-disk expansion of the poi side
    within ceil(d/cell_edge) rings (distributed Column math — no driver
    collect, see :func:`expand_poi_cells`) → equi-join on cell →
    haversine prefilter (JVM Column math) → exact Vincenty refine
    (Arrow/numpy UDF).

    strategy: 'broadcast' ships the expanded poi side to every executor
    (right for dimension-sized poi tables); 'shuffle' hash-partitions
    both sides on cell_id (right when the poi side is itself huge).

    BEYOND (``isBeyond``, :194-196) = anti-join on this result.
    """
    if res is None:
        res = cells.res_for_meters(max(distance_m, 500.0) * 2)
    edge_deg = 180.0 / (1 << res)
    k_rings = int(np.ceil(distance_m / (edge_deg * 111_320.0))) + 1

    poi_cells = expand_poi_cells(pois, res, k_rings)
    # always re-tile at THIS join's resolution: a caller-supplied cell_id
    # tiled at a different res would silently join to nothing (cell ids
    # embed the res in their high bits); the bit math is codegen'd JVM —
    # recomputing is cheaper than trusting
    pts = tile_assign(docs.drop("cell_id"), res, lon_col, lat_col)
    right = F.broadcast(poi_cells) if strategy == "broadcast" else poi_cells
    cand = pts.join(right, "cell_id", "inner")

    from ..functions import haversine_m

    # spherical prefilter with 0.6% guard band, then exact ellipsoidal refine
    cand = cand.where(
        haversine_m(F.col(lat_col), F.col(lon_col), F.col("poi_lat"), F.col("poi_lon"))
        < F.lit(distance_m * 1.01)
    )
    if not exact:
        return cand

    from ..kernels import geodesic

    @F.pandas_udf(T.DoubleType())
    def geo_dist(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return pd.Series(
            geodesic.inverse(
                lat1.to_numpy(), lon1.to_numpy(), lat2.to_numpy(), lon2.to_numpy()
            )
        )

    # single-eval barrier: dist_m feeds both the filter and downstream
    # projections — without this Catalyst inlines the Arrow UDF into each
    # consumer and runs the Vincenty refine twice per candidate
    geo_dist = geo_dist.asNondeterministic()
    return cand.withColumn(
        "dist_m", geo_dist(F.col(lat_col), F.col(lon_col), F.col("poi_lat"), F.col("poi_lon"))
    ).where(F.col("dist_m") < F.lit(distance_m))
