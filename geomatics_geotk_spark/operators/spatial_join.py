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
from ..functions import cell_id_col, wkt_point_lat, wkt_point_lon
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


def prepare_zones(zones: DataFrame, res: int = DEFAULT_RES):
    """Zone polygons → (zone_cells DataFrame, {zone_id: rings} dict).

    ``zone_cells(cell_id, zone_id, full)`` is the join side: one row per
    covering cell; ``full=true`` cells lie entirely inside the polygon so
    matched points skip the exact refine.  The rings dict is broadcast to
    executors for the refine UDF.

    Zones are the dimension side (thousands, not 10^12) — collecting them
    to the driver is the same decision as broadcasting a dim table.
    """
    spark = zones.sparkSession
    rows = zones.collect()
    cell_rows = []
    ring_map: dict[str, list[np.ndarray]] = {}
    for row in rows:
        rings = _zone_rings_lonlat(row)
        ring_map[row["zone_id"]] = rings
        xmin, ymin, xmax, ymax = geom_k.envelope_of(rings)
        for c in cells.cells_covering(xmin, ymin, xmax, ymax, res):
            cx0, cy0, cx1, cy1 = cells.cell_bounds(int(c))
            corners_x = np.array([cx0, cx1, cx1, cx0])
            corners_y = np.array([cy0, cy0, cy1, cy1])
            corners_in = geom_k.points_in_polygon(corners_x, corners_y, rings)
            cell_ring = geom_k.envelope_as_polygon(cx0, cy0, cx1, cy1)
            boundary_hits = any(
                geom_k.segments_intersect_any(cell_ring, zr) for zr in rings
            )
            if bool(corners_in.all()) and not boundary_hits:
                full = True
            elif bool(corners_in.any()) or boundary_hits or geom_k.points_in_polygon(
                np.array([rings[0][0, 0]]), np.array([rings[0][0, 1]]),
                [cell_ring],
            )[0]:
                full = False
            else:
                continue  # covering-envelope cell that misses the polygon
            cell_rows.append((int(c), row["zone_id"], bool(full)))
    zone_cells = spark.createDataFrame(
        cell_rows, "cell_id long, zone_id string, full boolean"
    )
    return zone_cells, ring_map


def _pip_refine_udf(ring_map_bc):
    """Vectorized crossing-number refine: (lon, lat, zone_id) → bool."""

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, zone_id: pd.Series) -> pd.Series:
        rings_by_zone = ring_map_bc.value
        out = np.zeros(len(lon), dtype=bool)
        lon_np = lon.to_numpy(dtype=np.float64)
        lat_np = lat.to_numpy(dtype=np.float64)
        for z in zone_id.unique():
            m = (zone_id == z).to_numpy()
            rings = rings_by_zone.get(z)
            if rings is None:
                continue
            out[m] = geom_k.points_in_polygon(lon_np[m], lat_np[m], rings)
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
    """
    spark = docs.sparkSession
    zone_cells, ring_map = prepare_zones(zones, res)
    ring_bc = spark.sparkContext.broadcast(ring_map)

    pts = docs if "cell_id" in docs.columns else tile_assign(docs, res, lon_col, lat_col)

    if predicate == "disjoint":
        matched = spatial_join(
            docs, zones, res, strategy, "intersects", salt, hot_cell_threshold,
            lon_col, lat_col,
        )
        key = docs.columns[0]
        return docs.join(matched.select(key).distinct(), key, "left_anti")

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

    pip = _pip_refine_udf(ring_bc)
    refined = joined.where(
        F.col("full") | pip(F.col(lon_col), F.col(lat_col), F.col("zone_id"))
    ).drop("full")
    return refined


def dwithin_join(
    docs: DataFrame,
    pois: DataFrame,
    distance_m: float,
    res: int | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    exact: bool = True,
) -> DataFrame:
    """docs × pois pairs with geodesic distance < distance_m (DWITHIN).

    Reference: ``TopologicalRelationships.isWithinDistance``
    (``TopologicalRelationships.java:149-179``), nearest-points +
    orthodromic distance.  Join shape: cell-disk expansion of the poi side
    within ceil(d/cell_edge) rings → equi-join on cell → haversine
    prefilter (JVM Column math) → exact Vincenty refine (Arrow/numpy UDF).

    BEYOND (``isBeyond``, :194-196) = anti-join on this result.
    """
    spark = docs.sparkSession
    if res is None:
        res = cells.res_for_meters(max(distance_m, 500.0) * 2)
    edge_deg = 180.0 / (1 << res)
    k_rings = int(np.ceil(distance_m / (edge_deg * 111_320.0))) + 1

    # poi side: explode each poi into its covering disk of cells
    poi_rows = pois.collect()
    exp = []
    for r in poi_rows:
        c = int(cells.cell_of([r["x"]], [r["y"]], res)[0])
        for cc in cells.disk(c, k_rings):
            exp.append((int(cc), r["poi_id"], float(r["x"]), float(r["y"])))
    poi_cells = spark.createDataFrame(
        exp, "cell_id long, poi_id string, poi_lon double, poi_lat double"
    )

    pts = docs if "cell_id" in docs.columns else tile_assign(docs, res, lon_col, lat_col)
    cand = pts.join(F.broadcast(poi_cells), "cell_id", "inner")

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

    return cand.withColumn(
        "dist_m", geo_dist(F.col(lat_col), F.col(lon_col), F.col("poi_lat"), F.col("poi_lon"))
    ).where(F.col("dist_m") < F.lit(distance_m))
