"""Distributed poi/zone cell expansion: the scale paths that replace the
round-1 driver-side loops.

- expand_poi_cells / disk_cells_col must equal the numpy cells.disk
  expansion exactly;
- dwithin_join at 10^5 POIs runs with NO driver collect (shuffle
  strategy) and matches a numpy brute-force truth on sampled docs;
- prepare_zones_distributed emits the identical (cell_id, zone_id, full)
  row set as the driver-side prepare_zones;
- spatial_join through the distributed prep returns the same rows as
  through the driver-side prep.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark import cells
from geomatics_geotk_spark.kernels import geodesic
from geomatics_geotk_spark.operators import spatial_join as sj
from geomatics_geotk_spark.sources import synth_documents, zones_table

RES = 11
K = 2


@pytest.fixture(scope="module")
def pois_big(spark):
    # 100k deterministic pois in/around the Vancouver box
    n = 100_000
    df = spark.range(n).select(
        F.format_string("poi-%07d", F.col("id")).alias("poi_id"),
        (F.lit(-123.6) + (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10**9)) / 1e9) * F.lit(1.3)).alias("x"),
        (F.lit(48.9) + (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10**9)) / 1e9) * F.lit(1.3)).alias("y"),
    )
    df = df.cache()
    df.count()
    return df


def test_expand_poi_cells_matches_numpy_disk(spark):
    pts = [("p0", -123.21, 49.27), ("p1", -122.6, 49.9), ("p2", 179.99, -45.0), ("p3", 0.0, 89.99)]
    df = spark.createDataFrame(pts, "poi_id string, x double, y double")
    got = {
        (r["poi_id"], r["cell_id"])
        for r in sj.expand_poi_cells(df, RES, K).collect()
    }
    want = set()
    for pid, x, y in pts:
        c = int(cells.cell_of([x], [y], RES)[0])
        for cc in cells.disk(c, K):
            want.add((pid, int(cc)))
    assert got == want


def test_dwithin_100k_pois_no_driver_collect(spark, pois_big):
    docs = sj.tile_assign(
        sj.decode_geo_spans(synth_documents(spark, 400)), 12
    ).select("doc_id", "lon", "lat", "cell_id")
    dist = 2000.0
    out = sj.dwithin_join(docs, pois_big, distance_m=dist, strategy="shuffle")
    got = {(r["doc_id"], r["poi_id"]) for r in out.collect()}

    # numpy brute-force truth over every (doc, poi) pair
    d = docs.select("doc_id", "lon", "lat").toPandas()
    p = pois_big.toPandas()
    want = set()
    lat1 = d["lat"].to_numpy()[:, None]
    lon1 = d["lon"].to_numpy()[:, None]
    lat2 = p["y"].to_numpy()[None, :]
    lon2 = p["x"].to_numpy()[None, :]
    hav = geodesic.haversine_m(lat1, lon1, lat2, lon2)
    ii, jj = np.nonzero(hav < dist * 1.02)  # shortlist, then exact
    ex = geodesic.inverse(
        lat1[ii, 0], lon1[ii, 0], lat2[0, jj], lon2[0, jj]
    )
    for k in np.nonzero(ex < dist)[0]:
        want.add((d["doc_id"].iloc[ii[k]], p["poi_id"].iloc[jj[k]]))
    assert got == want
    assert len(got) > 0


def test_prepare_zones_distributed_equals_driver(spark):
    zones = zones_table(spark, grid=4)
    res = 10
    drv, _ = sj.prepare_zones(zones, res)
    dist = sj.prepare_zones_distributed(zones, res)
    key = lambda r: (r["cell_id"], r["zone_id"], r["full"])  # noqa: E731
    got_d = sorted(key(r) for r in drv.collect())
    got_x = sorted(key(r) for r in dist.collect())
    assert got_d == got_x
    # partial cells carry the harmonized rings, full cells carry []
    for r in dist.collect():
        if r["full"]:
            assert r["exterior"] == []
        else:
            assert len(r["exterior"]) >= 4


def test_spatial_join_same_rows_both_preps(spark):
    docs = sj.tile_assign(
        sj.decode_geo_spans(synth_documents(spark, 1500)), 12
    )
    zones = zones_table(spark, grid=8).where(F.col("zone_id").startswith("zone-grid-"))
    col_path = sj.spatial_join(docs, zones, res=12, strategy="broadcast")
    pd_path = sj.spatial_join(docs, zones, res=12, strategy="broadcast", refine="pandas")
    a = {(r["doc_id"], r["zone_id"]) for r in col_path.select("doc_id", "zone_id").collect()}
    b = {(r["doc_id"], r["zone_id"]) for r in pd_path.select("doc_id", "zone_id").collect()}
    assert a == b
    assert len(a) > 0


def test_dwithin_zone_join_vs_brute_force_pentagon(spark):
    """Geometry×geometry DWITHIN against a non-rectangular (pentagon)
    zone: the cell-prefiltered operator must reproduce the numpy brute
    force exactly — witness on the nearest boundary segment, Vincenty of
    the witness pair, interior points at distance 0."""
    import numpy as np
    from geomatics_geotk_spark.kernels import geometry as geom_k

    pentagon = [
        (-123.4, 49.1), (-122.9, 49.05), (-122.6, 49.4),
        (-122.9, 49.9), (-123.35, 49.7), (-123.4, 49.1),
    ]
    zones = spark.createDataFrame(
        [("pent", "CRS:84", pentagon, [])],
        "zone_id string, crs string, exterior array<struct<x:double,y:double>>, "
        "interiors array<array<struct<x:double,y:double>>>",
    )
    docs = sj.decode_geo_spans(synth_documents(spark, 600)).select("doc_id", "lon", "lat")
    dist = 6000.0
    out = sj.dwithin_zone_join(docs, zones, distance_m=dist)
    got = {(r["doc_id"], round(r["dist_m"], 6)) for r in out.collect()}

    d = docs.toPandas()
    ring = np.array(pentagon, dtype=np.float64)
    px, py = d["lon"].to_numpy(), d["lat"].to_numpy()
    inside = geom_k.points_in_polygon(px, py, [ring])
    d2, qx, qy = geom_k._nearest_on_segments(px, py, ring[:-1], ring[1:])
    vd = geodesic.inverse(py, px, qy, qx)
    vd = np.where(inside, 0.0, vd)
    want = {
        (d["doc_id"].iloc[i], round(float(vd[i]), 6))
        for i in np.nonzero(vd < dist)[0]
    }
    assert got == want
    assert any(v == 0.0 for _, v in got)  # interior points present
    assert any(v > 0.0 for _, v in got)   # exterior-but-near points present


def test_spatial_join_shuffle_2000_zones(spark):
    """Shuffle strategy with a large-ish zone side (2000 rects) prepared
    fully distributed — identical match set to the broadcast path."""
    n = 2000
    zones = spark.range(n).select(
        F.format_string("zz-%04d", F.col("id")).alias("zone_id"),
        F.lit("CRS:84").alias("crs"),
        F.transform(
            F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
            lambda i: F.struct(
                (F.lit(-123.5) + (F.col("id") % 50) * F.lit(0.02)
                 + F.when(i.isin(1, 2), F.lit(0.018)).otherwise(F.lit(0.0))).alias("x"),
                (F.lit(49.0) + F.floor(F.col("id") / 50) * F.lit(0.024)
                 + F.when(i.isin(2, 3), F.lit(0.02)).otherwise(F.lit(0.0))).alias("y"),
            ),
        ).alias("exterior"),
        F.array().cast("array<array<struct<x:double,y:double>>>").alias("interiors"),
    )
    docs = sj.tile_assign(sj.decode_geo_spans(synth_documents(spark, 2000)), 12)
    bc = sj.spatial_join(docs, zones, res=12, strategy="broadcast")
    sh = sj.spatial_join(docs, zones, res=12, strategy="shuffle")
    a = {(r["doc_id"], r["zone_id"]) for r in bc.select("doc_id", "zone_id").collect()}
    b = {(r["doc_id"], r["zone_id"]) for r in sh.select("doc_id", "zone_id").collect()}
    assert a == b
    assert len(a) > 500  # dense tiling: most docs land in a zone
