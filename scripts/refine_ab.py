"""A/B: batch-vectorized DE-9IM refine vs the per-pair fallback.

r2 verdict item 3 asked for a measurable wall-time drop from replacing
the per-pair Python loop in geometry_join's refine with the batch
kernels.  The per-pair loop still exists as the multi*/touches fallback,
selectable via geometry_join(refine_impl='perpair') — same candidates,
same kernels, identical row sets (property-tested).  This script times
the three polygon-zone joins both ways: same session, 1 warm-up +
best-of-2 per configuration.

Usage: python scripts/refine_ab.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geomatics_geotk_spark import queries as q  # noqa: E402
from geomatics_geotk_spark.operators.geometry_join import geometry_join  # noqa: E402
from geomatics_geotk_spark.session import get_spark  # noqa: E402


def _line_docs(spark, sf_dir):
    pts = q._pts_from_key(q._read(spark, sf_dir, "customer"), "c_custkey")
    return pts.select(
        "doc_id",
        F.format_string(
            "LINESTRING (%s %s, %s %s)",
            F.col("lon").cast("string"), F.col("lat").cast("string"),
            (F.col("lon") + F.lit(0.07)).cast("string"),
            (F.col("lat") + F.lit(0.05)).cast("string"),
        ).alias("wkt"),
    )


def _poly_docs(spark, sf_dir):
    pts = q._pts_from_key(q._read(spark, sf_dir, "customer"), "c_custkey")
    lon, lat = F.col("lon"), F.col("lat")
    s = lambda c: c.cast("string")  # noqa: E731
    return pts.select(
        "doc_id",
        F.format_string(
            "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
            s(lon), s(lat), s(lon + F.lit(0.06)), s(lat),
            s(lon + F.lit(0.06)), s(lat + F.lit(0.04)),
            s(lon), s(lat + F.lit(0.04)), s(lon), s(lat),
        ).alias("wkt"),
    )


CASES = {
    "lines_intersects": (_line_docs, "intersects"),
    "polys_overlaps": (_poly_docs, "overlaps"),
    "lines_crosses": (_line_docs, "crosses"),
}


def timed_best2(spark, sf_dir, builder, predicate, impl):
    def once():
        docs = builder(spark, sf_dir)
        df = geometry_join(docs, q._shifted_zone_rects(spark), predicate,
                           res=10, refine_impl=impl)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    once()  # warm-up
    return round(min(once(), once()), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark("refine_ab", master=f"local[{cpus}]")

    batch = {n: timed_best2(spark, sf_dir, b, p, "batch") for n, (b, p) in CASES.items()}
    perpair = {n: timed_best2(spark, sf_dir, b, p, "perpair") for n, (b, p) in CASES.items()}

    result = {
        "metric": "geometry_join refine: batch kernels vs per-pair fallback (best-of-2, warm)",
        "sf_dir": sf_dir, "cpus": int(cpus),
        "batch_sec": batch, "perpair_sec": perpair,
        "speedup": {n: round(perpair[n] / batch[n], 2) for n in CASES},
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
