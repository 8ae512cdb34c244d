"""Named-cause re-runs for the three unchanged-code bench regressions in
the official r3 record (r3 verdict item 6): simhash_neardups_fast
(2.26 s r2 → 5.86 s r3, 2.6x), zonal_stats (2.03 → 3.60, 1.8x),
simhash_neardups (3.31 → 4.44, 1.3x).  `git diff a68be4c..6dc13b4`
shows no change to either query's code between the two records, so the
hypothesis is the documented 3-4x host-steal window, not the engine —
this script produces the committed evidence the knn_cellring case got
in AB_BENCH.json.

Protocol: one Spark session at bench.py's local[N]/sf, per query one
untimed warm-up + 5 timed passes; report all passes, best, and the
ratio of best to the r2/r3 official numbers.  If best reproduces the
slow number, the regression is real and needs a fix; if best lands at
or under the r2 number, the r3 record was a steal window.

Usage: python scripts/regress_recheck.py [sf_dir] [cpus]
Writes REGRESS_RECHECK.json and prints the JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geomatics_geotk_spark import queries as q
from geomatics_geotk_spark.session import get_spark

# (name, official r2 seconds, official r3 seconds)
SUSPECTS = [
    ("simhash_neardups_fast", 2.26, 5.856),
    ("zonal_stats", 2.03, 3.604),
    ("simhash_neardups", 3.31, 4.438),
]


def timed(spark, sf_dir: str, name: str) -> float:
    df = q.QUERIES[name](spark, sf_dir)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark("regress_recheck", master=f"local[{cpus}]")

    out = {}
    for name, r2_s, r3_s in SUSPECTS:
        timed(spark, sf_dir, name)  # warm-up, untimed
        passes = [timed(spark, sf_dir, name) for _ in range(5)]
        best = min(passes)
        out[name] = {
            "official_r2": r2_s,
            "official_r3": r3_s,
            "passes": passes,
            "best": best,
            "best_vs_r2": round(best / r2_s, 2),
            "best_vs_r3": round(best / r3_s, 2),
            "verdict": (
                "host-noise (r3 record not reproducible warm)"
                if best <= r2_s * 1.25
                else "REAL regression — investigate"
            ),
        }

    result = {
        "metric": "isolated warm re-runs of the three r3 unchanged-code bench regressions",
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "queries": out,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "REGRESS_RECHECK.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
