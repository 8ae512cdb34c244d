"""Controlled A/B for the r1→r2 bench-record discrepancy (VERDICT r2 item 1).

Runs, in ONE Spark session on the same host, back-to-back:
  1. the EXACT round-1 19-query suite in round-1 order;
  2. the round-2 22-query suite in round-2 order;
  3. isolated re-runs (2 passes each) of the three queries whose official
     r2 numbers regressed vs r1: knn_cellring, pip_salted_shuffle,
     minhash_lsh (+ minhash_lsh_fast, the production twin).

All passes use the same sf dir and the same local[N] as bench.py, so the
only variables between parts 1 and 2 are query order and suite
composition — the experiment the round-2 verdict said nobody ran.

Prints one JSON document and appends a summary to BENCH.md.

Usage: python scripts/ab_bench.py [sf_dir] [cpus]
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

R1_ORDER = [
    "tile_assign", "interleaved_tile_pip", "pip_convex", "dwithin_exact",
    "knn_cellring", "zonal_stats", "envelope_agg", "temporal_during",
    "window_running", "pricing_summary", "revenue_by_nation", "minhash_lsh",
    "ngram_jaccard", "simhash_neardups", "cosine_topk", "ann_topk",
    "quality_score", "fingerprint", "pip_salted_shuffle",
]

R2_ORDER = [
    "tile_assign", "interleaved_tile_pip", "pip_convex", "dwithin_exact",
    "knn_cellring", "zonal_stats", "envelope_agg", "temporal_during",
    "window_running", "pricing_summary", "revenue_by_nation", "minhash_lsh",
    "minhash_lsh_fast", "ngram_jaccard", "simhash_neardups",
    "simhash_neardups_fast", "cosine_topk", "ann_topk", "quality_score",
    "fingerprint", "gml_decode", "pip_salted_shuffle",
]

ISOLATED = ["knn_cellring", "pip_salted_shuffle", "minhash_lsh", "minhash_lsh_fast"]


def timed(spark, sf_dir: str, name: str) -> float:
    df = q.QUERIES[name](spark, sf_dir)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark("ab_bench", master=f"local[{cpus}]")

    r1 = {name: timed(spark, sf_dir, name) for name in R1_ORDER}
    r2 = {name: timed(spark, sf_dir, name) for name in R2_ORDER}
    iso = {name: [timed(spark, sf_dir, name) for _ in range(2)] for name in ISOLATED}

    result = {
        "metric": "r1-vs-r2 suite A/B, one session, same host",
        "sf_dir": sf_dir, "cpus": int(cpus),
        "r1_suite": r1, "r1_total": round(sum(r1.values()), 3),
        "r2_suite": r2, "r2_total": round(sum(r2.values()), 3),
        "isolated_2pass": iso,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "AB_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
