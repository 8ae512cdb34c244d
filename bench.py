#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "docs_per_sec": <flagship throughput>, "flagship_docs": N}

The flagship measures the north-rule pipeline — interleaved documents →
geo-span decode → Z-order tile assignment → broadcast point-in-polygon
join — over SPARK_GRAFT_BENCH_DOCS synthesized interleaved docs
(deterministic, generated distributed via spark.range; no external data).
Every timed query is forced through a noop sink so projection pruning
can't skip work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomatics_geotk_spark import queries as q
from geomatics_geotk_spark.operators import spatial_join
from geomatics_geotk_spark.session import get_spark
from geomatics_geotk_spark.sources.documents import synth_documents, zones_table

BENCH_QUERIES = [
    "tile_assign",
    "interleaved_tile_pip",
    "pip_convex",
    "dwithin_exact",
    "knn_cellring",
    "zonal_stats",
    "envelope_agg",
    "temporal_during",
    "window_running",
    "pricing_summary",
    "revenue_by_nation",
    "minhash_lsh",
    "minhash_lsh_fast",
    "ngram_jaccard",
    "simhash_neardups",
    "simhash_neardups_fast",
    "cosine_topk",
    "ann_topk",
    "quality_score",
    "fingerprint",
    "gml_decode",
    "pip_salted_shuffle",
    # round-3 additions: the operators whose scale paths were rebuilt
    # (distributed zone prep + batch-vectorized DE-9IM refine)
    "geometry_join_lines",
    "dwithin_zones",
    # round-3 additions: training-data pipeline family (suite EXTENSION —
    # earlier queries keep their positions, so per-query diffs vs
    # BENCH_r01/r02 stay valid; the suite total is not comparable across
    # rounds and never was the headline metric)
    "decontaminate",
    "heavy_shingles",
    "repetition",
    "pii_scan",
    "curation_funnel",
    # the streaming-signature index build: arrow twin (the bulk path);
    # the pure-Column twin shares its oracle and is correctness-only
    "lsh_band_index_arrow",
    "vocab_topk",
    "tfidf_topk",
    "kmeans_clusters",
    # sketch family (suite extension, same position-preserving rule)
    "hll_distinct",
    "cms_vocab",
    "inverted_index",
    # graph / mixing family
    "pagerank",
    "budget_pack",
    # line-level dedup + context packing (suite extension)
    "line_dedup",
    "chunk_sliding",
    # substring self-similarity + interleaved span compaction
    "selfsim",
    "span_compact",
    # round-4 additions (suite extension, same position-preserving rule):
    # bloom-pruned join, BM25 retrieval, one-shuffle tile pyramid,
    # grouping-sets rollup, three-table top-k join
    "bloom_join",
    "bm25_topk",
    "tile_pyramid",
    "pricing_rollup",
    "shipping_priority",
    "order_priority_check",
    "ann_topk_int8",
    "customer_distribution",
    "top_supplier",
    "render_interleaved",
    # round-5 additions (suite extension, same position-preserving rule):
    # the composed IVF+int8 retrieval plan and the multi-table near-dup
    # join over the rotated adversarial fixture
    "ann_topk_ivf_int8",
    "embedding_neardups",
    "semantic_dedup",
    "group_quantiles",
    # trajectory family (late round-5 extension)
    "staypoints",
    "track_simplify",
    "od_matrix",
    "stay_zones",
    "speed_spikes",
    "simplify_error",
    "colocation",
    # closing round-5 relational shapes
    "waiting_suppliers",
    "idle_customers",
    # final round-5 extension: remaining TPC-H shapes, PQ retrieval,
    # A-ES weighted sampling, entropy QC, hull geodesic measure
    "small_quantity_revenue",
    "large_volume_customers",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "promo_revenue",
    "ann_topk_pq",
    "ann_topk_ivf_pq",
    "weighted_sample",
    "token_entropy",
    "hull_perimeter",
    "lm_logloss",
    "map_match",
    "pack_sequences",
    # continuation round-5 extension: raster focal stats, shoelace ring
    # measures, IDW interpolation, degree-ordered triangles, OHLC bars,
    # hotspot z-scores, bearing roses, and the Q6/Q10/Q11/Q16 shapes
    "focal_mean",
    "polygon_measures",
    "idw_interpolate",
    "triangle_counts",
    "ohlc_bars",
    "hotspot_cells",
    "bearing_histogram",
    "forecast_revenue",
    "returned_items",
    "important_parts",
    "supplier_part_counts",
    "geodesic_area",
    "event_funnel",
    "retention_cohorts",
    "source_overlap",
    "rolling_revenue",
    "customer_quartiles",
    "event_transitions",
    "embedding_stats",
    "resample_track",
    "geohash_cells",
    "zonal_weighted",
    "clustering_coeff",
    "robust_stats",
    "integrity_audit",
    "source_kl",
    "containment_pairs",
    "linestatus_priority",
    "dominant_suppliers",
    "heavy_hitters",
    "grid_clusters",
    "fuzzy_name_pairs",
    "track_cells",
    "pareto_parts",
    "kmv_vocab",
    "kmv_overlap",
    "scd2_build",
    "snapshot_diff",
    "moran_events",
    # round-5 final-session additions (suite EXTENSION — positions of
    # earlier queries preserved)
    "hotspot_gi",
    "rate_anomaly",
    "pmi_collocations",
    "basket_pairs",
    "quantile_calibration",
    "trend_test",
    "revenue_gini",
    "benford_audit",
    "kernel_density",
    "emerging_hotspots",
    "coverage_gaps",
    "cusum_alarm",
    "readability",
    "media_reuse",
    "attribution",
    "zonal_majority",
    "behavior_entropy",
    "hausdorff_routes",
    "voronoi_stats",
    "hex_bin",
    "acf_profile",
    "theil_sen",
    "cdc_apply",
    "common_neighbors",
    "token_bursts",
    "kcore",
    "ewma_chart",
    "haar_multires",
    "zipf_fit",
    "variogram",
    "gap_fill",
    "survival_km",
    "leadlag_xcorr",
    "path_trigrams",
    "mad_outliers",
    "anomaly_drilldown",
    "markov_stationary",
    "seasonality_profile",
    "assortativity",
    "audience_overlap",
    "series_peaks",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def flagship(spark, n_docs: int) -> float:
    """docs/sec for interleaved docs → decode → tile → pip join.

    Docs are materialized to parquet first (untimed setup): the north-rule
    workload reads a stored table of documents, so the measured pipeline is
    scan → decode → tile → join, not the synthetic generator's expression
    tree."""
    path = f"/tmp/spark_graft_bench_docs_{n_docs}.parquet"
    if not os.path.exists(path):
        # fixed 64 files regardless of the session's parallelism so every
        # cluster size gets enough input splits (8-file input caps a
        # 32-core run at 8 scan tasks and wrecks scaling)
        synth_documents(spark, n_docs, partitions=64).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    zones = zones_table(spark, grid=8)
    decoded = spatial_join.decode_geo_spans(docs)
    tiled = spatial_join.tile_assign(decoded, q.RES)
    joined = spatial_join.spatial_join(tiled, zones, res=q.RES, strategy="broadcast")
    out = joined.select("doc_id", "zone_id", "cell_id")
    t0 = time.time()
    _force(out)
    return n_docs / (time.time() - t0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", master=f"local[{cpus}]")
    # under spark-submit the submitted --master wins inside get_spark;
    # report the parallelism the session actually runs at, not the env
    # default (the scaling protocol reads "value" only, so this field is
    # purely diagnostic)
    cpus = spark.sparkContext.defaultParallelism

    if os.environ.get("SPARK_GRAFT_FLAGSHIP_ONLY") == "1":
        # scaling mode sizes by SPARK_GRAFT_BENCH_DOCS when the caller sets
        # it (scripts/scaling_bench.py always does); otherwise default to
        # the SAME 8M-doc workload as the flagship-of-record below, so the
        # two protocols measure the same job out of the box
        if "SPARK_GRAFT_BENCH_DOCS" not in os.environ:
            n_docs = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_DOCS", "8000000"))
        # scaling-evidence mode: one warm-up pass then N measured passes,
        # report the best — the sandbox VM's CPU availability swings 3-4x
        # between identical runs, so a single pass measures the noise, not
        # the engine (scripts/scaling_bench.py runs this at two
        # parallelism levels in separate JVMs)
        passes = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_PASSES", "5"))
        # TWO untimed warm-ups (r4 verdict item 5): the r4 pass lists were
        # still monotone after one, so the first timed pass was paying
        # residual JIT/page-cache cost and "best-of" partly measured the
        # luckiest tail; median is reported alongside max for the same
        # reason.
        flagship(spark, n_docs)
        flagship(spark, n_docs)
        rates = [flagship(spark, n_docs) for _ in range(passes)]
        med = sorted(rates)[len(rates) // 2]
        print(json.dumps({
            "metric": "flagship spatial-join+tile docs/sec",
            "value": round(max(rates), 1), "unit": "docs/sec",
            "value_median": round(med, 1),
            "all_passes": [round(r, 1) for r in rates],
            "flagship_docs": n_docs, "cpus": int(cpus),
        }))
        spark.stop()
        return

    # Per-query protocol: 1 untimed warm-up + best of 2 timed passes.
    # The r2→r3 controlled A/B (scripts/ab_bench.py, AB_BENCH.json) showed
    # the single-cold-pass protocol measured session/host noise, not the
    # engine: identical queries ran 2-4x slower on their first execution
    # of a session (JIT, Python-worker spin-up, page cache) and the
    # "regression" in BENCH_r02.json disappeared on any warm re-run.
    timed_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = q.QUERIES[name]
        _force(fn(spark, sf_dir))  # warm-up (untimed)
        best = float("inf")
        for _ in range(timed_passes):
            # time fn() + force together: iterative operators (pagerank,
            # kmeans) materialize eagerly via localCheckpoint INSIDE fn(),
            # so timing only the force would skip their real work; for
            # lazy queries fn() is plan construction (~ms, within noise)
            t0 = time.time()
            _force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # Flagship-of-record: warm-up + best-of-5 at 8M docs (matches the
    # SPARK_GRAFT_FLAGSHIP_ONLY scaling protocol).  Three rounds running,
    # the 2-pass/2M record (113k r3) contradicted the documented capacity
    # (719k) because one host-steal window wrecks a ~3-18s measurement;
    # best-of-5 over a longer run makes the official number measure the
    # engine (r3 verdict item 2).
    flagship_docs = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_DOCS", "8000000"))
    flagship_passes = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_PASSES", "5"))
    # TWO untimed warm-ups + median-alongside-max (r4 verdict item 5):
    # the r4 pass lists stayed monotone after one warm-up, so best-of
    # partly measured the luckiest tail; the median is robust to it.
    flagship(spark, flagship_docs)
    flagship(spark, flagship_docs)
    flagship_rates = [flagship(spark, flagship_docs) for _ in range(flagship_passes)]
    docs_per_sec = max(flagship_rates)
    docs_per_sec_median = sorted(flagship_rates)[len(flagship_rates) // 2]

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline-suite seconds (+ flagship spatial-join+tile docs/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(docs_per_sec, 1),
        "docs_per_sec_median": round(docs_per_sec_median, 1),
        "flagship_passes": [round(r, 1) for r in flagship_rates],
        "flagship_docs": flagship_docs,
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
