"""Streaming near-duplicate detection: stream-static LSH.

The batch minhash pipeline (``operators/dedup.py``) computes signatures
with explode + groupBy — an aggregation, which an append-mode streaming
plan cannot run statelessly.  Here the signature is a pure per-row
Column program (one base-hash fold plus 32 affine ``array_min`` lanes
over the shingle array), so the stream stays stateless end to end:

    scan → project (signature) → explode bands → stream-static
    equi-join against the corpus band index

Signatures and band hashes are bit-identical to the batch path — same
base hash (:func:`operators.dedup._base_hash`), affine lane params
(:func:`operators.dedup.minhash_lane_params`), and band concat — so the
static index can be built either by this module or by the batch
pipeline; a cross-impl test asserts equality.

100 TB shape: the corpus index is (corpus_id, band, band_hash) — longs
only, ~3 rows per corpus doc at 8 bands after bucket capping.  For a
dimension-sized reference corpus it broadcasts (each micro-batch joins
map-side, zero stream shuffle); for a corpus-scale index, drop the
broadcast hint and Spark shuffles only the micro-batch side against a
pre-partitioned static side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_P,
    _base_hash,
    _shingles_of_tokens,
    cap_buckets,
    minhash_lane_params,
)


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_col, band, band_hash) via per-row Column folds — NO
    aggregation, so it runs identically on static and streaming
    DataFrames (and shuffle-free in batch).  Shingle-free docs (null
    text) are filtered out, matching the batch LSH path's contract.
    """
    rows_per_band = n_hashes // bands
    out = (
        df.withColumn("_toks", F.split(F.col(text_col), r"\s+"))
        .withColumn("_sh", _shingles_of_tokens(F.col("_toks"), shingle_n))
        .withColumn("_b", F.transform("_sh", lambda s: _base_hash(s, hash_fn)))
    )
    def _affine(a: int, b: int):
        # closure factory: F.transform requires a 1- or 2-arg lambda, so
        # the lane params can't ride in as default args
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    lanes = []
    for i in range(n_hashes):
        a, b = minhash_lane_params(i)
        lanes.append(F.array_min(F.transform("_b", _affine(a, b))))
    out = out.withColumn("_mh", F.array(*lanes)).where(
        F.element_at("_mh", 1).isNotNull()
    )
    band_structs = []
    for b in range(bands):
        joined = F.concat_ws(
            ",",
            *[
                F.element_at("_mh", b * rows_per_band + j + 1).cast("string")
                for j in range(rows_per_band)
            ],
        )
        if hash_fn == "md5":
            bh = F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{b}:"), joined)), 1, 15), 16, 10
            ).cast("long")
        else:
            bh = F.xxhash64(joined)
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bh.alias("band_hash"))
        )
    return (
        out.withColumn("bb", F.explode(F.array(*band_structs)))
        .select(id_col, "bb.band", "bb.band_hash")
    )


def corpus_band_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 10_000,
    **kw,
) -> DataFrame:
    """Static LSH index over the reference corpus, renamed to
    ``corpus_id`` and hot-bucket capped (a degenerate boilerplate bucket
    would otherwise match every incoming doc)."""
    idx = minhash_bands(corpus, text_col, id_col, **kw).withColumnRenamed(
        id_col, "corpus_id"
    )
    if max_bucket is not None:
        idx = cap_buckets(idx, ["band", "band_hash"], max_bucket)
    return idx


def streaming_neardup_candidates(
    stream: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_index: bool = True,
    **kw,
) -> DataFrame:
    """Candidate (doc_id, corpus_id, band) matches for each incoming doc
    against the static corpus index — a stateless stream-static
    equi-join on (band, band_hash).  Raw band-level candidates are
    emitted (one row per shared band); dedup/aggregation is the
    downstream consumer's choice of output mode.
    """
    bands = minhash_bands(stream, text_col, id_col, **kw)
    idx = F.broadcast(index) if broadcast_index else index
    return bands.join(idx, ["band", "band_hash"]).select(
        id_col, "corpus_id", "band"
    )
