"""Stream-static LSH near-dup detection (streaming/neardup_stream.py).

Cross-impl: the per-row Column signature path must reproduce the batch
explode+groupBy signature bit-for-bit; streaming: planted near-dups of
corpus docs must be flagged, fresh docs must not.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomatics_geotk_spark.operators import dedup
from geomatics_geotk_spark.streaming import neardup_stream


def _corpus_rows():
    # deterministic word-soup docs, 40 tokens each, mutually dissimilar
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(20):
        toks = [words[(i * 7 + j * (i + 3)) % len(words)] + str((i + j) % 13)
                for j in range(40)]
        rows.append((i, " ".join(toks)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus_rows(), "doc_id long, text string")


class TestColumnSignatureParity:
    def test_bands_match_batch_pipeline(self, spark, corpus):
        """minhash_bands (per-row folds, no aggregation) must emit the
        exact band set of the batch explode+groupBy path."""
        got = {
            (r["doc_id"], r["band"], r["band_hash"])
            for r in neardup_stream.minhash_bands(corpus).collect()
        }
        sig = dedup.minhash_signature(corpus)
        # batch band hashing: replicate via minhash_lsh_pairs internals —
        # band b joins lanes [b*4, b*4+4) with "," and xxhash64s
        rows_per_band = 32 // 8
        want = set()
        for r in sig.collect():
            mh = r["minhash"]
            for b in range(8):
                joined = ",".join(
                    str(mh[b * rows_per_band + j]) for j in range(rows_per_band)
                )
                bh = spark.sql(f"SELECT xxhash64('{joined}') AS h").collect()[0]["h"]
                want.add((r["doc_id"], b, bh))
        assert got == want


class TestArrowTwinParity:
    def test_arrow_bands_bit_identical(self, spark, corpus):
        """minhash_bands_arrow must reproduce the Column path's
        (doc_id, band, band_hash) rows exactly — including whitespace
        tokenization edge cases (leading/trailing/multiple spaces,
        short docs) and null-text filtering."""
        edge = spark.createDataFrame(
            [(100, "  leading space"), (101, "trailing space  "),
             (102, "a  b"), (103, "one"), (104, "two tok"),
             (105, None), (106, "")],
            "doc_id long, text string",
        )
        both = corpus.unionByName(edge)
        col_rows = {
            tuple(r) for r in neardup_stream.minhash_bands(both, hash_fn="md5").collect()
        }
        arrow_rows = {
            tuple(r) for r in neardup_stream.minhash_bands_arrow(both).collect()
        }
        assert arrow_rows == col_rows


class TestStreamingNearDup:
    def test_planted_neardups_flagged(self, spark, corpus, tmp_path):
        rows = _corpus_rows()
        near3 = rows[3][1].rsplit(" ", 1)[0] + " changed"   # ~1 token off doc 3
        copy7 = rows[7][1]                                   # exact copy of doc 7
        fresh = " ".join(f"unseen{j}word{j * j % 97}" for j in range(40))
        stream_rows = [(103, near3), (107, copy7), (200, fresh)]
        inp = str(tmp_path / "in")
        spark.createDataFrame(stream_rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(inp)

        index = neardup_stream.corpus_band_index(corpus)
        stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
        assert stream.isStreaming
        cand = neardup_stream.streaming_neardup_candidates(stream, index)
        q = (
            cand.writeStream.format("memory")
            .queryName("t_neardup")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["doc_id"], r["corpus_id"])
            for r in spark.sql("SELECT DISTINCT doc_id, corpus_id FROM t_neardup").collect()
        }
        assert (103, 3) in got, "near-dup of corpus doc 3 must be flagged"
        assert (107, 7) in got, "exact copy of corpus doc 7 must be flagged"
        assert not any(d == 200 for d, _ in got), "fresh doc must not match"

    def test_stream_plan_is_stateless_broadcast(self, spark, corpus, tmp_path):
        """The streaming side must contain no aggregation (stateless
        append) and join the index via broadcast."""
        inp = str(tmp_path / "in2")
        spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(inp)
        stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
        cand = neardup_stream.streaming_neardup_candidates(
            stream, neardup_stream.corpus_band_index(corpus)
        )
        plan = cand.explain(extended=False) or ""
        # explain() prints; use the logical plan string instead
        logical = cand._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in logical.split("Join")[0], (
            "stream side above the join must be aggregation-free"
        )
