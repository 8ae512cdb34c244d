"""Property-style randomized checks: the Column-fold operators must
agree with plain-Python reference implementations on seeded random
inputs (one Spark pass over all cases — no per-example session cost).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from geomatics_geotk_spark.operators import text
from geomatics_geotk_spark.sources.documents import compact_adjacent_text_spans

WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _rand_docs(seed: int, n: int):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 40))))
        for i in range(n)
    ]


def test_chunk_sliding_matches_python_reference(spark):
    cases = _rand_docs(7, 200)
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    W, S = 5, 3
    got = {}
    for r in text.chunk_sliding(docs, window=W, stride=S).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_chunk_tokens"], r["chunk_md5"])
        )
    for doc_id, t in cases:
        toks = t.lower().split()
        n = len(toks)
        n_chunks = 1 if n <= W else (n - W + S - 1) // S + 1
        exp = []
        for c in range(n_chunks):
            chunk = toks[c * S : c * S + W]
            exp.append(
                (c, c * S + 1, len(chunk),
                 hashlib.md5(" ".join(chunk).encode()).hexdigest())
            )
        assert sorted(got[doc_id]) == exp, f"doc {doc_id}"


def test_span_compaction_matches_python_reference(spark):
    rng = random.Random(13)
    cases = []
    for i in range(200):
        spans = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.6:
                spans.append("text:" + " ".join(
                    rng.choice(WORDS) for _ in range(rng.randint(1, 3))))
            else:
                spans.append(f"media:media://blob/{rng.randint(0, 9)}")
        cases.append((i, spans))
    docs = spark.createDataFrame(cases, "doc_id long, spans array<string>")
    got = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id", compact_adjacent_text_spans(F.col("spans")).alias("c")
        ).collect()
    }

    def ref(spans):
        out = []
        for s in spans:
            if s.startswith("text:") and out and out[-1].startswith("text:"):
                out[-1] = out[-1] + " " + s[5:]
            else:
                out.append(s)
        return out

    for doc_id, spans in cases:
        assert got[doc_id] == ref(spans), f"doc {doc_id}: {spans}"


def test_dedup_lines_matches_python_reference(spark):
    cases = _rand_docs(29, 150)
    L = 2  # short lines + tiny vocab => plenty of cross-doc duplicates
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.dedup_lines(docs, line_tokens=L).collect()}

    lines_of = {}
    for doc_id, t in cases:
        toks = t.lower().split()
        lines_of[doc_id] = [
            " ".join(toks[i : i + L]) for i in range(0, len(toks), L)
        ]
    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for doc_id, lines in lines_of.items():
        for ln in lines:
            docs_per_line[ln].add(doc_id)
    dup = {ln for ln, ds in docs_per_line.items() if len(ds) >= 2}
    assert dup, "fixture must actually produce cross-doc duplicate lines"
    for doc_id, lines in lines_of.items():
        kept = [ln for ln in lines if ln not in dup]
        assert got[doc_id]["n_lines"] == len(lines)
        assert got[doc_id]["n_kept"] == len(kept)
        assert got[doc_id]["kept_md5"] == hashlib.md5(
            " ".join(kept).encode()
        ).hexdigest()
