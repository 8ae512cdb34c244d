"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k entirely in JVM Column math
(zip_with + aggregate — no Python in the row path).  Scale path:
LSH bucketing via deterministic random-hyperplane signs (signed
projections), turning top-k into a bucket equi-join + local top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, vec_a: str, vec_b: str, out: str = "cosine") -> DataFrame:
    """cosine(a,b) as pure Column math (JVM, codegen)."""
    a, b = F.col(vec_a), F.col(vec_b)
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def brute_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", q_id_col: str = "q_id",
               vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is the small side (broadcast); the corpus streams through a
    single map stage — dot products in JVM, then a per-query window top-k.
    Ties broken by corpus id for determinism.
    """
    q = queries.select(
        F.col(q_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = embeddings.join(F.broadcast(q)).withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("_qvec")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding", dim: int = 64,
                    n_planes: int = 12, seed: int = 42, out: str = "bucket") -> DataFrame:
    """Signed-projection LSH bucket id (int) per vector — Arrow/numpy batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        return pd.Series(
            (signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1).astype(np.int32)
        )

    return df.withColumn(out, bucket(F.col(vec_col)))


def ann_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", q_id_col: str = "q_id",
             vec_col: str = "embedding", dim: int = 64, n_planes: int = 10,
             probes: int = 1) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, local cosine top-k.

    ``probes`` > 1 additionally probes buckets at Hamming distance 1 from
    the query bucket (multi-probe LSH) to raise recall without touching
    the corpus-side layout.  Corpus shuffle: one exchange on bucket (or
    bucketed-table co-location on a real cluster — zero exchange).
    """
    corpus = with_lsh_bucket(embeddings, vec_col, dim, n_planes, out="bucket")
    q = with_lsh_bucket(queries, vec_col, dim, n_planes, out="bucket")
    if probes > 1:
        flips = F.array(*(
            [F.col("bucket")]
            + [F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        ))
        q = q.withColumn("bucket", F.explode(F.slice(flips, 1, probes)))
    q = q.select(F.col(q_id_col), F.col(vec_col).alias("_qvec"), "bucket")
    scored = corpus.join(q, "bucket").withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("_qvec", "bucket")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucket self-join."""
    c = with_lsh_bucket(embeddings, vec_col, dim, n_planes, out="bucket")
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    pairs = pairs.withColumn(
        "cosine", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    return pairs.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
