"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step itself (image/audio libs) is NOT in this container, so the
pixel/sample work is stubbed behind a deterministic fake — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas iterator contract, partitioning of media work separate from
text work (media batches are fat, so fewer rows per Arrow batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, media_kind string, "
    "n_bytes long, content_hash string, oracle_hash string, "
    "width int, height int, duration_s double"
)

FEATURE_SCHEMA = "doc_id string, media_ref string, feature array<float>, decode_ok boolean"


def media_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Project (doc_id, media_ref) rows for every media span — the spans
    array itself is untouched on the main pipeline (invariant)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("media"))
        ).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))


def fetch_media_stub(df: DataFrame) -> DataFrame:
    """'Fetch' binary payloads for media refs — deterministic fake bytes
    (sha256 of the ref, repeated); real deployments swap in an object-store
    reader here.  Returns binary column ``payload``."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                hashlib.sha256(ref.encode()).digest() * 4 for ref in pdf["media_ref"]
            ]
            yield pdf.assign(payload=payloads)

    # fresh StructType: StructType.add mutates the DataFrame's cached schema
    from pyspark.sql import types as T

    schema = T.StructType(
        [*df.schema.fields, T.StructField("payload", T.BinaryType())]
    )
    return df.mapInPandas(gen, schema=schema)


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata from binary payloads (size, hash, fake dims).

    The width/height/duration here come from a deterministic fake decoder;
    the NotImplementedError path documents where a real codec plugs in.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                rows.append(_meta_row(doc_id, ref, payload))
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def _meta_row(doc_id, ref, payload: bytes) -> dict:
    """One metadata row from a payload.

    ``content_hash`` is sha256 of the PAYLOAD BYTES — the real content
    address, matching any external sha256 of the media (ADVICE r2: the
    hex-domain variant silently broke content addressing).
    ``oracle_hash`` is sha256 of the payload's HEX — fingerprint-
    equivalent but expressible in the DuckDB oracle, whose sha256 only
    accepts VARCHAR: sha256(repeat(sha256(ref), 4)).  The fake-decoder
    seed derives from oracle_hash so width/height/duration stay
    SQL-mirrorable.
    """
    h_bytes = hashlib.sha256(payload).hexdigest()
    h_hex = hashlib.sha256(payload.hex().encode()).hexdigest()
    seed = int(h_hex[:8], 16)
    return {
        "doc_id": doc_id,
        "media_ref": ref,
        "media_kind": ["image", "audio", "video"][seed % 3],
        "n_bytes": len(payload),
        "content_hash": h_bytes,
        "oracle_hash": h_hex,
        "width": 64 + seed % 1920,
        "height": 64 + (seed >> 8) % 1080,
        "duration_s": float(seed % 600) / 10.0,
    }


def decode_image(payload: bytes):  # pragma: no cover - real-codec seam
    """Real image decode seam — not available in this container."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "extract_media_features uses the deterministic fake instead"
    )


def extract_media_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature vectors from media payloads (Arrow-batched, numpy).

    Deterministic fake features (hash-seeded) standing in for a model
    forward pass; batch shape and schema are production-real.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                feats.append(rng.standard_normal(dim).astype(np.float32))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "feature": feats,
                "decode_ok": [True] * len(pdf),
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id string, media_ref string, width int, height int, "
    "pixels binary, resize_ok boolean"
)

FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_index int, frame_t_s double, "
    "frame binary"
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize decoded image payloads to (width, height) — Arrow-batched
    mapInPandas over (doc_id, media_ref, payload) rows.

    The pixel resample itself is a deterministic fake (the container has
    no image codec — :func:`decode_image` is the documented seam): output
    ``pixels`` is a hash-seeded byte grid of exactly width·height bytes,
    so downstream schema/size invariants (fixed-shape tensors per row)
    are production-real and testable.
    """
    n = width * height

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                seed = hashlib.sha256(payload).digest()
                reps = n // len(seed) + 1
                rows.append({
                    "doc_id": doc_id, "media_ref": ref,
                    "width": width, "height": height,
                    "pixels": (seed * reps)[:n], "resize_ok": True,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_s: float = 10.0,
                  max_frames: int = 8) -> DataFrame:
    """Sample video frames every ``every_s`` seconds (≤ ``max_frames``)
    from media payloads — one output row per (doc, frame).

    Frame timing derives from the (fake-decoded) duration in the
    metadata derivation, so row counts are deterministic and
    SQL-predictable; frame bytes are the hash-seeded stand-in for the
    codec seam.  Batch shape (explode inside mapInPandas — a fat binary
    row fans out WITHOUT a Spark explode of binary columns through a
    shuffle) is the production pattern.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                meta = _meta_row(doc_id, ref, payload)
                n = min(max_frames, int(meta["duration_s"] / every_s) + 1)
                base = hashlib.sha256(payload).digest()
                for i in range(n):
                    rows.append({
                        "doc_id": doc_id, "media_ref": ref,
                        "frame_index": i, "frame_t_s": i * every_s,
                        "frame": hashlib.sha256(base + i.to_bytes(4, "big")).digest(),
                    })
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "frame_index", "frame_t_s", "frame"]
            )

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)


def media_pipeline(docs: DataFrame, fused: bool = True) -> DataFrame:
    """media spans → fetch → metadata, repartitioned on media_ref so fat
    binary batches don't skew the text-processing partitions.

    ``fused=True`` runs fetch+metadata in ONE mapInPandas stage (one
    Arrow round-trip instead of two chained Python evals — the payload
    bytes never cross the JVM boundary); ``fused=False`` keeps the
    staged path for pipelines that persist raw payloads.
    """
    spark = docs.sparkSession
    spans = media_spans(docs).repartition(
        spark.sparkContext.defaultParallelism, "media_ref"
    )
    if not fused:
        return extract_media_metadata(fetch_media_stub(spans))

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                payload = hashlib.sha256(ref.encode()).digest() * 4
                rows.append(_meta_row(doc_id, ref, payload))
            yield pd.DataFrame(rows)

    return spans.mapInPandas(gen, schema=MEDIA_META_SCHEMA)
