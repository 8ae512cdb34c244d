"""Text-analysis operators for training-data pipelines — all pure Column
expressions (JVM, whole-stage codegen; no Python in the row path).

language-ID (stopword-marker heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace + a
BPE-ish regex), and rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker sets (deterministic heuristic; the goal is a
# reproducible operator shape, not linguistic accuracy).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "est", "les"],
    "de": ["der", "die", "und", "ist", "das"],
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    toks = _tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens_ws", F.size(toks))
        .withColumn("n_tokens_bpe", F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_ISH), 0)))
        .withColumn("n_chars_calc", F.length(text_col))
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    """Number of tokens that are in the marker set (counts repeats)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language id: argmax marker-hit count, ties → 'und'.

    Adds ``lang_pred`` and per-language hit counts.
    """
    toks = _tokens(F.col(text_col))
    out = df
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(f"hits_{lang}", _marker_hits(toks, markers))
    hit_cols = [F.col(f"hits_{lang}") for lang in LANG_MARKERS]
    best = F.greatest(*hit_cols)
    pred = F.lit("und")
    # reversed so earlier languages win ties (deterministic)
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", F.when(best > 0, pred).otherwise(F.lit("und")))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features + a
    composite [0,1] score (monotone, deterministic)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("double")
    en_stops = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stops, t))).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality_score", score)
    )


FP_MOD = 1 << 40  # keeps acc*31 + h inside long range under ANSI math


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     hash_fn: str = "xxhash64") -> DataFrame:
    """Rolling polynomial hash over tokens:
    ``acc = (acc*31 + (h(token) mod M)) mod M`` folded left via
    ``aggregate`` — order-sensitive (a true document fingerprint, not a
    bag hash) and overflow-free under ANSI arithmetic.

    hash_fn: 'xxhash64' (fast JVM path, default) or 'md5' (first 15 hex
    chars → long — exactly reproducible in a DuckDB oracle via
    ``('0x'||substr(md5(t),1,15))::BIGINT``).
    """
    toks = _tokens(F.col(text_col))
    if hash_fn == "xxhash64":
        h = lambda t: F.pmod(F.xxhash64(t), F.lit(FP_MOD))  # noqa: E731
    elif hash_fn == "md5":
        h = lambda t: F.pmod(  # noqa: E731
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"), F.lit(FP_MOD)
        )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long") + h(t), F.lit(FP_MOD)),
    )
    return df.withColumn("fingerprint", fp)
