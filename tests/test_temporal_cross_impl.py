"""Cross-implementation + algebraic properties of the 13 ISO 19108
relations: the Column builders (functions.temporal_relation — what joins
use) must agree with the numpy kernel (kernels.temporal.relation_mask —
what golden tests verify), and converse pairs must mirror."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from geomatics_geotk_spark.functions import temporal_relation
from geomatics_geotk_spark.kernels import temporal as tk

RELS = [
    "Before", "After", "Meets", "MetBy", "Begins", "BegunBy", "Ends",
    "EndedBy", "During", "Contains", "Equals", "Overlaps", "OverlappedBy",
]
CONVERSES = [
    ("Before", "After"), ("Meets", "MetBy"), ("Begins", "BegunBy"),
    ("Ends", "EndedBy"), ("During", "Contains"), ("Overlaps", "OverlappedBy"),
    ("Equals", "Equals"),
]


def _random_pairs(n=400, seed=9):
    """Period/instant pairs with deliberate boundary collisions: draws on
    a coarse integer-hour grid so Meets/Begins/Equals cases actually occur."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600_000_000, "us")
    b1 = base + rng.integers(0, 48, n) * hour
    b2 = base + rng.integers(0, 48, n) * hour
    e1 = np.where(rng.random(n) < 0.25, np.datetime64("NaT"), b1 + rng.integers(0, 24, n) * hour)
    e2 = np.where(rng.random(n) < 0.25, np.datetime64("NaT"), b2 + rng.integers(0, 24, n) * hour)
    return b1, e1.astype("datetime64[us]"), b2, e2.astype("datetime64[us]")


def test_column_matches_kernel_all_relations(spark):
    b1, e1, b2, e2 = _random_pairs()
    pdf = pd.DataFrame({"b1": b1, "e1": e1, "b2": b2, "e2": e2})
    df = spark.createDataFrame(pdf)
    out = df.select(*[
        temporal_relation(r, F.col("b1"), F.col("e1"), F.col("b2"), F.col("e2")).alias(r)
        for r in RELS
    ]).toPandas()
    for r in RELS:
        want = tk.relation_mask(r, b1, e1, b2, e2)
        got = out[r].to_numpy()
        assert (got == want).all(), f"{r}: Column vs kernel mismatch"


def test_converse_pairs_mirror():
    b1, e1, b2, e2 = _random_pairs(seed=11)
    for r, conv in CONVERSES:
        fwd = tk.relation_mask(r, b1, e1, b2, e2)
        bwd = tk.relation_mask(conv, b2, e2, b1, e1)
        assert (fwd == bwd).all(), f"{r} is not the converse of {conv}"


def test_basic_relations_mutually_exclusive():
    """Before/After/Equals/During/Contains are pairwise exclusive on any
    pair (Meets-family overlaps Before-family boundaries by design in the
    reference's dispatch, so only the interior relations are checked)."""
    b1, e1, b2, e2 = _random_pairs(seed=13)
    masks = [tk.relation_mask(r, b1, e1, b2, e2)
             for r in ("During", "Contains", "Equals")]
    total = np.zeros(len(b1), dtype=int)
    for m in masks:
        total += m.astype(int)
    assert (total <= 1).all()
