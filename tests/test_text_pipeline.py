"""Decontamination + heavy-hitter boilerplate detection (operators/text.py).

Planted fixtures make the expected report analytic: eval docs share known
shingles with specific train docs; a boilerplate gram is stamped into a
known fraction of the corpus.
"""

import pytest

from geomatics_geotk_spark.operators import text


@pytest.fixture(scope="module")
def frames(spark):
    # eval set: two docs.  "alpha beta gamma delta" contributes shingles
    # {"alpha beta gamma", "beta gamma delta"}.
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "zeta eta theta")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            # full copy of eval doc 100 -> contamination 1.0 (2/2)
            (1, "alpha beta gamma delta"),
            # shares exactly one shingle ("alpha beta gamma") out of its 3
            (2, "alpha beta gamma omega pi"),
            # clean
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    return tr, ev


def test_contamination_report(frames):
    tr, ev = frames
    rows = {
        r["doc_id"]: r
        for r in text.contamination_report(tr, ev, shingle_n=3).collect()
    }
    assert set(rows) == {1, 2, 3}, "zero-hit docs must still be reported"
    assert rows[1]["n_shingles"] == 2 and rows[1]["contamination"] == 1.0
    assert rows[2]["n_shingles"] == 3 and rows[2]["n_contaminated"] == 1
    assert rows[2]["contamination"] == pytest.approx(1 / 3)
    assert rows[3]["n_contaminated"] == 0 and rows[3]["contamination"] == 0.0


def test_contamination_counts_distinct_doc_grams_once(spark):
    # repeated occurrences of a contaminated gram inside one doc count
    # once: shingles are per-doc DISTINCT
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "a b c x a b c")], "doc_id long, text string"
    )
    row = text.contamination_report(tr, ev, shingle_n=3).collect()[0]
    assert row["n_contaminated"] == 1


@pytest.mark.parametrize("kw", [{"min_df": 3}, {"rel_df": 0.5}])
def test_heavy_hitter_shingles(spark, kw):
    # boilerplate gram "click here now" planted in 3 of 5 docs (df=3);
    # every other gram is unique -> both the absolute (>=3) and the
    # relative (>=0.5*5=2.5) threshold select exactly the planted gram
    docs = spark.createDataFrame(
        [
            (1, "click here now foo"),
            (2, "bar click here now"),
            (3, "click here now baz qux"),
            (4, "plain text row four"),
            (5, "plain other row five"),
        ],
        "doc_id long, text string",
    )
    out = text.heavy_hitter_shingles(docs, shingle_n=3, **kw).collect()
    assert {(r["shingle"], r["df"]) for r in out} == {("click here now", 3)}


def test_heavy_hitter_requires_exactly_one_threshold(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.heavy_hitter_shingles(docs)
    with pytest.raises(ValueError):
        text.heavy_hitter_shingles(docs, min_df=2, rel_df=0.1)
