"""BM25 search: exact agreement with a brute-force Python reference,
determinism, single-pass stats reuse, and the map-side plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.search import (
    Bm25Stats,
    bm25_stats,
    bm25_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick tour of spark sql aggregation"),
    (3, "lazy evaluation makes spark plans cheap"),
    (4, "the dog barked at the brown dog"),
    (5, "nothing relevant here at all"),
    (6, None),
    (7, ""),
    (8, "Quick QUICK quick"),  # case folding: tf('quick') == 3
]


def _brute(terms, k1=1.2, b=0.75):
    toks = {i: (t or "").lower().split() for i, t in DOCS}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    n = len(DOCS)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    df = {t: sum(1 for ws in toks.values() if t in ws) for t in terms}
    out = {}
    for i, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            out[i] = s
    return out, n, avgdl, df


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_bm25_matches_brute_force(spark, docs):
    terms = ["quick", "dog", "spark"]
    expected, n, avgdl, df = _brute(terms)
    st = bm25_stats(docs, terms)
    assert st.n_docs == n
    assert st.avgdl == pytest.approx(avgdl)
    assert st.df == df
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, terms, k=10).collect()}
    assert set(got) == set(expected)
    for i, s in expected.items():
        assert got[i] == pytest.approx(s, rel=1e-12)


def test_topk_order_and_ties(spark, docs):
    terms = ["quick"]
    rows = bm25_topk(docs, terms, k=3).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # repeated-term doc 8 (tf=3, short) must outrank single-tf docs
    assert rows[0]["doc_id"] == 8
    # deterministic rerun
    assert rows == bm25_topk(docs, terms, k=3).collect()


def test_precomputed_stats_skip_the_stats_scan(spark, docs):
    terms = ["dog"]
    st = bm25_stats(docs, terms)
    a = bm25_topk(docs, terms, k=5).collect()
    b = bm25_topk(docs, terms, k=5, stats=st).collect()
    assert a == b
    # degenerate stats: empty corpus scores nothing
    empty = Bm25Stats(n_docs=0, avgdl=0.0, df={})
    assert bm25_topk(docs, terms, k=5, stats=empty).collect() == []


def test_scoring_plan_is_map_side(spark, docs):
    """With precomputed stats the whole score+topk plan is one scan +
    TakeOrderedAndProject — no Exchange, no Join."""
    st = bm25_stats(docs, ["dog", "quick"])
    plan = bm25_topk(docs, ["dog", "quick"], k=3, stats=st)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in txt
    assert "Exchange" not in txt
    assert "Join" not in txt


def test_empty_terms_rejected(spark, docs):
    with pytest.raises(ValueError, match="term"):
        bm25_stats(docs, [])
