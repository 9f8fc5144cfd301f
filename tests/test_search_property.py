"""Property test: BM25 scoring equals a brute-force Python reference on
randomized corpora (hypothesis drives doc shapes; one Spark action per
example, so examples are few but adversarial: empty docs, repeated
terms, terms absent from the corpus, single-doc corpora)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlcast_sourcedata_validator_spark.functions.search import (
    bm25_stats,
    bm25_topk,
)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)
_terms = st.lists(st.sampled_from(["alpha", "beta", "zzz"]), min_size=1,
                  max_size=3, unique=True)


def _reference(corpus, terms, k1=1.2, b=0.75):
    toks = [d.split() if d else [] for d in corpus]
    n = len(corpus)
    avgdl = sum(len(t) for t in toks) / n
    out = {}
    for i, ws in enumerate(toks):
        s = 0.0
        for t in terms:
            df = sum(1 for w in toks if t in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tf = ws.count(t)
            if avgdl > 0:
                s += (idf * tf * (k1 + 1)
                      / (tf + k1 * (1 - b + b * len(ws) / avgdl)))
        if s > 0:
            out[i] = s
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus, terms=_terms)
def test_bm25_matches_reference(spark, corpus, terms):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id int, text string")
    expected = _reference(corpus, terms)
    if all(not d for d in corpus):
        # degenerate all-empty corpus: avgdl == 0 -> operator scores
        # nothing by construction
        st_ = bm25_stats(df, terms)
        assert st_.avgdl == 0.0
        assert bm25_topk(df, terms, k=10, id_col="doc_id").collect() == []
        return
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(df, terms, k=len(corpus),
                              id_col="doc_id").collect()}
    assert set(got) == set(expected)
    for i, s in expected.items():
        assert abs(got[i] - s) <= 1e-9 * max(1.0, abs(s))
