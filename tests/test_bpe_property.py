"""Three-way BPE property test: the distributed learner, the
pure-Python word-frequency reference, AND the DuckDB CTE oracle agree
on randomized corpora.

The third (DuckDB) leg exists because round 4's driver gate caught a
Spark-vs-oracle value divergence the two-way test could not: the
engines' regex DEFAULTS differ (Java ``\\s`` includes ``\\x0B``, RE2's
does not; Java ``.`` skips U+0085/U+2028/U+2029, RE2 skips only
``\\n``), so corpora containing those code points learned different
merges per engine. The alphabet here deliberately includes every one of
those divergence chars plus non-BMP, and tiny alphabets force heavy
pair-count ties (exercising the (count DESC, left ASC, right ASC)
tie-break), repeated-letter words exercise the leftmost-first
non-overlapping merge, and n_merges beyond what the corpus supports
exercises the min_count early-stop mirror in the SQL chain."""

from __future__ import annotations

import pytest
import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlcast_sourcedata_validator_spark.functions import bpe
from tests.test_bpe import py_bpe_learn, py_segment

# every cross-engine regex divergence char from the round-4 post-mortem:
# \x0b (Java \s splits it, RE2 doesn't),  /\x85 (RE2 . matches,
# Java . doesn't), \xa0 (word-internal unicode whitespace), non-BMP
_ALPHA = "abc\x0b \x85\xa0\U0001d11e"
_word = st.text(alphabet=_ALPHA, min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)

# deep tie cascades: words over {a,b} only, so ranks 3+ are decided
# purely by the tie-break and merged-symbol interactions
_tie_word = st.text(alphabet="ab", min_size=1, max_size=8)
_tie_corpus = st.lists(
    st.lists(_tie_word, min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=4)


def _duck_learn(corpus, n_merges, min_count):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(corpus)), "text": corpus}))
    rows = con.execute(bpe.bpe_learn_sql(
        "documents", "text", n_merges, min_count=min_count)).fetchall()
    con.close()
    return [(a, b, int(c)) for _, a, b, c in sorted(rows)]


def _three_way(spark, corpus, n_merges, min_count):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    model, vocab = bpe.bpe_learn(
        df, "text", n_merges=n_merges, min_count=min_count)
    want, want_words = py_bpe_learn(corpus, n_merges, min_count=min_count)
    assert model.merges == want, "spark != python"
    assert _duck_learn(corpus, n_merges, min_count) == want, \
        "duckdb != python"
    # the vocab table's final symbols agree word-for-word
    got_words = {r["w"]: r["s"].split(bpe.SYM_SEP)
                 for r in vocab.collect()}
    assert got_words == want_words
    # and segmentation of every doc agrees through the join path
    got_counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_tokenize(df, "doc_id", "text", vocab).collect()}
    for i, t in enumerate(corpus):
        seg = py_segment(t, model.merges)
        if seg:
            assert got_counts[i] == len(seg), (i, t)
        else:
            assert i not in got_counts


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus, n_merges=st.integers(min_value=1, max_value=6),
       min_count=st.integers(min_value=1, max_value=2))
@pytest.mark.slow
def test_bpe_three_way_on_adversarial_alphabet(
    spark, corpus, n_merges, min_count
):
    _three_way(spark, corpus, n_merges, min_count)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_tie_corpus, n_merges=st.integers(min_value=4, max_value=10))
def test_bpe_three_way_on_tie_cascades(spark, corpus, n_merges):
    _three_way(spark, corpus, n_merges, min_count=1)


# the exact round-4 divergence shapes, pinned as deterministic regressions
_REGRESSIONS = [
    ["aa\x0bab aa", "ab aa aa ab"],            # \x0B word-split parity
    ["xa xb xa xb xa", "xb xa xa"],            #   char-split parity
    ["pq\x85pq pq", "pq qp qp pq"],            # NEL char-split parity
    ["m\xa0n m\xa0n mn", "mn nm m\xa0n"],      # NBSP is word-internal
    ["ab ab"],                                 # early-stop floor mirror
]


def test_bpe_three_way_regressions(spark):
    for corpus in _REGRESSIONS:
        _three_way(spark, corpus, n_merges=3, min_count=1)
        _three_way(spark, corpus, n_merges=6, min_count=2)


def test_bpe_batched_equals_sequential(spark):
    """batch>1 merge selection (the disjoint-prefix rule) is EXACTLY the
    sequential algorithm — same merges, same counts, same vocab."""
    corpus = [
        "low lower lowest low low", "new newer newest new",
        "wide wider widest wide wide wide", "aaaaa aaaaa aaa",
        "ab ba ab ba aab", "xq xq zr zr zr mn mn mn mn",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    m1, v1 = bpe.bpe_learn(df, "text", n_merges=14, batch=1)
    m8, v8 = bpe.bpe_learn(df, "text", n_merges=14, batch=8)
    assert m1.merges == m8.merges
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v8.collect()))
    want, _ = py_bpe_learn(corpus, 14)
    assert m8.merges == want
