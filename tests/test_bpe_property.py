"""Property test: the distributed BPE learner equals the pure-Python
word-frequency reference on randomized corpora (hypothesis drives
shapes; tiny alphabets force heavy pair-count ties, exercising the
(count DESC, left ASC, right ASC) tie-break; repeated-letter words
exercise the leftmost-first non-overlapping merge)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlcast_sourcedata_validator_spark.functions import bpe
from tests.test_bpe import py_bpe_learn, py_segment

_word = st.text(alphabet="abc", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus, n_merges=st.integers(min_value=1, max_value=6))
def test_bpe_learn_matches_reference_on_random_corpora(
    spark, corpus, n_merges
):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    model, vocab = bpe.bpe_learn(df, "text", n_merges=n_merges)
    want, want_words = py_bpe_learn(corpus, n_merges)
    assert model.merges == want
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
