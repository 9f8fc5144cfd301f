"""Distributed BPE vocabulary induction (functions/bpe.py): exact
parity with a pure-Python reference implementation, cross-path equality
(vocab-join vs literal-fold segmentation), and the DuckDB oracle chain
on the fixture corpus. The driver-style exact compare of the two extras
also runs in test_extra_oracles.py.
"""

from __future__ import annotations

import collections
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import bpe

# ---------------------------------------------------------------- reference


def py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def py_words(t):
    """The pinned word contract (see bpe.py module docstring): scrub
    chr(1), split on the EXPLICIT ASCII class, drop empties — Python's
    unicode-aware str.split() would diverge from both engines."""
    if not t:
        return []
    return [w for w in re.split("[ \t\n\x0b\f\r]+", t.replace("\x01", ""))
            if w]


def py_bpe_learn(texts, n_merges, min_count=2):
    freqs = collections.Counter(
        w for t in texts if t for w in py_words(t))
    words = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freqs[w]
        if not pairs:
            break
        # count DESC, left ASC, right ASC — the engine tie-break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        words = {w: py_merge(s, a, b) for w, s in words.items()}
    return merges, words


def py_segment(text, merges):
    toks = []
    for w in py_words(text):
        syms = list(w)
        for a, b, _ in merges:
            syms = py_merge(syms, a, b)
        toks.extend(syms)
    return toks


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "aaaaa aaaaa aaa",           # odd runs: leftmost-first pairing
    None,
    "   ",
    "low low lower new wide",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_learn_matches_python_reference(spark, corpus_df):
    model, _ = bpe.bpe_learn(corpus_df, "text", n_merges=12)
    want, _ = py_bpe_learn(CORPUS, 12)
    assert model.merges == want


def test_segment_expr_matches_python(spark, corpus_df):
    model, _ = bpe.bpe_learn(corpus_df, "text", n_merges=8)
    got = {
        r["doc_id"]: r["toks"]
        for r in corpus_df.select(
            "doc_id",
            bpe.bpe_segment_expr(F.col("text"), model).alias("toks"),
        ).collect()
    }
    for i, t in enumerate(CORPUS):
        assert got[i] == py_segment(t, model.merges), f"doc {i}"


def test_tokenize_matches_segment_expr(spark, corpus_df):
    """Vocab-join segmentation of the training corpus == literal-fold
    segmentation (two independent paths)."""
    model, vocab = bpe.bpe_learn(corpus_df, "text", n_merges=8)
    via_join = {
        r["doc_id"]: (r["n_bpe_tokens"], r["tokens_fp"])
        for r in bpe.bpe_tokenize(
            corpus_df, "doc_id", "text", vocab).collect()
    }
    toks = bpe.bpe_segment_expr(F.col("text"), model)
    via_expr = {
        r["doc_id"]: (r["n"], r["fp"])
        for r in corpus_df.select(
            "doc_id", F.size(toks).alias("n"),
            F.md5(F.array_join(toks, bpe.SYM_SEP)).alias("fp"))
        .where(F.size(toks) > 0).collect()
    }
    assert via_join == via_expr
    assert len(via_join) == 5  # NULL/blank docs drop out


def test_learn_sql_oracle_on_fixture(spark, sf_dir):
    """The full k-stage DuckDB learning chain reproduces bpe_learn
    bit-exactly on the real fixture corpus."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model, _ = bpe.bpe_learn(df, "text", n_merges=10)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    rows = con.execute(
        bpe.bpe_learn_sql("documents", "text", 10)).fetchall()
    want = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(model.merges)]
    assert sorted(rows) == want


def test_early_stop_and_guards(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    model, _ = bpe.bpe_learn(df, "text", n_merges=50)
    # 'a b' merges once (count 2); then the only pair count is < min_count
    assert model.merges == [("a", "b", 2)]
    with pytest.raises(ValueError):
        bpe.bpe_learn(df, "text", n_merges=0)
    big = bpe.BpeModel(merges=[("a", "b", 2)] * (bpe.BPE_MAX_EXPR_MERGES + 1))
    with pytest.raises(ValueError):
        bpe.bpe_segment_expr(F.col("text"), big)


def test_separator_scrubbed(spark):
    df = spark.createDataFrame(
        [(1, "ab\x01cd ab cd" )], "doc_id long, text string")
    model, _ = bpe.bpe_learn(df, "text", n_merges=2)
    for a, b, _ in model.merges:
        assert bpe.SYM_SEP not in a + b


@pytest.mark.slow
def test_learn_reliable_checkpoint_resume(spark, tmp_path):
    """checkpoint_dir makes the merge loop durable + resumable: a short
    run leaves committed word-table + merge-list parquet behind; a
    longer re-run with the same dir resumes from the last commit (the
    earlier commit is NOT recomputed — pinned via its _SUCCESS mtime)
    and matches the in-memory answer exactly."""
    import os

    corpus = [
        "low lower lowest low low", "new newer newest new",
        "wide wider widest wide wide wide", "aaaaa aaaaa aaa",
        "low low lower new wide",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    expect, _ = bpe.bpe_learn(df, "text", n_merges=10)
    ckpt = str(tmp_path / "bpe")

    # "interrupted" run: only 4 merges, committed every 2
    m4, _ = bpe.bpe_learn(df, "text", n_merges=4,
                          checkpoint_every=2, checkpoint_dir=ckpt)
    assert m4.merges == expect.merges[:4]
    assert os.path.exists(f"{ckpt}/round_0004/_SUCCESS")
    assert os.path.exists(f"{ckpt}/merges_0004/_SUCCESS")
    mtime_r2 = os.path.getmtime(f"{ckpt}/round_0002/_SUCCESS")

    # resume to 10: rounds 1-4 come from the store, not recomputation
    m10, vocab = bpe.bpe_learn(df, "text", n_merges=10,
                               checkpoint_every=2, checkpoint_dir=ckpt)
    assert m10.merges == expect.merges
    assert os.path.getmtime(f"{ckpt}/round_0002/_SUCCESS") == mtime_r2
    # the resumed vocab equals a fresh in-memory learn's vocab
    _, vmem = bpe.bpe_learn(df, "text", n_merges=10)
    assert sorted(map(tuple, vocab.collect())) == \
        sorted(map(tuple, vmem.collect()))

    # same-n re-run short-circuits entirely off the store
    rounds_before = sorted(d for d in os.listdir(ckpt))
    again, _ = bpe.bpe_learn(df, "text", n_merges=10,
                             checkpoint_every=2, checkpoint_dir=ckpt)
    assert again.merges == expect.merges
    assert sorted(d for d in os.listdir(ckpt)) == rounds_before
