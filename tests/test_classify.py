"""Hashed Naive-Bayes classifier (functions/classify.py): behavioral
properties beyond the exact-oracle compare in test_extra_oracles.py.

Reference scope note: the reference's quality verdicts are rule-based
tri-states
(/root/reference/mlcast_dataset_validator/checks/data_vars/naming.py:45-158);
the trained bag-of-words filter (GPT-3 appendix A; CCNet,
arXiv:1911.00359) is the corpus-scale statistical generalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import classify


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()


def test_classifier_beats_chance(spark):
    """Overlapping-but-shifted class vocabularies (60% shared words,
    40% class-specific), balanced classes: accuracy must clear the 0.5
    majority baseline by a wide margin — the weights carry real
    signal, not just the prior. (The parquet fixture corpus shares ONE
    vocabulary across langs by construction, so it carries no
    text-predictable label; this synthesizes one deterministically.)"""
    import random

    rng = random.Random(42)
    shared = ["data", "table", "row", "scan", "join", "the"]
    pos_v = ["good", "fine", "great", "clean"]
    neg_v = ["bad", "junk", "spam", "noise"]
    rows = []
    for i in range(400):
        y = i % 2
        own = pos_v if y else neg_v
        words = [rng.choice(own if rng.random() < 0.4 else shared)
                 for _ in range(30)]
        rows.append((i, " ".join(words), y))
    df = spark.createDataFrame(rows, "id int, text string, y int")
    scored = classify.nb_score(df, "id", "text", F.col("y") == 1,
                               n_feat=1024, seed=7)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("pred") == (F.col("y") == 1))
              .cast("long")).alias("hit"),
    ).collect()[0]
    assert agg["hit"] / agg["n"] > 0.9


def test_score_partitioning_independent(docs):
    """With a fixed model the score is a pure per-row function: any
    partitioning yields identical integers."""
    model = classify.nb_fit(docs, "text", F.col("lang") == "en",
                            n_feat=512, seed=3)
    a = classify.nb_score(docs, "doc_id", "text", model=model)
    b = classify.nb_score(docs.repartition(7), "doc_id", "text", model=model)
    ra = sorted((r["doc_id"], r["score_q"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["score_q"]) for r in b.collect())
    assert ra == rb


def test_empty_and_null_text_fall_back_to_prior(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, None), (4, "xx yy")],
        "id int, text string")
    model = classify.nb_fit(df, "text", F.col("id") <= 1, n_feat=64, seed=0)
    out = classify.nb_score(df, "id", "text", model=model)
    got = {r["id"]: (r["score_q"], r["n_tokens"], r["pred"])
           for r in out.collect()}
    assert got[2] == (model.prior_q, 0, model.prior_q > 0)
    assert got[3] == (model.prior_q, 0, model.prior_q > 0)


def test_positive_vocab_scores_above_negative_vocab(spark):
    """Disjoint class vocabularies must separate cleanly: a doc of
    positive-class tokens scores higher than one of negative-class
    tokens, and both sides predict their own class."""
    train = spark.createDataFrame(
        [(i, "good fine great nice", 1) for i in range(10)]
        + [(100 + i, "bad awful spam junk", 0) for i in range(10)],
        "id int, text string, y int")
    model = classify.nb_fit(train, "text", F.col("y") == 1,
                            n_feat=512, seed=1)
    test = spark.createDataFrame(
        [(1, "good great"), (2, "awful junk")], "id int, text string")
    got = {r["id"]: (r["score_q"], r["pred"])
           for r in classify.nb_score(test, "id", "text",
                                      model=model).collect()}
    assert got[1][0] > got[2][0]
    assert got[1][1] is True and got[2][1] is False


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], "id int, text string")
    with pytest.raises(ValueError, match="NB_MAX_BUCKETS"):
        classify.nb_fit(df, "text", F.lit(True),
                        n_feat=classify.NB_MAX_BUCKETS + 1)
    with pytest.raises(ValueError, match="pos_cond"):
        classify.nb_score(df, "id", "text")
    with pytest.raises(ValueError, match="length"):
        classify.nb_score(df, "id", "text",
                          model=classify.NbModel([0] * 7, 0, 8, 0))


def test_scoring_plan_is_shuffle_free(docs):
    """With a persisted model, scoring adds ZERO Exchanges — the whole
    classifier is a map-side projection (the 10^12-row contract)."""
    model = classify.NbModel([0] * 1024, 5, 1024, 0)
    out = classify.nb_score(docs, "doc_id", "text",
                            model=model).select("doc_id", "score_q")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
