"""Hashed bigram-LM perplexity scoring (functions/lm.py): behavioral
properties beyond the exact-oracle compare in test_extra_oracles.py.

Reference scope note: the reference scores payload quality with static
domain checks
(/root/reference/mlcast_dataset_validator/checks/data_vars/naming.py:45-158);
the CCNet-style trained scorer (arXiv:1911.00359) is the corpus-scale
statistical generalization of "does this payload look right".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import lm


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def scored(docs):
    return lm.lm_score(docs, "doc_id", "text", F.col("lang") == "en",
                       n_ctx=256, n_pair=4096, seed=7).localCheckpoint()


def test_training_slice_scores_lower_ppl(scored):
    """Mean perplexity of the training slice must be the minimum across
    languages — the fitted model should recognize its own distribution."""
    rows = (scored.where(F.col("n_bigrams") > 0)
            .groupBy("lang").agg(F.avg("ppl").alias("p")).collect())
    by_lang = {r["lang"]: r["p"] for r in rows}
    assert by_lang["en"] == min(by_lang.values())


def test_score_partitioning_independent(docs):
    """With fixed tables the score is a pure per-row function: any
    partitioning yields identical integers."""
    tables = lm.lm_fit(docs, "text", F.col("lang") == "en",
                       n_ctx=128, n_pair=1024, seed=3)
    a = lm.lm_score(docs, "doc_id", "text", n_ctx=128, n_pair=1024,
                    seed=3, tables=tables)
    b = lm.lm_score(docs.repartition(7), "doc_id", "text", n_ctx=128,
                    n_pair=1024, seed=3, tables=tables)
    ra = sorted((r["doc_id"], r["logprob_q"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["logprob_q"]) for r in b.collect())
    assert ra == rb


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, ""), (3, None)],
        "id int, text string")
    out = lm.lm_score(df, "id", "text", F.lit(True), n_ctx=64, n_pair=256,
                      seed=0)
    got = {r["id"]: (r["logprob_q"], r["n_bigrams"], r["ppl"])
           for r in out.collect()}
    assert got[2] == (0, 0, None) and got[3] == (0, 0, None)
    lp, n, ppl = got[1]
    assert n == 3 and lp < 0 and ppl is not None and ppl > 0


def test_seen_bigram_beats_unseen(spark):
    """A document made of trained bigrams must out-score one made of
    never-seen tokens (same length): counts actually flow into the
    tables."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "id int, text string")
    tables = lm.lm_fit(train, "text", None, n_ctx=64, n_pair=512, seed=1)
    test = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zzq qqz zqq")], "id int, text string")
    out = lm.lm_score(test, "id", "text", n_ctx=64, n_pair=512, seed=1,
                      tables=tables)
    got = {r["id"]: r["logprob_q"] for r in out.collect()}
    assert got[1] > got[2]


def test_bucket_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id int, text string")
    with pytest.raises(ValueError, match="LM_MAX_BUCKETS"):
        lm.lm_fit(df, "text", None, n_pair=lm.LM_MAX_BUCKETS + 1)
    with pytest.raises(ValueError, match="len n_pair"):
        lm.lm_score(df, "id", "text", n_ctx=4, n_pair=8,
                    tables=([0] * 7, [0] * 4))


def test_scoring_plan_is_shuffle_free(docs):
    """With persisted tables, scoring adds ZERO Exchanges — the whole
    scorer is a map-side projection (the 10^12-row contract)."""
    tables = ([0] * 1024, [0] * 128)
    out = lm.lm_score(docs, "doc_id", "text", n_ctx=128, n_pair=1024,
                      tables=tables).select("doc_id", "logprob_q")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
