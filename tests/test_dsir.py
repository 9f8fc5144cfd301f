"""DSIR importance resampling (functions/sampling.py): behavioral
properties beyond the exact-oracle compare in test_extra_oracles.py.

Reference scope note: the reference validator's sampling analog is the
bounded `_prepare_sample_slice`
(/root/reference/mlcast_dataset_validator/checks/tool_compatibility/cartopy.py:21-38);
DSIR is the corpus-scale data-SELECTION generalization (target-matched
importance weights, arXiv:2302.03169).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import sampling as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()


def test_target_slice_upweighted(spark, docs):
    """Mean weight of target-slice docs must exceed the non-target mean:
    the whole point of the log-likelihood-ratio weights."""
    w = S.dsir_weights(docs, "doc_id", "text", F.col("lang") == "en",
                       n_buckets=256, seed=7)
    row = w.agg(
        F.avg(F.when(F.col("lang") == "en", F.col("weight_q"))).alias("t"),
        F.avg(F.when(F.col("lang") != "en", F.col("weight_q"))).alias("r"),
    ).first()
    assert row["t"] > row["r"]


def test_weights_partitioning_independent(spark, docs):
    """Weights are a pure function of the row + the (deterministic)
    bucket distributions — any partitioning yields identical output."""
    lr = S.dsir_log_ratios(docs, "text", F.col("lang") == "en",
                           n_buckets=128, seed=3)
    a = S.dsir_weights(docs, "doc_id", "text", F.col("lang") == "en",
                       n_buckets=128, seed=3, log_ratios=lr)
    b = S.dsir_weights(docs.repartition(7), "doc_id", "text",
                       F.col("lang") == "en", n_buckets=128, seed=3,
                       log_ratios=lr)
    ra = sorted((r["doc_id"], r["weight_q"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["weight_q"]) for r in b.collect())
    assert ra == rb


def test_empty_and_null_text_weight_zero(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "id int, text string")
    lr = [5] * 64
    w = S.dsir_weights(df, "id", "text", F.lit(True), n_buckets=64,
                       seed=0, log_ratios=lr)
    got = {r["id"]: r["weight_q"] for r in w.collect()}
    assert got[2] == 0 and got[3] == 0
    assert got[1] == 10  # two tokens x lr=5


def test_bucket_guard(spark, docs):
    with pytest.raises(ValueError, match="DSIR_MAX_BUCKETS"):
        S.dsir_log_ratios(docs, "text", F.lit(True),
                          n_buckets=S.DSIR_MAX_BUCKETS + 1)
    with pytest.raises(ValueError, match="length"):
        S.dsir_weights(docs, "doc_id", "text", F.lit(True),
                       n_buckets=64, log_ratios=[0] * 63)


def test_resample_exact_k_and_deterministic(spark, docs):
    n = docs.count()
    k = min(50, n)
    a = S.dsir_resample(docs, "doc_id", "text", F.col("lang") == "en",
                        k=k, n_buckets=128, seed=3)
    b = S.dsir_resample(docs.repartition(5), "doc_id", "text",
                        F.col("lang") == "en", k=k, n_buckets=128, seed=3)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == k
    assert ids_a == ids_b
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(ids_a) <= all_ids


def test_low_temperature_tracks_weights(spark, docs):
    """As T -> 0 Gumbel-top-k degenerates toward argmax. The Gumbel
    noise spans ~[-3.1, +22] (u in (0,1]), so at T=1e-6 it can only
    reorder docs whose quantized weights differ by <= ~25 units: the
    selected weight multiset must match the exact top-k up to that
    boundary tolerance."""
    k, tol = 25, 50
    sel = S.dsir_resample(docs, "doc_id", "text", F.col("lang") == "en",
                          k=k, n_buckets=128, temperature=1e-6, seed=3)
    got = sorted((r["weight_q"] for r in sel.collect()), reverse=True)
    w = S.dsir_weights(docs, "doc_id", "text", F.col("lang") == "en",
                       n_buckets=128, seed=3)
    top = [r["weight_q"] for r in
           w.orderBy(F.col("weight_q").desc()).limit(k).collect()]
    assert len(got) == k
    # nothing selected below the exact k-th weight minus the noise band
    assert all(g >= top[-1] - tol for g in got)
    # and the selections agree exactly away from the boundary band
    for g, t in zip(got, top):
        assert abs(g - t) <= tol


def test_scoring_stage_is_map_side(spark, docs):
    """With precomputed log_ratios the scored plan must contain no
    Exchange: the whole weight expression rides the scan."""
    lr = S.dsir_log_ratios(docs, "text", F.col("lang") == "en",
                           n_buckets=64, seed=1)
    scored = S.dsir_weights(docs, "doc_id", "text", F.col("lang") == "en",
                            n_buckets=64, seed=1, log_ratios=lr)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- skew_profile / suggest_salts (skew.py) --------------------------------


def test_skew_profile_finds_planted_hot_key(spark):
    from mlcast_sourcedata_validator_spark.skew import (
        skew_profile, suggest_salts)

    base = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    hot = spark.range(0, 5000).select(
        F.lit(-1).alias("k"), (F.col("id") + 10_000).alias("v"))
    df = base.unionByName(hot)
    prof = skew_profile(df, ["k"], k=3).collect()
    assert prof[0]["k"] == -1 and prof[0]["n_rows"] == 5000
    assert prof[0]["share"] == round(5000 / 7000, 6)
    # 101 keys, mean ~69.3 rows -> hot key is ~72x the mean
    assert prof[0]["x_mean"] > 70
    assert all(r["n_rows"] == 20 for r in prof[1:])

    assert suggest_salts(df, ["k"], target_rows_per_task=1000) == 5
    assert suggest_salts(df, ["k"], target_rows_per_task=10_000) == 1
    empty = spark.createDataFrame([], "k int, v long")
    assert suggest_salts(empty, ["k"]) == 1


def test_hot_keys_check_verdicts(spark):
    """Declarative hot_keys check: PASS on balanced keys, WARNING with an
    actionable salting suggestion on a planted hot key, FAIL (exit 1)
    when the suite opts into gating."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    def suite(params):
        return CheckSuite("skew_t", [CheckSpec(
            "hot_keys", "hot_keys", "7.1 skew",
            "No conv_id may dominate the key distribution.", params)])

    balanced = spark.range(0, 3000).select(
        (F.col("id") % 100).cast("string").alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"))
    res = run_suite(RunContext(spark=spark, df=balanced,
                               suite=suite({"max_x_mean": 50.0}),
                               run_id="t1"))
    rows = res.report.results
    assert [r.status for r in rows] == ["PASS"]
    assert res.exit_code() == 0

    hot = balanced.unionByName(spark.range(0, 20000).select(
        F.lit("hotconv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx")))
    res2 = run_suite(RunContext(spark=spark, df=hot,
                                suite=suite({"max_x_mean": 50.0}),
                                run_id="t2"))
    r2 = res2.report.results
    assert [r.status for r in r2] == ["WARNING"]
    assert "hotconv=20000" in r2[0].detail
    assert "n_salts" in r2[0].detail
    assert res2.exit_code() == 0  # WARNING does not gate

    res3 = run_suite(RunContext(
        spark=spark, df=hot, run_id="t3",
        suite=suite({"max_x_mean": 50.0, "severity": "FAIL"})))
    assert [r.status for r in res3.report.results] == ["FAIL"]
    assert res3.exit_code() == 1

    with pytest.raises(ValueError, match="severity"):
        run_suite(RunContext(spark=spark, df=hot, run_id="t4",
                             suite=suite({"severity": "NOPE"})))


def test_resample_plan_is_take_ordered(spark, docs):
    """With precomputed log_ratios, dsir_resample must execute as
    TakeOrderedAndProject (per-partition heaps + driver merge) — no
    global sort, no Exchange before the top-k."""
    lr = S.dsir_log_ratios(docs, "text", F.col("lang") == "en",
                           n_buckets=64, seed=1)
    sel = S.dsir_resample(docs, "doc_id", "text", F.col("lang") == "en",
                          k=10, n_buckets=64, seed=1, log_ratios=lr)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


# --- duplicate_spans (functions/dedup.py) -----------------------------------


@pytest.mark.slow
def test_duplicate_spans_winnowed_subset_and_guarantee(spark, docs):
    from mlcast_sourcedata_validator_spark.functions import dedup as D

    L, w = 60, 8
    exact = {(r["doc_id"], r["pos"])
             for r in D.duplicate_spans(docs, "doc_id", "text",
                                        min_len=L).collect()}
    winn = [(r["doc_id"], r["pos"])
            for r in D.duplicate_spans(docs, "doc_id", "text",
                                       min_len=L, winnow=w).collect()]
    assert set(winn) <= exact
    # winnowing emits ~2/(w+1) of positions; allow a wide band
    assert len(winn) < 0.6 * len(exact)

    # coverage guarantee: a shared substring of length >= L + w - 1 at
    # DIFFERENT offsets must be caught in both documents (content-defined
    # selection is offset-independent)
    shared = "x" * (L + w - 1)
    d2 = spark.createDataFrame(
        [(1, "short head " + shared + " tail one"),
         (2, "a much longer and different prefix " + shared + " other")],
        "doc_id long, text string")
    got = {r["doc_id"]
           for r in D.duplicate_spans(d2, "doc_id", "text",
                                      min_len=L, winnow=w).collect()}
    assert got == {1, 2}


def test_duplicate_spans_edges(spark):
    from mlcast_sourcedata_validator_spark.functions import dedup as D

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "tiny"), (4, "A" * 100), (5, "A" * 100)],
        "doc_id long, text string")
    out = D.duplicate_spans(df, "doc_id", "text", min_len=40).collect()
    # only the two identical long docs produce spans
    assert {r["doc_id"] for r in out} == {4, 5}
    # doc 4 and 5: every window duplicated; same-content windows WITHIN a
    # doc also count toward n_occ ("anywhere in the corpus")
    assert all(r["n_occ"] >= 2 for r in out)

    with pytest.raises(ValueError, match="winnow"):
        D.duplicate_spans(df, "doc_id", "text", min_len=40, winnow=1)


def test_excise_spans_matches_python_reference(spark):
    """excise_spans output must equal an independent pure-Python
    implementation of the same semantics (window counts -> spans ->
    interval merge -> cut -> space-joined reassembly)."""
    from collections import Counter

    from mlcast_sourcedata_validator_spark.functions import dedup as D

    L = 12
    boiler = "SHARED-BOILERPLATE-SEGMENT-123456"  # > L chars
    rows = [
        (1, f"alpha start {boiler} middle unique one {boiler} end"),
        (2, f"{boiler} leading copy with a different tail here"),
        (3, "completely unique document with no repeats at all x"),
        (4, None),
        (5, ""),
        (6, boiler),  # exactly the duplicated content
    ]
    texts = {i: t for i, t in rows}

    # --- python reference ---
    wins = Counter()
    for _, t in rows:
        if t:
            for p in range(len(t) - L + 1):
                wins[t[p:p + L]] += 1

    def ref_clean(t):
        if t is None:
            return None, None
        pos = [p + 1 for p in range(max(len(t) - L + 1, 0))
               if wins[t[p:p + L]] >= 2]
        if not pos:
            return t, 0
        ivs = []
        for p in pos:
            if ivs and p <= ivs[-1][1] + 1:
                ivs[-1][1] = max(ivs[-1][1], p + L - 1)
            else:
                ivs.append([p, p + L - 1])
        segs, prev = [], 1
        for s, e in ivs:
            segs.append(t[prev - 1:s - 1])
            prev = e + 1
        segs.append(t[prev - 1:])
        cleaned = " ".join(x for x in segs if x)
        return cleaned, sum(e - s + 1 for s, e in ivs)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = D.duplicate_spans(df, "doc_id", "text", min_len=L)
    out = {r["doc_id"]: (r["text"], r["n_excised_chars"])
           for r in D.excise_spans(df, spans, "doc_id", "text",
                                   min_len=L).collect()}
    for i, t in texts.items():
        assert out[i] == ref_clean(t), f"doc {i}: {out[i]!r}"
    # unique doc passes through untouched
    assert out[3] == (texts[3], 0)


def test_json_validity_check(spark):
    """json_validity: malformed payloads, missing required keys, and the
    nullable switch all verdict correctly and produce violation rows."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    rows = [
        ("c1", 0, "2026-01-01 00:00:00", '{"a": "1", "b": "2"}'),
        ("c2", 0, "2026-01-01 00:00:01", '{"a": "1"}'),   # missing key b
        ("c3", 0, "2026-01-01 00:00:02", 'not json at all'),  # malformed
        ("c4", 0, "2026-01-01 00:00:03", None),           # NULL
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def suite(params):
        return CheckSuite("j", [CheckSpec(
            "json_validity", "json_validity", "8.1 payloads",
            "props must be valid JSON.", params)])

    res = run_suite(RunContext(
        spark=spark, df=df, run_id="j1",
        suite=suite({"column": "props", "required_keys": ["b"]})))
    assert res.exit_code() == 1
    viol = {(v["conv_id"], v["detail"])
            for v in res.violations.collect()}
    assert len(viol) == 2  # c2 missing key, c3 malformed; NULL allowed
    assert any("not valid JSON" in d for _, d in viol)
    assert any("required key" in d for _, d in viol)

    res2 = run_suite(RunContext(
        spark=spark, df=df, run_id="j2",
        suite=suite({"column": "props", "nullable": False,
                     "max_violations": 10, "severity": "WARNING"})))
    # 2 violations (c3 malformed + c4 NULL) <= 10 allowed -> PASS
    assert res2.exit_code() == 0
    [r] = res2.report.results
    assert r.status == "PASS" and "2 rows" in r.detail
