"""Sampled validation: determinism, conversation atomicity, FAIL
monotonicity, certificate math, and the inconclusive path."""

import math

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.sampling import hash_uniform
from mlcast_sourcedata_validator_spark.report import PASS, WARNING
from mlcast_sourcedata_validator_spark.sampled import (
    rate_upper_bound,
    required_sample_units,
    run_suite_sampled,
)
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
    inject_violations,
)


@pytest.fixture(scope="module")
def clean(spark):
    return generate_transcripts(spark, n_convs=400, seed=7).localCheckpoint()


def _ctx(spark, df, **kw):
    reg = generate_conversations_registry(df)
    return RunContext(spark=spark, df=df, suite=get_suite("transcripts_v1"),
                      run_id="sampled-t", registry_df=reg, **kw)


def test_rate_upper_bound_math():
    # rule of three at delta=0.05: -ln(0.05)/n
    assert rate_upper_bound(0, 1000, 0.05) == pytest.approx(
        -math.log(0.05) / 1000)
    # Hoeffding at k>0
    assert rate_upper_bound(5, 1000, 0.05) == pytest.approx(
        5 / 1000 + math.sqrt(math.log(20) / 2000))
    # no evidence bounds nothing; bounds clamp to 1
    assert rate_upper_bound(0, 0) == 1.0
    assert rate_upper_bound(50, 10) == 1.0
    # required units inverts the k=0 bound
    n = required_sample_units(1e-3, 0.05)
    assert rate_upper_bound(0, n, 0.05) <= 1e-3
    assert rate_upper_bound(0, n - 1, 0.05) > 1e-3


def test_sample_is_deterministic_and_conversation_atomic(spark, clean):
    res1 = run_suite_sampled(_ctx(spark, clean), fraction=0.5, seed=3)
    res2 = run_suite_sampled(_ctx(spark, clean), fraction=0.5, seed=3)
    assert res1.n_convs_sampled == res2.n_convs_sampled
    assert res1.result.n_input_rows == res2.result.n_input_rows
    # conversation atomicity: every sampled conversation keeps ALL its
    # turns — per-conv turn counts in the sample equal the originals
    sampled = clean.where(hash_uniform(F.col("conv_id"), 3) < 0.5)
    full_counts = clean.groupBy("conv_id").count()
    samp_counts = sampled.groupBy("conv_id").count()
    joined = samp_counts.alias("s").join(
        full_counts.alias("f"), "conv_id")
    assert joined.where("s.count <> f.count").count() == 0
    # a different seed picks a different conversation set
    other = clean.where(hash_uniform(F.col("conv_id"), 4) < 0.5)
    assert (sampled.select("conv_id").distinct().exceptAll(
        other.select("conv_id").distinct()).count() > 0)


def test_fail_monotonicity(spark, clean):
    """A violation lands in the sampled report iff its conversation is
    sampled in — and a sampled FAIL is always a true FAIL."""
    dirty, expected = inject_violations(clean, k=5, seed=7)
    bad_convs = {c for pairs in expected.values() for c, _ in pairs}
    # pick a fraction/seed split that has at least one bad conv on each side
    seed = 11
    rows = (clean.select("conv_id").distinct()
            .withColumn("u", hash_uniform(F.col("conv_id"), seed))
            .collect())
    u = {r["conv_id"]: r["u"] for r in rows}
    inside = {c for c in bad_convs if u[c] < 0.5}
    outside = bad_convs - inside
    assert inside and outside, "fixture split degenerate; change seed"

    reg = generate_conversations_registry(dirty)
    ctx = RunContext(spark=spark, df=dirty, suite=get_suite("transcripts_v1"),
                     run_id="sampled-d", registry_df=reg)
    sres = run_suite_sampled(ctx, fraction=0.5, seed=seed)
    # violations found in the sample are exactly the full run's
    # violations restricted to sampled-in conversations
    got = {(r["check_id"], r["conv_id"], r["turn_idx"])
           for r in sres.result.violations.collect()}
    assert got, "sampled run found no violations despite bad convs inside"
    assert all(u[c] < 0.5 for _, c, _ in got)
    # every sampled violating conv is a genuinely bad conv
    assert {c for _, c, _ in got} <= bad_convs


def test_certificate_pass_and_inconclusive(spark, clean):
    # generous target: ~200 sampled convs certify rate <= ln(20)/200 ~ 0.015
    res = run_suite_sampled(_ctx(spark, clean), fraction=0.5, seed=3,
                            certify_rate=0.05)
    assert res.certifications, "no row-check certificates produced"
    clean_certs = [c for c in res.certifications if c.k_convs == 0]
    assert clean_certs and all(c.certified for c in clean_certs)
    rep = res.report
    cert_rows = [r for r in rep.results if r.section == "sampling"]
    assert cert_rows and all(r.status == PASS for r in cert_rows
                             if "NOT certifiable" not in r.detail)
    # strict target that C=~200 cannot certify -> WARNING, not PASS
    res2 = run_suite_sampled(_ctx(spark, clean), fraction=0.5, seed=3,
                             certify_rate=1e-6)
    rep2 = res2.report
    warn_rows = [r for r in rep2.results if r.section == "sampling"]
    assert warn_rows and all(r.status == WARNING for r in warn_rows)
    assert any("needs" in r.detail for r in warn_rows)
    # the base verdicts are untouched by certification strictness
    base1 = [(r.requirement, r.status) for r in rep.results
             if r.section != "sampling"]
    base2 = [(r.requirement, r.status) for r in rep2.results
             if r.section != "sampling"]
    assert base1 == base2


def test_scale_estimates_unbiased_shape(spark, clean):
    res = run_suite_sampled(_ctx(spark, clean), fraction=0.5, seed=3)
    # 400 convs at fraction 0.5: estimate within a loose CLT band
    assert 300 <= res.est_total_convs <= 500
    assert res.est_total_rows == res.result.n_input_rows / 0.5


def test_violations_limit_rejected(spark, clean):
    ctx = _ctx(spark, clean, violations_limit=10)
    with pytest.raises(ValueError, match="uncapped"):
        run_suite_sampled(ctx, fraction=0.5)


def test_bad_fraction_rejected(spark, clean):
    with pytest.raises(ValueError, match="fraction"):
        run_suite_sampled(_ctx(spark, clean), fraction=0.0)


def test_sample_filter_is_below_the_window_exchange(spark, clean):
    """Plan pin: the hash-sample predicate evaluates in the scan stage,
    before the conv_id window Exchange — the full table is never
    shuffled to be discarded afterwards."""
    from mlcast_sourcedata_validator_spark.compiler import (
        build_suite_plan, compile_suite)
    sdf = clean.where(hash_uniform(F.col("conv_id"), 3) < 0.5)
    ctx = _ctx(spark, sdf)
    cs = compile_suite(ctx.suite)
    plan = build_suite_plan(ctx, cs, observe=False)
    txt = plan.violations._jdf.queryExecution().executedPlan().toString()
    ex = txt.find("Exchange")
    flt = txt.find("md5")
    assert ex != -1 and flt != -1
    # executedPlan prints top-down: the scan-side filter appears AFTER
    # (deeper than) the exchange in the dump
    assert flt > ex
