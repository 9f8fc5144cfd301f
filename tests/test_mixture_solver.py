"""solve_mixture / mixture_plan: rates that realize a target training
mix under a budget (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions.sampling import (
    mixture_plan,
    sample_by_mixture,
    solve_mixture,
)


def test_solve_mixture_binding_group():
    """Without a budget, the scarcest group relative to its share binds:
    books (1k avail, 50% share) caps the mix at 2k total output."""
    avail = {"books": 1_000.0, "web": 100_000.0, "code": 10_000.0}
    rates, budget = solve_mixture(avail, {"books": 0.5, "web": 0.3,
                                          "code": 0.2})
    assert budget == pytest.approx(2_000.0)
    assert rates["books"] == pytest.approx(1.0)
    assert rates["web"] == pytest.approx(2_000 * 0.3 / 100_000)
    assert rates["code"] == pytest.approx(2_000 * 0.2 / 10_000)
    # realized mixture is exact: avail_g * rate_g proportional to shares
    out = {g: avail[g] * r for g, r in rates.items()}
    assert out["books"] / budget == pytest.approx(0.5)
    assert out["web"] / budget == pytest.approx(0.3)


def test_solve_mixture_explicit_budget_and_caps():
    avail = {"a": 100.0, "b": 1_000.0}
    # achievable budget: exact rates
    rates, b = solve_mixture(avail, {"a": 1, "b": 1}, budget=150.0)
    assert b == 150.0
    assert rates == {"a": pytest.approx(0.75), "b": pytest.approx(0.075)}
    # over-budget: the scarce group caps at 1.0 (mixture deviates)
    rates2, _ = solve_mixture(avail, {"a": 1, "b": 1}, budget=500.0)
    assert rates2["a"] == 1.0 and rates2["b"] == pytest.approx(0.25)
    # shares normalize (2:2 == 0.5:0.5)
    r3, b3 = solve_mixture(avail, {"a": 2, "b": 2})
    assert b3 == pytest.approx(200.0) and r3["a"] == 1.0

    with pytest.raises(ValueError, match="at least one"):
        solve_mixture(avail, {})
    with pytest.raises(ValueError, match="absent"):
        solve_mixture(avail, {"zzz": 1.0})
    with pytest.raises(ValueError, match="positive"):
        solve_mixture(avail, {"a": 0.0})


def test_mixture_plan_end_to_end(spark, sf_dir):
    """Token-weighted plan over the documents table composes with
    sample_by_mixture into a mix near the target shares."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    targets = {"en": 0.6, "de": 0.4}
    rates, budget = mixture_plan(d, "lang", targets, weight_col="n_chars")
    avail = {r["lang"]: r["a"] for r in
             d.groupBy("lang").agg(F.sum("n_chars").alias("a")).collect()}
    # solver invariant: realized weight proportional to shares
    assert avail["en"] * rates["en"] == pytest.approx(0.6 * budget)
    assert avail["de"] * rates["de"] == pytest.approx(0.4 * budget)
    assert max(rates.values()) == pytest.approx(1.0)

    sampled = sample_by_mixture(d, "doc_id", "lang", rates)
    got = {r["lang"]: r["a"] for r in sampled.groupBy("lang")
           .agg(F.sum("n_chars").alias("a")).collect()}
    share_en = got["en"] / (got["en"] + got["de"])
    # binomial fluctuation at sf0.001 group sizes: generous band
    assert 0.45 < share_en < 0.75
    # unlisted langs are dropped entirely (default=0.0)
    assert set(got) == {"en", "de"}

    with pytest.raises(ValueError, match="no weight"):
        mixture_plan(d, "lang", {"zz_nonexistent": 1.0})
