"""Profiling + constraint suggestion: the suggested suite must pass on
the data that generated it, tighten where the data is clean, and
round-trip through the suite JSON form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.profiler import (
    ColumnProfile,
    profile_table,
    profile_to_df,
    suggest_suite,
)
from mlcast_sourcedata_validator_spark.report import FAIL
from mlcast_sourcedata_validator_spark.suite import (
    RunContext,
    suite_from_json,
    suite_to_json,
)
from mlcast_sourcedata_validator_spark.synth import generate_transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    return generate_transcripts(spark, n_convs=120, seed=7).localCheckpoint()


@pytest.fixture(scope="module")
def profiles(tdf):
    return profile_table(tdf)


def test_profile_shape_and_stats(tdf, profiles):
    by_name = {p.name: p for p in profiles}
    n = tdf.count()
    assert by_name["conv_id"].n_rows == n
    assert by_name["conv_id"].n_nulls == 0
    assert by_name["role"].domain == ["assistant", "system", "tool", "user"]
    # tool is NULL except on tool turns — nullable domain
    assert by_name["tool"].n_nulls > 0
    assert set(by_name["tool"].domain) == {"search", "python", "browser", "sql"}
    # conv_id repeats across turns: not a key, no exact distinct spent
    assert by_name["conv_id"].exact_distinct is None
    assert not by_name["conv_id"].is_unique
    # turn_idx bounds are real ints in canonical string form
    assert by_name["turn_idx"].min_value == "0"
    assert int(by_name["turn_idx"].max_value) > 0


def test_profile_detects_unique_key(spark):
    df = spark.range(500).select(
        F.concat(F.lit("id_"), F.col("id")).alias("row_id"),
        (F.col("id") % 3).alias("bucket"),
    )
    profs = {p.name: p for p in profile_table(df)}
    assert profs["row_id"].is_unique
    assert profs["row_id"].exact_distinct == 500
    assert not profs["bucket"].is_unique


def test_suggested_suite_passes_on_its_own_data(spark, tdf, profiles):
    suite = suggest_suite(tdf, "suggested_transcripts", profiles=profiles)
    res = run_suite(RunContext(spark, tdf, suite, run_id="t1", exact=True))
    fails = [r for r in res.report.results if r.status == FAIL]
    assert fails == []
    kinds = {c.kind for c in suite.checks}
    assert {"required_columns", "min_rows", "null_rate", "domain",
            "numeric_bounds", "temporal_coverage"} <= kinds
    assert suite.ts_col == "ts"


def test_suggested_suite_catches_regressions(spark, tdf, profiles):
    suite = suggest_suite(tdf, "suggested_transcripts", profiles=profiles)
    # a later "release": role renamed values + text gone mostly null
    bad = (
        tdf.withColumn(
            "role",
            F.when(F.col("role") == "user", F.lit("USER_TURN"))
            .otherwise(F.col("role")))
        .withColumn(
            "text",
            F.when(F.rand(seed=1) < 0.5, F.lit(None)).otherwise(F.col("text")))
    )
    res = run_suite(RunContext(spark, bad, suite, run_id="t2", exact=True))
    failed_sections = {r.section for r in res.report.results
                       if r.status == FAIL}
    assert "5 domains" in failed_sections
    assert "3 nulls" in failed_sections


def test_never_null_budget_stays_zero(spark, tdf, profiles):
    suite = suggest_suite(tdf, "s", profiles=profiles)
    budgets = suite.spec("null_rates").params["columns"]
    assert budgets["conv_id"] == 0.0
    assert budgets["ts"] == 0.0
    assert budgets["tool"] > 0.0  # observed nulls -> 2x budget
    one_null = tdf.withColumn(
        "conv_id",
        F.when(F.col("turn_idx") == 0, F.col("conv_id")))
    res = run_suite(RunContext(spark, one_null, suite, run_id="t3",
                               exact=True))
    assert any(r.status == FAIL and r.section == "3 nulls"
               for r in res.report.results)


def test_suite_round_trips_through_json(tdf, profiles):
    suite = suggest_suite(tdf, "suggested_transcripts", profiles=profiles)
    back = suite_from_json(suite_to_json(suite))
    assert [ (c.check_id, c.kind, c.params) for c in back.checks ] == \
           [ (c.check_id, c.kind, c.params) for c in suite.checks ]
    assert back.ts_col == "ts"


def test_profile_to_df_and_empty_input(spark, profiles):
    pdf = profile_to_df(spark, profiles)
    assert pdf.count() == len(profiles)
    assert "null_rate" in pdf.columns
    with pytest.raises(ValueError, match="no profilable"):
        suggest_suite(spark.createDataFrame(
            [([1, 2],)], "emb array<int>"))


def test_profile_skips_unprofilable_columns(spark):
    df = spark.createDataFrame(
        [("a", [1.0], b"x")], "s string, emb array<double>, blob binary")
    names = [p.name for p in profile_table(df)]
    assert names == ["s"]


def test_widened_bounds_degenerate_range(spark):
    df = spark.createDataFrame([(5,), (5,)], "v int")
    suite = suggest_suite(df, "s")
    b = suite.spec("bounds_v").params
    assert b["lo"] < 5 < b["hi"]


def test_suggested_tail_budget(tdf, profiles):
    """Numeric columns get an ADVISORY p99 quantile_bounds suggestion
    (warn band only — sketch wobble on a re-run must never gate), set
    25% above the profiled tail."""
    by_name = {p.name: p for p in profiles}
    assert by_name["turn_idx"].p99 is not None
    assert by_name["conv_id"].p99 is None  # strings carry no tail
    suite = suggest_suite(tdf, "s", profiles=profiles)
    tail = suite.spec("tail_turn_idx").params
    assert tail["q"] == 0.99 and "hi" not in tail and "lo" not in tail
    assert tail["warn_hi"] >= by_name["turn_idx"].p99 + 1.0
    # profile_to_df carries the tail column
    assert "p99" in profile_to_df(tdf.sparkSession, profiles).columns


def test_cli_suggest_suite_flag(spark, tdf, tmp_path, capsys):
    """--suggest-suite profiles --table, writes loadable declarative JSON,
    and exits; validating the table against the written file passes.
    Without --table the flag is a usage error."""
    from mlcast_sourcedata_validator_spark.cli import main
    from mlcast_sourcedata_validator_spark.suite import load_suite_file

    tbl = str(tmp_path / "tbl")
    tdf.write.parquet(tbl)
    out_json = str(tmp_path / "suggested.json")
    rc = main(["--table", tbl, "--suggest-suite", out_json, "--cores", "8"])
    assert rc == 0
    assert "suggested suite" in capsys.readouterr().out
    loaded = load_suite_file(out_json)
    assert loaded.suite_id == "suggested_transcripts_v1"
    assert loaded.ts_col == "ts"
    rc2 = main(["--suite-file", out_json, "--table", tbl, "--whole-table",
                "--cores", "8"])
    assert rc2 == 0

    rc3 = main(["--suggest-suite", out_json, "--cores", "8"])
    assert rc3 == 2
    assert "--suggest-suite requires --table" in capsys.readouterr().err


def test_numeric_correlations_matches_numpy(spark):
    import numpy as np
    from mlcast_sourcedata_validator_spark.profiler import (
        numeric_correlations,
    )

    rows = [(1.0, 2.0, 10.0), (2.0, 1.0, 14.0), (3.0, 5.0, 9.0),
            (4.0, 4.0, 20.0), (5.0, None, 31.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r["col_a"], r["col_b"]): r
           for r in numeric_correlations(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    # pairwise-complete semantics: the b-null row drops from (a,b),(b,c)
    ab = [(1, 2), (2, 1), (3, 5), (4, 4)]
    x, y = np.array([p[0] for p in ab], float), np.array(
        [p[1] for p in ab], float)
    assert out[("a", "b")]["n"] == 4
    assert out[("a", "b")]["corr"] == pytest.approx(
        float(np.corrcoef(x, y)[0, 1]))
    assert out[("a", "b")]["covar"] == pytest.approx(
        float(np.cov(x, y, ddof=1)[0, 1]))
    ac_x = np.array([1, 2, 3, 4, 5], float)
    ac_y = np.array([10, 14, 9, 20, 31], float)
    assert out[("a", "c")]["n"] == 5
    assert out[("a", "c")]["corr"] == pytest.approx(
        float(np.corrcoef(ac_x, ac_y)[0, 1]))

    import pytest as _pt
    with _pt.raises(ValueError, match="two columns"):
        numeric_correlations(df, ["a"])


def test_numeric_correlations_single_scan_plan(spark):
    from mlcast_sourcedata_validator_spark.profiler import (
        numeric_correlations,
    )

    df = spark.range(100).selectExpr("id * 1.0 as a", "id * 2.0 as b",
                                     "(id % 7) * 1.0 as c")
    plan = numeric_correlations(df, ["a", "b", "c"])
    txt = plan._jdf.queryExecution().executedPlan().toString()
    # one partial/final aggregate pair -> exactly one Exchange; the
    # long-form pivot is a Generate over the single aggregate row
    assert txt.count("Exchange") == 1
    assert "Generate" in txt
