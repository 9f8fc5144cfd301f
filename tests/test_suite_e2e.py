"""Golden end-to-end suite runs: clean data all-PASS, dirty data exact
violation counts per injected class (SURVEY.md §5 items 2 and 5)."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.operators.drift import (
    build_baseline,
    build_categorical_baseline,
)
from mlcast_sourcedata_validator_spark.report import FAIL, PASS, WARNING
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite
from mlcast_sourcedata_validator_spark.synth import (
    dangling_conv_ids,
    generate_conversations_registry,
    generate_transcripts,
    inject_violations,
)

K = 7


@pytest.fixture(scope="module")
def clean(spark):
    return generate_transcripts(spark, n_convs=300, seed=42).localCheckpoint()


@pytest.fixture(scope="module")
def baseline(spark, clean):
    # suite-driven: every drift metric transcripts_v1 declares gets its
    # baseline here automatically (no hand-maintained metric list)
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_suite_baseline,
    )

    return build_suite_baseline(
        clean, get_suite("transcripts_v1")).localCheckpoint()


@pytest.fixture(scope="module")
def dirty_run(spark, clean, baseline):
    dirty, expected = inject_violations(clean, k=K, seed=42)
    reg = generate_conversations_registry(dirty, drop_convs=dangling_conv_ids(expected))
    ctx = RunContext(spark=spark, df=dirty, suite=get_suite("transcripts_v1"),
                     run_id="t-dirty", registry_df=reg, baseline_df=baseline)
    return run_suite(ctx), expected


def test_clean_run_is_all_pass(spark, clean, baseline):
    reg = generate_conversations_registry(clean)
    ctx = RunContext(spark=spark, df=clean, suite=get_suite("transcripts_v1"),
                     run_id="t-clean", registry_df=reg, baseline_df=baseline)
    res = run_suite(ctx)
    s = res.report.summarize()
    assert s[FAIL] == 0
    # without a table path, the 3 storage checks plus the license,
    # conditional-property and schema-drift checks degrade to WARNING;
    # nothing else warns
    assert s[WARNING] == 6
    assert res.violations.count() == 0
    assert res.exit_code() == 0
    assert res.n_input_rows == clean.count()


def test_dirty_run_exact_violation_counts(dirty_run):
    res, expected = dirty_run
    counts = {
        r["check_id"]: r["n"]
        for r in res.violations.groupBy("check_id").agg(F.count("*").alias("n")).collect()
    }
    # bad_role splits between FAIL (out of domain) and WARNING (non-canonical)
    n_canonical = sum(1 for _, t in expected["bad_role"] if t % 3 == 1)  # 'ASSISTANT '
    assert counts["unique_key"] == K
    assert counts["turn_contiguity"] == K
    assert counts["ts_monotonic"] == K
    assert counts["role_domain"] == K - n_canonical
    assert counts.get("role_domain_canonical", 0) == n_canonical
    assert counts["tool_domain"] == K
    assert counts["conv_refint"] == K
    assert res.exit_code() == 1


def test_dirty_run_violation_identities(dirty_run):
    """Violations carry the exact (conv_id, turn_idx) of the planted rows."""
    res, expected = dirty_run
    got_dup = {
        (r.conv_id, r.turn_idx)
        for r in res.violations.where("check_id = 'unique_key'").collect()
    }
    assert got_dup == set(expected["dup_key"])
    got_dangling = {
        r.conv_id for r in res.violations.where("check_id = 'conv_refint'").collect()
    }
    assert got_dangling == {c for c, _ in expected["dangling_conv"]}
    # turn_gap is detected at the row AFTER the deleted turn (idx 2, gap from 0)
    got_gap = {
        r.conv_id for r in res.violations.where("check_id = 'turn_contiguity'").collect()
    }
    assert got_gap == {c for c, _ in expected["turn_gap"]}


def test_null_text_drives_null_rate_verdict(spark, clean, baseline):
    """Nulling >0.1% of text rows must flip the null-rate check to FAIL."""
    n = clean.count()
    dirty = clean.withColumn(
        "text", F.when(F.rand(1) < 0.05, F.lit(None)).otherwise(F.col("text"))
    )
    reg = generate_conversations_registry(clean)
    ctx = RunContext(spark=spark, df=dirty, suite=get_suite("transcripts_v1"),
                     run_id="t-null", registry_df=reg, baseline_df=baseline)
    res = run_suite(ctx)
    null_rows = [r for r in res.report.results
                 if "null rate of 'text'" in r.detail]
    assert len(null_rows) == 1 and null_rows[0].status == FAIL
    assert n == res.n_input_rows


def test_exact_mode_matches_hll_path(spark, clean, baseline):
    reg = generate_conversations_registry(clean)
    ctx = RunContext(spark=spark, df=clean, suite=get_suite("transcripts_v1"),
                     run_id="t-exact", registry_df=reg, baseline_df=baseline,
                     exact=True)
    res = run_suite(ctx)
    assert res.report.summarize()[FAIL] == 0
    card = [r for r in res.report.results if "distinct(conv_id)" in r.detail]
    assert card and "exact" in card[0].detail and "= 300" in card[0].detail


def test_drifted_day_detected(spark, clean, baseline):
    """Shift the turn-length distribution -> drift check must not PASS."""
    drifted = clean.withColumn("text", F.concat(F.col("text"), F.lit("x" * 4000)))
    reg = generate_conversations_registry(clean)
    ctx = RunContext(spark=spark, df=drifted, suite=get_suite("transcripts_v1"),
                     run_id="t-drift", registry_df=reg, baseline_df=baseline)
    res = run_suite(ctx)
    drift_rows = [r for r in res.report.results if "turn_len_chars" in r.detail]
    assert drift_rows and drift_rows[0].status == FAIL


def test_missing_baseline_degrades_to_warning(spark, clean):
    reg = generate_conversations_registry(clean)
    ctx = RunContext(spark=spark, df=clean, suite=get_suite("transcripts_v1"),
                     run_id="t-nobase", registry_df=reg, baseline_df=None)
    res = run_suite(ctx)
    assert res.report.summarize()[FAIL] == 0
    drift_rows = [r for r in res.report.results if "drift skipped" in r.detail]
    assert len(drift_rows) == 5 and all(r.status == WARNING for r in drift_rows)


def test_quarantine_splits_clean_and_flagged(spark, clean, baseline):
    """quarantine(): flagged carries every row the violations plan names,
    clean carries none of them, and the two partitions the input exactly.
    On an all-clean batch the flagged side is empty."""
    from mlcast_sourcedata_validator_spark.compiler import quarantine

    dirty, expected = inject_violations(clean, k=K, seed=42)
    reg = generate_conversations_registry(
        dirty, drop_convs=dangling_conv_ids(expected))
    ctx = RunContext(spark=spark, df=dirty, suite=get_suite("transcripts_v1"),
                     run_id="q", registry_df=reg, baseline_df=baseline)
    clean_df, flagged_df = quarantine(ctx)

    res = run_suite(ctx)
    viol_keys = {(r.conv_id, r.turn_idx) for r in res.violations.collect()}
    flagged_keys = {(r.conv_id, r.turn_idx) for r in flagged_df.collect()}
    assert viol_keys == flagged_keys and len(flagged_keys) > 0

    n_all, n_clean, n_flagged = dirty.count(), clean_df.count(), flagged_df.count()
    assert n_clean + n_flagged == n_all
    clean_keys = {(r.conv_id, r.turn_idx) for r in
                  clean_df.select("conv_id", "turn_idx").collect()}
    assert not (clean_keys & viol_keys)
    # full-width output: original schema preserved on both sides
    assert clean_df.schema == dirty.schema == flagged_df.schema

    # all-clean batch -> empty flagged side
    ctx2 = RunContext(spark=spark, df=clean, suite=get_suite("transcripts_v1"),
                      run_id="q2",
                      registry_df=generate_conversations_registry(clean),
                      baseline_df=baseline)
    c2, f2 = quarantine(ctx2)
    assert f2.count() == 0 and c2.count() == clean.count()

    # the key join broadcasts (violations are the exception at scale)
    plan = flagged_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_cli_quarantine_flag(spark, sf_dir, tmp_path, capsys):
    """--quarantine writes full-width offending rows; a corpus salted
    with one bad-lang doc quarantines exactly that doc."""
    from mlcast_sourcedata_validator_spark import cli
    from mlcast_sourcedata_validator_spark.sources.properties import (
        write_table_properties,
    )

    tbl = str(tmp_path / "docs_tbl")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = spark.createDataFrame(
        [(9_900_001, "some text", "xx", "web", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.unionByName(bad).coalesce(1).write.mode("overwrite").parquet(tbl)
    write_table_properties(tbl, {"license": "CC-BY-4.0"})
    qdir = str(tmp_path / "quarantined")
    rc = cli.main(["--suite", "documents_v1", "--table", tbl,
                   "--quarantine", qdir])
    assert rc == 1  # the bad-lang row is a FAIL
    out = capsys.readouterr().out
    assert f"quarantined rows written to {qdir}" in out
    q = spark.read.parquet(qdir)
    assert q.schema == docs.schema
    assert [r.doc_id for r in q.collect()] == [9_900_001]


def test_role_transition_grammar_check(spark):
    """Conversation grammar: allowed (prev -> cur) role transitions plus
    start roles, evaluated on the shared conversation window. Violations
    name the offending transition; the compact role code (not the role
    string) rides the shuffle."""
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    suite = CheckSuite("g", [CheckSpec(
        "grammar", "role_transitions", "3.9 grammar",
        "conversations MUST follow system? (user assistant)*",
        {
            "column": "role",
            "roles": ["system", "user", "assistant"],
            "allowed": [["system", "user"], ["user", "assistant"],
                        ["assistant", "user"]],
            "start_roles": ["system", "user"],
        })])
    rows = [
        # c1: well-formed
        ("c1", 0, "system", None, "t", None),
        ("c1", 1, "user", None, "t", None),
        ("c1", 2, "assistant", None, "t", None),
        ("c1", 3, "user", None, "t", None),
        # c2: starts with assistant (bad) then assistant->assistant (bad)
        ("c2", 0, "assistant", None, "t", None),
        ("c2", 1, "assistant", None, "t", None),
        # c3: unknown role mid-conversation (code -1 always violates)
        ("c3", 0, "user", None, "t", None),
        ("c3", 1, "moderator", None, "t", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string",
    ).withColumn("ts", F.current_timestamp())
    res = run_suite(RunContext(spark=spark, df=df, suite=suite, run_id="g"))
    assert res.report.has_fails()
    v = sorted((r.conv_id, r.turn_idx, r.detail) for r in
               res.violations.collect())
    assert ("c1", 0, v) not in v
    keys = [(c, t) for c, t, _ in v]
    assert keys == [("c2", 0), ("c2", 1), ("c3", 1)]
    details = {k: d for c, t, d in v for k in [(c, t)]}
    assert "starts with role assistant" in details[("c2", 0)]
    assert "assistant -> assistant" in details[("c2", 1)]
    assert "user -> <unknown>" in details[("c3", 1)]

    # clean conversations pass
    clean_df = df.where(F.col("conv_id") == "c1")
    res2 = run_suite(RunContext(spark=spark, df=clean_df, suite=suite,
                                run_id="g2"))
    assert not res2.report.has_fails() and res2.n_violations == 0


def test_violations_limit_caps_examples_counts_stay_exact(spark, clean,
                                                          baseline, dirty_run):
    """violations_limit bounds the violations SINK to example rows per
    check; every verdict, count and the exit code must be identical to
    the uncapped run — the counts ride the Observations, not the table."""
    res_full, expected = dirty_run
    dirty, _ = inject_violations(clean, k=K, seed=42)
    reg = generate_conversations_registry(
        dirty, drop_convs=dangling_conv_ids(expected))
    limit = 3
    ctx = RunContext(spark=spark, df=dirty, suite=get_suite("transcripts_v1"),
                     run_id="t-cap", registry_df=reg, baseline_df=baseline,
                     violations_limit=limit)
    res = run_suite(ctx)
    assert res.report.summarize() == res_full.report.summarize()
    assert res.n_violations == res_full.n_violations  # exact, not capped
    assert res.exit_code() == res_full.exit_code() == 1
    per_check = {r["check_id"]: r["n"] for r in
                 res.violations.groupBy("check_id")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    full_per_check = {r["check_id"]: r["n"] for r in
                      res_full.violations.groupBy("check_id")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_check  # the dirty fixture violates several checks
    for cid, n in per_check.items():
        assert n == min(limit, full_per_check[cid]), (cid, n)
    # every surviving example is a real violation row from the full set
    extra = (res.violations.select("check_id", "conv_id", "turn_idx")
             .exceptAll(res_full.violations
                        .select("check_id", "conv_id", "turn_idx")))
    assert extra.count() == 0


def test_violations_limit_rejected_in_exact_mode(spark, clean, baseline):
    ctx = RunContext(spark=spark, df=clean, suite=get_suite("transcripts_v1"),
                     run_id="t-cap-exact",
                     registry_df=generate_conversations_registry(clean),
                     baseline_df=baseline, exact=True, violations_limit=5)
    with pytest.raises(ValueError, match="violations_limit"):
        run_suite(ctx)


def test_max_conv_turns_guard(spark, clean, baseline):
    """The skew-guard check: an overlong conversation yields exactly ONE
    violation row (on the (max+1)-th turn) and a FAIL; clean data PASSes
    under the suite's 10000-turn bound."""
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    suite = CheckSuite(suite_id="maxlen", checks=[
        CheckSpec("max_conv_turns", "max_conv_turns", "3.4 grammar",
                  "bound", {"max_turns": 50}),
    ])
    # clean fixture: generator caps conversations at 512 turns -> some
    # convs exceed 50, so craft a tight case instead: bound 50 over a
    # table whose longest conversation has exactly 50 turns
    short = clean.where(F.col("turn_idx") < 50)
    reg = generate_conversations_registry(short)
    res = run_suite(RunContext(spark=spark, df=short, suite=suite,
                               run_id="ml-ok", registry_df=reg))
    assert res.exit_code() == 0 and res.n_violations == 0

    # one conversation one turn over the bound
    over = clean.where(F.col("turn_idx") < 51)
    n_over = (over.groupBy("conv_id").count()
              .where(F.col("count") > 50).count())
    assert n_over > 0
    res2 = run_suite(RunContext(spark=spark, df=over, suite=suite,
                                run_id="ml-bad", registry_df=reg))
    assert res2.exit_code() == 1
    assert res2.n_violations == n_over
    rows = res2.violations.collect()
    assert all(r["check_id"] == "max_conv_turns" and r["turn_idx"] == 50
               for r in rows)


def test_compiler_edge_contracts(spark, clean, baseline, tmp_path):
    """Round-4 review fixes, pinned:

    1. two role_transitions specs are rejected loudly (shared role-code
       plan state is bound to one (column, alphabet) pair),
    2. quarantine(fail_only=True) keeps rows flagged only by advisory
       (WARNING-severity) checks in the clean path,
    3. a failed schema gate emits a 'skipped' row for post-aggregate
       (conditional_property) checks too — the report covers every check,
    4. exact mode with only row checks still reports n_input_rows,
    5. run_suite(violations_path=...) is overwrite-idempotent: a retry
       must not double the persisted rows or the exact counts.
    """
    from mlcast_sourcedata_validator_spark.compiler import quarantine
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    # 1. duplicate role_transitions -> ValueError at plan build
    grammar = dict(column="role",
                   roles=["system", "user", "assistant", "tool"],
                   allowed=[["user", "assistant"], ["assistant", "user"]],
                   start_roles=["system", "user"])
    dup = CheckSuite(suite_id="dup_grammar", checks=[
        CheckSpec("g1", "role_transitions", "3", "grammar one", dict(grammar)),
        CheckSpec("g2", "role_transitions", "3", "grammar two", dict(grammar)),
    ])
    with pytest.raises(ValueError, match="role_transitions"):
        run_suite(RunContext(spark=spark, df=clean, suite=dup, run_id="d"))

    # 2. advisory-only rows stay clean under fail_only: a PII hit is the
    # canonical advisory-only case (pii_screen is WARNING severity; the
    # doc violates no FAIL-severity row check)
    import os
    docs = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    pii_doc = spark.createDataFrame(
        [(9_900_077, "contact me at alice@example.com thanks", "en",
          "web", 38)],
        "doc_id long, text string, lang string, source string, n_chars long")
    with_pii = docs.unionByName(pii_doc)
    dctx = RunContext(spark=spark, df=with_pii,
                      suite=get_suite("documents_v1"), run_id="q")
    _, flagged_all = quarantine(dctx)
    clean_fo, flagged_fo = quarantine(dctx, fail_only=True)
    flagged_ids = {r.doc_id for r in flagged_all.select("doc_id").collect()}
    fo_ids = {r.doc_id for r in flagged_fo.select("doc_id").collect()}
    assert 9_900_077 in flagged_ids      # default: PII quarantined
    assert 9_900_077 not in fo_ids       # fail_only: advisory stays clean
    assert clean_fo.count() + flagged_fo.count() == with_pii.count()
    suite = get_suite("transcripts_v1")
    reg = generate_conversations_registry(clean)

    # 3. schema gate covers post-agg checks
    res = run_suite(RunContext(spark=spark, df=clean.drop("tool"),
                               suite=suite, run_id="s", registry_df=reg,
                               baseline_df=baseline))
    cond_rows = [r for r in res.report.results
                 if "consistent_timestep_start" in r.requirement]
    assert cond_rows and all("skipped" in r.detail for r in cond_rows)

    # 4. exact mode, row checks only -> n_input_rows populated
    rows_only = CheckSuite(suite_id="rows_only", checks=[
        CheckSpec("role_dom", "domain", "4", "role domain",
                  {"column": "role",
                   "allowed": ["system", "user", "assistant", "tool"],
                   "nullable": False}),
    ])
    r4 = run_suite(RunContext(spark=spark, df=clean, suite=rows_only,
                              run_id="x", exact=True))
    assert r4.n_input_rows == clean.count()

    # 5. violations_path retry is overwrite-idempotent
    vp = str(tmp_path / "viols")
    dirty, _ = inject_violations(clean, k=K, seed=42)
    reg_d = generate_conversations_registry(dirty)
    ctx_v = RunContext(spark=spark, df=dirty, suite=suite, run_id="v",
                       registry_df=reg_d, baseline_df=baseline,
                       partition_id="p1")
    n1 = run_suite(ctx_v, violations_path=vp).n_violations
    n2 = run_suite(ctx_v, violations_path=vp).n_violations
    assert n1 == n2 > 0
    assert spark.read.parquet(vp).count() == n1


def test_fd_constant_check(spark, clean):
    """Functional dependency conv_id -> column (compile_fd_constant):
    a conv-constant metadata column PASSes; a mid-conversation flip
    yields exactly one change-point violation on the flip row; NULL
    transitions are detected null-safely; WARNING severity downgrades
    the verdict without losing the rows."""
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    suite = CheckSuite(suite_id="fd", checks=[
        CheckSpec("fd_model", "fd_constant", "3.5 consistency",
                  "conv_id -> model", {"column": "model"}),
    ])
    # model is a pure function of conv_id -> FD holds
    base = clean.withColumn(
        "model", F.concat(F.lit("m"), F.substring("conv_id", 4, 2)))
    res = run_suite(RunContext(spark=spark, df=base, suite=suite,
                               run_id="fd-ok"))
    assert res.exit_code() == 0 and res.n_violations == 0

    # one conversation flips its model from turn 5 onward -> exactly ONE
    # adjacent change point, on turn 5
    victim = base.select("conv_id").first()["conv_id"]
    flipped = base.withColumn(
        "model",
        F.when((F.col("conv_id") == victim) & (F.col("turn_idx") >= 5),
               F.lit("other")).otherwise(F.col("model")))
    n_victim_turns = flipped.where(F.col("conv_id") == victim).count()
    assert n_victim_turns > 5
    res2 = run_suite(RunContext(spark=spark, df=flipped, suite=suite,
                                run_id="fd-flip"))
    assert res2.exit_code() == 1
    assert res2.n_violations == 1
    row = res2.violations.collect()[0]
    assert (row["check_id"], row["conv_id"], row["turn_idx"]) == \
        ("fd_model", victim, 5)
    assert "-> other" in row["detail"]

    # NULL is a value: non-NULL -> NULL on turn 5 is one change point
    nulled = base.withColumn(
        "model",
        F.when((F.col("conv_id") == victim) & (F.col("turn_idx") >= 5),
               F.lit(None).cast("string")).otherwise(F.col("model")))
    res3 = run_suite(RunContext(spark=spark, df=nulled, suite=suite,
                                run_id="fd-null"))
    assert res3.n_violations == 1
    assert "-> NULL" in res3.violations.collect()[0]["detail"]

    # advisory severity: rows recorded, suite does not FAIL
    warn_suite = CheckSuite(suite_id="fdw", checks=[
        CheckSpec("fd_model", "fd_constant", "3.5 consistency",
                  "conv_id -> model", {"column": "model",
                                       "severity": WARNING}),
    ])
    res4 = run_suite(RunContext(spark=spark, df=flipped, suite=warn_suite,
                                run_id="fd-warn"))
    assert res4.exit_code() == 0 and res4.n_violations == 1

    # two fd checks coexist (per-check column names don't collide)
    suite2 = CheckSuite(suite_id="fd2", checks=[
        CheckSpec("fd_model", "fd_constant", "3.5 consistency",
                  "conv_id -> model", {"column": "model"}),
        CheckSpec("fd_role0", "fd_constant", "3.5 consistency",
                  "conv_id -> first role", {"column": "role"}),
    ])
    res5 = run_suite(RunContext(spark=spark, df=flipped, suite=suite2,
                                run_id="fd-two"))
    by_check = {}
    for r in res5.violations.collect():
        by_check.setdefault(r["check_id"], 0)
        by_check[r["check_id"]] += 1
    assert by_check["fd_model"] == 1
    assert by_check.get("fd_role0", 0) > 0  # roles DO vary within convs


def test_freshness_check(spark, clean):
    """Freshness gate (compile_freshness): verdict tiers off the newest
    event's age at an EXPLICIT as_of (never the wall clock, so reruns
    are byte-identical); missing timestamps degrade to FAIL."""
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    hi = clean.agg(F.max("ts")).first()[0]  # newest event in the fixture

    def run(as_of, max_h, warn_h=None):
        params = {"as_of": as_of, "max_age_hours": max_h}
        if warn_h is not None:
            params["warn_age_hours"] = warn_h
        suite = CheckSuite(suite_id="fr", checks=[
            CheckSpec("fresh", "freshness", "1.2 recency", "age", params)])
        return run_suite(RunContext(spark=spark, df=clean, suite=suite,
                                    run_id=f"fr-{max_h}"))

    one_day_later = (hi.replace(microsecond=0)).isoformat()
    # age ~0h at as_of=newest event -> PASS under a 24h bound
    assert run(one_day_later, 24.0).exit_code() == 0

    from datetime import timedelta
    stale_as_of = (hi + timedelta(hours=100)).isoformat()
    # 100h old: FAIL under 24h, WARNING band between 50 and 200
    assert run(stale_as_of, 24.0).exit_code() == 1
    res_warn = run(stale_as_of, 200.0, warn_h=50.0)
    assert res_warn.exit_code() == 0
    assert any(r.status == "WARNING" for r in res_warn.report.results)

    # no timestamps at all -> FAIL, suite still completes
    res_empty = run_suite(RunContext(
        spark=spark, df=clean.where("1=0"),
        suite=CheckSuite(suite_id="fr0", checks=[
            CheckSpec("fresh", "freshness", "1.2 recency", "age",
                      {"as_of": stale_as_of, "max_age_hours": 24.0})]),
        run_id="fr-empty"))
    assert res_empty.exit_code() == 1


def test_consecutive_dup_loop_detection(spark):
    """Agent-loop check: a turn repeating the PREVIOUS turn's (role,
    text) with an advancing turn_idx is flagged; same payload under a
    different role is not; an exact row duplicate (same turn_idx) is
    unique_key's finding, not this check's."""
    from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite

    suite = CheckSuite("l", [CheckSpec(
        "loops", "consecutive_dup", "3.9 grammar",
        "a turn MUST NOT repeat the previous turn verbatim",
        {"columns": ["role", "text"]})])
    rows = [
        # c1: assistant stuck in a loop — turns 2 and 3 repeat turn 1
        ("c1", 0, "user", "hi", None),
        ("c1", 1, "assistant", "working on it", None),
        ("c1", 2, "assistant", "working on it", None),
        ("c1", 3, "assistant", "working on it", None),
        ("c1", 4, "assistant", "done", None),
        # c2: same text under a different role — not a repeat
        ("c2", 0, "user", "ok", None),
        ("c2", 1, "assistant", "ok", None),
        # c3: exact row duplicate (same turn_idx) — unique_key's job
        ("c3", 0, "user", "dup", None),
        ("c3", 0, "user", "dup", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string",
    ).withColumn("ts", F.current_timestamp())
    res = run_suite(RunContext(spark=spark, df=df, suite=suite, run_id="l"))
    assert res.report.has_fails()
    v = sorted((r.conv_id, r.turn_idx) for r in res.violations.collect())
    assert v == [("c1", 2), ("c1", 3)]

    # clean input passes
    res2 = run_suite(RunContext(
        spark=spark, df=df.where("conv_id = 'c2'"), suite=suite,
        run_id="l2"))
    assert not res2.report.has_fails() and res2.n_violations == 0


def test_repair_transcripts_fixes_mechanical_classes(spark, clean, baseline):
    """repair -> revalidate: duplicate keys, turn gaps, stray tools and
    case-mangled roles come back green; unrepairable classes (null text,
    unknown roles, ts regressions, dangling convs) still flag. Repair is
    idempotent."""
    from mlcast_sourcedata_validator_spark.functions.repair import (
        repair_transcripts,
    )

    dirty, expected = inject_violations(clean, k=K, seed=42)
    reg = generate_conversations_registry(
        dirty, drop_convs=dangling_conv_ids(expected))
    repaired = repair_transcripts(dirty).localCheckpoint()

    # idempotent: a second repair changes nothing
    again = repair_transcripts(repaired)
    assert again.exceptAll(repaired).count() == 0
    assert repaired.exceptAll(again).count() == 0

    res = run_suite(RunContext(
        spark=spark, df=repaired, suite=get_suite("transcripts_v1"),
        run_id="t-repair", registry_df=reg, baseline_df=baseline))
    status = {r.requirement: r.status for r in res.report.results}

    def by_req(frag):
        hits = [s for req, s in status.items() if frag in req]
        assert hits, frag
        return hits[0]

    # mechanically repaired classes are green again
    assert by_req("MUST be unique") == PASS                  # dup_key
    assert by_req("increase without gaps") == PASS           # turn_gap
    assert by_req("role = 'tool'") == PASS                   # bad_tool
    # unrepairable classes still flag
    assert by_req("non-decreasing") == FAIL                  # ts_regress
    assert by_req("conversations registry") == FAIL          # dangling
    # repair never invents payload: the planted NULL texts survive
    assert repaired.where(F.col("text").isNull()).count() == K

    def viol_count(cid):
        return res.violations.where(F.col("check_id") == cid).count()

    # bad_role splits: case-mangled 'ASSISTANT ' (turn%3==1) normalizes
    # away (the canonical-spelling WARNING twin goes quiet); out-of-
    # domain 'operator'/'' are unrepairable and still flag in full
    n_canonical = sum(1 for _, t in expected["bad_role"] if t % 3 == 1)
    assert viol_count("role_domain") == K - n_canonical
    assert viol_count("role_domain_canonical") == 0 and n_canonical > 0
    assert viol_count("unique_key") == 0
    assert viol_count("turn_contiguity") == 0
    assert viol_count("tool_domain") == 0
