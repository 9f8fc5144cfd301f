"""documents_v1 suite + dynamic discovery + the new generic check kinds
(unique_column, dup_rate, sql_predicate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.report import FAIL, PASS, WARNING
from mlcast_sourcedata_validator_spark.suite import (
    CheckSpec,
    CheckSuite,
    RunContext,
    get_suite,
    list_suites,
)


def test_discovery_finds_both_builtin_suites():
    names = list_suites()
    assert {"transcripts_v1", "documents_v1"} <= set(names)
    s = get_suite("documents_v1")
    assert s.suite_id == "documents_v1" and len(s.checks) >= 10


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()


def test_documents_suite_clean_corpus_passes(spark, docs, sf_dir):
    res = run_suite(RunContext(spark=spark, df=docs,
                               suite=get_suite("documents_v1"), run_id="d"))
    by_cid = {}
    for r in res.report.results:
        by_cid.setdefault(r.section, []).append(r.status)
    # data checks all pass on the driver's clean corpus
    assert not any(
        r.status == FAIL for r in res.report.results
        if not r.section.startswith("5.1")  # license needs a table_path
    ), [(r.section, r.detail) for r in res.report.results if r.status == FAIL]
    assert res.n_violations == 0


def test_documents_suite_zero_shuffle_plan(spark, docs):
    """No window/refint checks declared -> the fused plan must contain no
    Exchange at all: agg rides the Observation on the scan, violations
    explode map-side."""
    from mlcast_sourcedata_validator_spark.compiler import (
        build_suite_plan,
        compile_suite,
    )

    suite = get_suite("documents_v1")
    cs = compile_suite(suite)
    ctx = RunContext(spark=spark, df=docs, suite=suite, run_id="p")
    plan = build_suite_plan(ctx, cs)
    s = plan.violations._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s, s


def test_documents_suite_flags_planted_violations(spark, docs):
    dirty = docs.unionByName(
        spark.createDataFrame(
            [
                (9_000_001, "dup me", "xx", "web", 6),      # bad lang
                (9_000_001, "dup me", "en", "web", 999),    # dup id + bad n_chars
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    res = run_suite(RunContext(spark=spark, df=dirty,
                               suite=get_suite("documents_v1"), run_id="d2",
                               exact=True))
    fails = {r.detail for r in res.report.results if r.status == FAIL}
    assert any("duplicate values" in d for d in fails)          # unique_column
    assert any("lang outside domain" in d for d in fails)       # domain
    assert any("n_chars IS DISTINCT FROM" in d for d in fails)  # sql_predicate
    viol = {(r.check_id, r.conv_id) for r in res.violations.collect()}
    assert ("lang_domain", "9000001") in viol
    assert ("n_chars_consistency", "9000001") in viol


@pytest.mark.slow
def test_documents_suite_drift_check(spark, docs):
    """documents_v1 drift: no baseline -> WARNING skip; self-baseline ->
    PASS with KS~0; shifted baseline -> drift flagged."""
    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_baseline,
    )

    no_base = run_suite(RunContext(spark=spark, df=docs,
                                   suite=get_suite("documents_v1"),
                                   run_id="nb"))
    drift_rows = [r for r in no_base.report.results
                  if r.section == "4.10 drift"]
    # both the numeric (doc_len) and categorical (lang mix) drift checks
    # WARNING-skip without a baseline
    assert [r.status for r in drift_rows] == [WARNING, WARNING]

    base = build_baseline(docs, expr="length(text)",
                          metric="doc_len_chars", scale="log",
                          lo=1.0, hi=100000.0, n_bins=32)
    same = run_suite(RunContext(spark=spark, df=docs,
                                suite=get_suite("documents_v1"),
                                run_id="sb", baseline_df=base))
    dr = [r for r in same.report.results if r.section == "4.10 drift"]
    # doc_len PASSes against its self-baseline; lang mix still skips
    # (its baseline metric is not in this snapshot)
    assert [r.status for r in dr] == [PASS, WARNING], [r.detail for r in dr]

    shifted = docs.withColumn(
        "text", F.concat(F.col("text"), F.repeat(F.lit("x"), 4000)))
    moved = run_suite(RunContext(spark=spark, df=shifted,
                                 suite=get_suite("documents_v1"),
                                 run_id="mb", baseline_df=base))
    dr2 = [r for r in moved.report.results if r.section == "4.10 drift"]
    assert dr2 and dr2[0].status in (WARNING, FAIL) and "ks" in dr2[0].detail.lower()


def test_documents_suite_schema_gate_on_missing_key(spark, docs):
    """Dropping the key column must yield FAIL report rows (schema gate +
    unique_column's own missing-column guard), never an
    AnalysisException out of run_suite."""
    res = run_suite(RunContext(spark=spark, df=docs.drop("doc_id"),
                               suite=get_suite("documents_v1"), run_id="g"))
    assert res.report.has_fails()
    details = [r.detail for r in res.report.results if r.status == FAIL]
    assert any("doc_id" in d for d in details)


def test_dup_rate_check_tristate(spark):
    def run(texts, **params):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        suite = CheckSuite("d", [CheckSpec(
            "dup", "dup_rate", "4.7", "dup rate",
            {"column": "text", **params})],
            conv_col="doc_id", turn_col="doc_id", ts_col="doc_id")
        res = run_suite(RunContext(spark=spark, df=df, suite=suite,
                                   run_id="t", exact=True))
        assert len(res.report.results) == 1
        return res.report.results[0]

    uniq = [f"text {i}" for i in range(100)]
    assert run(uniq).status == PASS
    r = run(uniq + ["text 0"] * 10, warn_frac=0.05, max_frac=0.5)
    assert r.status == WARNING and "duplicate rate" in r.detail
    assert run(["same"] * 50 + uniq, max_frac=0.2).status == FAIL


def test_cli_lists_and_runs_documents_suite(spark, sf_dir, tmp_path, capsys):
    from mlcast_sourcedata_validator_spark import cli
    from mlcast_sourcedata_validator_spark.sources.properties import (
        write_table_properties,
    )

    assert cli.main(["--list"]) == 0
    assert {"documents_v1", "transcripts_v1"} <= set(
        capsys.readouterr().out.split()
    )
    # a real table dir: parquet + properties sidecar -> fully green run
    tbl = str(tmp_path / "docs_tbl")
    spark.read.parquet(f"{sf_dir}/documents.parquet").coalesce(1) \
        .write.mode("overwrite").parquet(tbl)
    write_table_properties(tbl, {"license": "CC-BY-4.0"})
    rc = cli.main(["--suite", "documents_v1", "--table", tbl])
    assert rc == 0
    # without the sidecar the license check MUST fail -> exit 1
    rc2 = cli.main(["--suite", "documents_v1",
                    "--table", f"{sf_dir}/documents.parquet"])
    assert rc2 == 1


def test_text_quality_and_repetition_checks(spark, docs):
    """The new quality-band and repetition checks ride the fused scan:
    clean corpus passes; a corpus salted with degenerate docs flags both
    (band FAIL + violation rows identifying the offenders)."""
    suite = get_suite("documents_v1")
    res = run_suite(RunContext(spark=spark, df=docs, suite=suite, run_id="q"))
    qual = [r for r in res.report.results if r.section == "4.8 quality"]
    rep = [r for r in res.report.results if r.section == "4.9 repetition"]
    assert qual and all(r.status in (PASS, WARNING) for r in qual)
    assert rep and all(r.status in (PASS, WARNING) for r in rep)

    # salt: 5% repetitive docs + 5% garbage docs
    n = docs.count()
    bad = spark.range(1_000_000, 1_000_000 + max(2, n // 20)).select(
        F.col("id").alias("doc_id"),
        F.lit("same sentence. same sentence. same sentence. same sentence. "
              "same sentence. x").alias("text"),
        F.lit("en").alias("lang"), F.lit("synthetic").alias("source"),
    ).withColumn("n_chars", F.length("text"))
    garbage = spark.range(2_000_000, 2_000_000 + max(2, n // 20)).select(
        # fails all 3 quality components: len<20, punct-heavy, mean token
        # length 2.4 < 2.5 -> quality 0.0
        F.col("id").alias("doc_id"), F.lit("!? ,. ;; ! !").alias("text"),
        F.lit("en").alias("lang"), F.lit("synthetic").alias("source"),
    ).withColumn("n_chars", F.length("text"))
    salted = docs.unionByName(bad).unionByName(garbage)
    res2 = run_suite(RunContext(spark=spark, df=salted, suite=suite,
                                run_id="q2"))
    qual2 = [r for r in res2.report.results if r.section == "4.8 quality"]
    rep2 = [r for r in res2.report.results if r.section == "4.9 repetition"]
    assert any(r.status == FAIL for r in qual2), [r.detail for r in qual2]
    assert any(r.status == FAIL for r in rep2), [r.detail for r in rep2]
    # violation rows name the planted offenders
    v = {r.conv_id for r in res2.violations.collect()
         if r.check_id in ("text_quality_band", "text_repetition")}
    assert any(str(i) in v or i in v for i in (1_000_000, 2_000_000)), v


def test_schema_drift_check(spark, docs, tmp_path):
    """schema_drift: no recorded baseline -> WARNING skip; recorded and
    matching -> PASS; added/retyped columns -> FAIL naming the change;
    order-only change -> WARNING."""
    from mlcast_sourcedata_validator_spark.operators.schema_check import (
        record_schema,
        schema_signature,
    )

    tbl = str(tmp_path / "sd_tbl")
    docs.coalesce(1).write.mode("overwrite").parquet(tbl)
    suite = get_suite("documents_v1")

    def drift_rows(df, table_path):
        res = run_suite(RunContext(spark=spark, df=df, suite=suite,
                                   run_id="sd", table_path=table_path))
        return [r for r in res.report.results
                if "signature" in r.detail or "drift vs recorded" in r.detail
                or "schema-drift" in r.detail or "ORDER changed" in r.detail]

    # no baseline recorded -> WARNING
    rows = drift_rows(docs, tbl)
    assert any(r.status == WARNING and "skipped" in r.detail for r in rows)

    sig = record_schema(docs, tbl)
    assert sig == schema_signature(docs)
    rows = drift_rows(docs, tbl)
    assert any(r.status == PASS and "matches" in r.detail for r in rows)

    # evolve the schema: add a column and retype another
    evolved = docs.withColumn("extra", F.lit(1)) \
                  .withColumn("n_chars", F.col("n_chars").cast("int"))
    rows = drift_rows(evolved, tbl)
    bad = [r for r in rows if r.status == FAIL]
    assert bad and "added ['extra']" in bad[0].detail
    assert "n_chars: bigint -> int" in bad[0].detail

    # order-only change -> WARNING, not FAIL
    reordered = docs.select("text", "doc_id", "lang", "source", "n_chars")
    rows = drift_rows(reordered, tbl)
    assert any(r.status == WARNING and "ORDER changed" in r.detail for r in rows)


def test_pii_check_rides_fused_scan(spark, docs):
    """The pii check: clean corpus passes (synthetic docs are PII-free);
    a salted email/ssn doc FAILs the band and lands in violations with
    the hit classes named; plan stays zero-Exchange."""
    from mlcast_sourcedata_validator_spark.compiler import (
        build_suite_plan,
        compile_suite,
    )

    suite = get_suite("documents_v1")
    res = run_suite(RunContext(spark=spark, df=docs, suite=suite, run_id="p0"))
    pii = [r for r in res.report.results if r.section == "4.11 pii"]
    assert pii and all(r.status == PASS for r in pii), \
        [(r.status, r.detail) for r in pii]

    salted = docs.unionByName(spark.createDataFrame(
        [(7_700_001, "mail me: bob@corp.example and ssn 123-45-6789",
          "en", "web", 45)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text")))
    res2 = run_suite(RunContext(spark=spark, df=salted, suite=suite,
                                run_id="p1"))
    pii2 = [r for r in res2.report.results if r.section == "4.11 pii"]
    assert any(r.status == FAIL for r in pii2), \
        [(r.status, r.detail) for r in pii2]
    v = [r for r in res2.violations.collect() if r.check_id == "pii_screen"]
    assert len(v) == 1 and v[0].conv_id == "7700001"
    assert "email=1" in v[0].detail and "ssn=1" in v[0].detail

    # the suite plan is still zero-shuffle with the pii check fused in
    cs = compile_suite(suite)
    plan = build_suite_plan(
        RunContext(spark=spark, df=docs, suite=suite, run_id="pp"), cs)
    s = plan.violations._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s


def test_cli_record_schema_flag(spark, docs, tmp_path, capsys):
    from mlcast_sourcedata_validator_spark import cli
    from mlcast_sourcedata_validator_spark.sources.properties import (
        read_table_properties,
        write_table_properties,
    )

    tbl = str(tmp_path / "rs_tbl")
    docs.coalesce(1).write.mode("overwrite").parquet(tbl)
    write_table_properties(tbl, {"license": "CC-BY-4.0"})
    rc = cli.main(["--suite", "documents_v1", "--table", tbl,
                   "--record-schema"])
    assert rc == 0
    assert "recorded schema signature" in capsys.readouterr().out
    props = read_table_properties(tbl)
    # merged, not clobbered
    assert props["license"] == "CC-BY-4.0"
    assert props["schema_signature"].startswith("doc_id:bigint;text:string")
    # a later run's schema_drift check now PASSes
    rc2 = cli.main(["--suite", "documents_v1", "--table", tbl])
    out = capsys.readouterr().out
    assert rc2 == 0 and "schema matches the recorded signature" in out


def test_cli_content_index_flag(spark, sf_dir, tmp_path):
    """--content-index maintains the incremental dedup index alongside a
    partitioned documents run; a cross-partition duplicate shows up as a
    dup group in the merged index."""
    from pyspark.sql import functions as F

    from mlcast_sourcedata_validator_spark.checkpoint import read_rollup
    from mlcast_sourcedata_validator_spark.cli import main
    from mlcast_sourcedata_validator_spark.functions.dedup import (
        content_index_specs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # day 1: even ids; day 2: odd ids PLUS a copy of doc 0's text under a
    # new id — a duplicate pair split across partitions
    dup = docs.where("doc_id = 0").withColumn(
        "doc_id", F.lit(900001).cast("long"))
    tagged = docs.unionByName(dup).withColumn(
        "date",
        F.when((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 900000),
               F.lit("2024-06-01")).otherwise(F.lit("2024-06-02"))
        .cast("date"),
    )
    table = str(tmp_path / "docs")
    tagged.repartition("date").write.partitionBy("date").parquet(table)

    rc = main(["--suite", "documents_v1", "--table", table,
               "--results", str(tmp_path / "store"),
               "--content-index", str(tmp_path / "idx"),
               "--cores", "8"])
    assert rc in (0, 1)  # storage/property degrades may FAIL; not under test
    idx = read_rollup(spark, str(tmp_path / "idx"), ["text_hash"],
                      content_index_specs("doc_id"), rollup_id="content_index")
    dups = idx.where("n_copies > 1").collect()
    assert len(dups) == 1 and dups[0]["n_copies"] == 2
    assert dups[0]["min_id"] == 0
    assert idx.count() == docs.count()  # one row per distinct content


def test_documents_lang_mix_drift(spark, docs):
    """Categorical lang-mix drift in documents_v1: self-baseline PASSes;
    collapsing every doc to one language FAILs with the worst category
    named."""
    from pyspark.sql import functions as F

    from mlcast_sourcedata_validator_spark.operators.drift import (
        build_categorical_baseline,
    )
    from mlcast_sourcedata_validator_spark.plans.documents_v1 import LANGS

    base = build_categorical_baseline(
        docs, expr="lang", categories=list(LANGS), metric="lang_dist")
    res = run_suite(RunContext(spark=spark, df=docs,
                               suite=get_suite("documents_v1"),
                               run_id="lm", baseline_df=base))
    rows = [r for r in res.report.results if "lang_dist" in r.detail]
    assert rows and rows[0].status == PASS

    shifted = docs.withColumn("lang", F.lit(LANGS[0]))
    res2 = run_suite(RunContext(spark=spark, df=shifted,
                                suite=get_suite("documents_v1"),
                                run_id="lm2", baseline_df=base))
    rows2 = [r for r in res2.report.results if "lang_dist" in r.detail]
    assert rows2 and rows2[0].status == FAIL and "worst=" in rows2[0].detail
