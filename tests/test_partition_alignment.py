"""partition_alignment: rows must live in the hive partition their event
time derives (misrouted-ingest detection, operators/storage.py).

Covers both recovery modes (input_file_name path parsing and an explicit
partition column), the not-checkable degrade, and the run_partitioned
per-batch shape where the partition column has been dropped.
"""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.checkpoint import run_partitioned
from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.report import FAIL, PASS, WARNING
from mlcast_sourcedata_validator_spark.suite import (
    CheckSpec,
    CheckSuite,
    RunContext,
)
from mlcast_sourcedata_validator_spark.synth import generate_transcripts

K_MISROUTED = 3


def _suite(**params) -> CheckSuite:
    return CheckSuite(
        suite_id="pa_test",
        checks=[
            CheckSpec("partition_alignment", "partition_alignment",
                      "storage", "rows live in their ts-derived partition",
                      params=params),
        ],
    )


@pytest.fixture(scope="module")
def routed(spark):
    """Transcripts with a date routing column: K_MISROUTED rows routed to
    the WRONG day (their ts-derived date + 1), the rest correct."""
    df = generate_transcripts(spark, n_convs=120, seed=7)
    true_date = F.date_format("ts", "yyyy-MM-dd")
    # deterministic pick: first turn of convs whose hash lands in a slot
    misroute = (F.xxhash64("conv_id") % 25 == 0) & (F.col("turn_idx") == 0)
    routed = df.withColumn(
        "date",
        F.when(misroute,
               F.date_format(F.date_add(F.to_date("ts"), 1), "yyyy-MM-dd"))
        .otherwise(true_date),
    )
    n_bad = routed.where(F.col("date") != true_date).count()
    assert n_bad == K_MISROUTED, f"fixture drift: {n_bad} misrouted"
    return routed.localCheckpoint()


@pytest.fixture(scope="module")
def table_path(routed, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pa") / "transcripts")
    routed.write.partitionBy("date").mode("overwrite").parquet(p)
    return p


def test_file_path_mode_flags_misrouted_rows(spark, routed, table_path):
    df = spark.read.option("basePath", table_path).parquet(table_path)
    ctx = RunContext(spark=spark, df=df.drop("date"), suite=_suite(),
                     run_id="pa1", table_path=table_path)
    res = run_suite(ctx)
    assert res.n_violations == K_MISROUTED
    assert res.report.summarize()[FAIL] == 1
    assert res.exit_code() == 1
    row = res.violations.limit(1).collect()[0]
    assert "!= stored date=" in row["detail"]


def test_clean_partitioned_table_passes_with_seen_count(spark, routed,
                                                        tmp_path):
    clean = routed.withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
    p = str(tmp_path / "clean")
    clean.write.partitionBy("date").mode("overwrite").parquet(p)
    df = spark.read.option("basePath", p).parquet(p)
    ctx = RunContext(spark=spark, df=df.drop("date"), suite=_suite(),
                     run_id="pa2", table_path=p)
    res = run_suite(ctx)
    assert res.n_violations == 0
    statuses = [(r.status, r.detail) for r in res.report.results]
    assert statuses[0][0] == PASS
    assert f"all {clean.count()} partition-routed rows" in statuses[0][1]


def test_unpartitioned_input_degrades_to_warning(spark, routed):
    # in-memory plan: input_file_name() is '' everywhere -> not checkable
    ctx = RunContext(spark=spark, df=routed.drop("date"), suite=_suite(),
                     run_id="pa3")
    res = run_suite(ctx)
    assert res.n_violations == 0
    s = res.report.summarize()
    assert s[WARNING] == 1 and s[FAIL] == 0
    assert "not checkable" in res.report.results[0].detail


def test_column_mode_flags_mismatches_without_files(spark, routed):
    ctx = RunContext(spark=spark, df=routed,
                     suite=_suite(column="date"), run_id="pa4")
    res = run_suite(ctx)
    assert res.n_violations == K_MISROUTED
    assert res.report.summarize()[FAIL] == 1


def test_column_mode_null_partition_not_flagged(spark, routed):
    df = routed.withColumn(
        "date", F.when(F.col("turn_idx") == 0, None)
        .otherwise(F.col("date")))
    ctx = RunContext(spark=spark, df=df, suite=_suite(column="date"),
                     run_id="pa5")
    res = run_suite(ctx)
    # every misrouted row had turn_idx == 0, so nulling turn-0 routes
    # removes all violations (NULL partition is null_rate's business)
    assert res.n_violations == 0


def test_max_violations_allows_bounded_misroutes(spark, routed):
    ctx = RunContext(spark=spark, df=routed,
                     suite=_suite(column="date",
                                  max_violations=K_MISROUTED),
                     run_id="pa6")
    res = run_suite(ctx)
    assert res.report.summarize()[FAIL] == 0
    assert res.exit_code() == 0
    assert f"({K_MISROUTED} <= {K_MISROUTED} allowed)" in \
        res.report.results[0].detail


@pytest.mark.slow
def test_run_partitioned_batches_catch_misroutes(spark, table_path,
                                                 tmp_path):
    """The per-partition runner drops the partition COLUMN from each
    batch; the path segment date=<p> must still carry the route."""
    summary = run_partitioned(
        spark, _suite(), table_path, str(tmp_path / "results"),
        resume=False)
    from mlcast_sourcedata_validator_spark.checkpoint import read_violations

    viols = read_violations(spark, str(tmp_path / "results"))
    assert viols.count() == K_MISROUTED
    # each violation was recorded inside the partition batch it sat in —
    # its detail names that same stored partition
    bad = viols.select("partition_id", "detail").collect()
    for r in bad:
        assert f"stored date={r['partition_id']}" in r["detail"]
    assert summary.n_fails >= 1
    assert summary.n_violations == K_MISROUTED


def test_registered_partitioned_suite_variant(spark):
    from mlcast_sourcedata_validator_spark.compiler import compile_suite
    from mlcast_sourcedata_validator_spark.suite import get_suite

    s = get_suite("transcripts_v1_partitioned")
    assert any(c.kind == "partition_alignment" for c in s.checks)
    # base suite stays regexp-free for unpartitioned/in-memory inputs
    base = get_suite("transcripts_v1")
    assert not any(c.kind == "partition_alignment" for c in base.checks)
    assert [c.check_id for c in s.checks[:len(base.checks)]] == \
        [c.check_id for c in base.checks]
    cs = compile_suite(s)
    assert "partition_alignment" in cs.order
