"""Resumability: per-partition lineage commits, kill/rerun equivalence
(SURVEY.md §5 item 6), storage checks against a real partitioned table."""

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.checkpoint import (
    committed_partitions,
    read_lineage,
    read_results,
    read_violations,
    run_partitioned,
    write_partitioned_transcripts,
)
from mlcast_sourcedata_validator_spark.report import FAIL
from mlcast_sourcedata_validator_spark.sources.properties import (
    write_table_properties,
)
from mlcast_sourcedata_validator_spark.suite import get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Small table with few distinct days so the partition loop is fast."""
    path = str(tmp_path_factory.mktemp("tbl") / "transcripts")
    df = generate_transcripts(spark, n_convs=60, seed=11)
    # compress the date range to ~4 days for a fast partition loop
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                          + F.col("turn_idx") * 10),
    )
    write_partitioned_transcripts(df, path)
    write_table_properties(path, {"license": "CC-BY-4.0",
                                  "consistent_timestep_start": "true"})
    return path


@pytest.fixture(scope="module")
def registry(spark, table):
    return generate_conversations_registry(
        spark.read.parquet(table)
    ).localCheckpoint()


@pytest.mark.slow
def test_full_run_commits_every_partition(spark, table, registry, tmp_path):
    results = str(tmp_path / "store")
    suite = get_suite("transcripts_v1")
    summary = run_partitioned(spark, suite, table, results, registry_df=registry)
    assert len(summary.processed) >= 3 and not summary.skipped
    assert committed_partitions(spark, results, suite.suite_id) == set(summary.processed)
    # the storage checks now see a real partitioned zstd table -> no FAILs
    res_df = read_results(spark, results)
    storage_fails = res_df.where(
        (F.col("section").startswith("6")) & (F.col("status") == FAIL)
    ).count()
    assert storage_fails == 0
    lineage = read_lineage(spark, results)
    assert lineage.where("status = 'COMMITTED'").count() == len(summary.processed)


@pytest.mark.slow
def test_concurrent_run_equals_serial(spark, table, registry, tmp_path):
    """max_concurrent pipelines partition validations through driver
    threads (commits serialized under the lock): same committed
    partitions, verdict rows, violation rows and lineage counts as the
    serial run, and the summary stays in partition order."""
    suite = get_suite("transcripts_v1")
    serial = str(tmp_path / "serial")
    conc = str(tmp_path / "conc")
    s1 = run_partitioned(spark, suite, table, serial, registry_df=registry)
    s2 = run_partitioned(spark, suite, table, conc, registry_df=registry,
                         max_concurrent=3)
    assert s2.processed == s1.processed  # deterministic order
    assert (s2.n_fails, s2.n_violations) == (s1.n_fails, s1.n_violations)
    cols = ["partition_id", "section", "requirement", "status", "detail"]
    a = read_results(spark, serial).select(*cols)
    b = read_results(spark, conc).select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    av = read_violations(spark, serial).select(
        "partition_id", "check_id", "conv_id", "turn_idx")
    bv = read_violations(spark, conc).select(
        "partition_id", "check_id", "conv_id", "turn_idx")
    assert av.exceptAll(bv).count() == 0 and bv.exceptAll(av).count() == 0
    assert read_lineage(spark, conc).where("status = 'COMMITTED'").count() \
        == len(s2.processed)
    # resume skips everything on a second concurrent run
    s3 = run_partitioned(spark, suite, table, conc, registry_df=registry,
                         max_concurrent=3)
    assert not s3.processed and set(s3.skipped) == set(s2.processed)


def test_run_preserves_caller_scheduler_pool(spark, table, registry,
                                             tmp_path):
    """run_partitioned tags per-partition scheduler pools but must
    RESTORE the caller's pool assignment (serial path runs on the
    caller's own thread — clobbering it to None would strip a FAIR
    application's pool from every job submitted afterwards)."""
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", "caller_pool")
    try:
        run_partitioned(spark, get_suite("transcripts_v1"), table,
                        str(tmp_path / "s"), registry_df=registry,
                        max_partitions=1)
        assert sc.getLocalProperty("spark.scheduler.pool") == "caller_pool"
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


@pytest.mark.slow
def test_interrupted_run_resumes_and_matches_uninterrupted(
    spark, table, registry, tmp_path
):
    suite = get_suite("transcripts_v1")

    # uninterrupted reference run
    ref_store = str(tmp_path / "ref")
    run_partitioned(spark, suite, table, ref_store, registry_df=registry)

    # interrupted run: crash after 2 partitions (before their successors)
    store = str(tmp_path / "resumable")

    class Boom(Exception):
        pass

    calls = []

    def injector(p):
        calls.append(p)
        if len(calls) == 2:
            raise Boom()

    with pytest.raises(Boom):
        run_partitioned(spark, suite, table, store, registry_df=registry,
                        fail_injector=injector)
    # partition 1 committed; partition 2 wrote data but no marker
    done = committed_partitions(spark, store, suite.suite_id)
    assert len(done) == 1

    # resume: must skip the committed one, redo the rest
    summary2 = run_partitioned(spark, suite, table, store, registry_df=registry)
    assert summary2.skipped == sorted(done)
    assert len(done) + len(summary2.processed) == len(
        committed_partitions(spark, store, suite.suite_id)
    )

    # final state identical to the uninterrupted run
    a = read_results(spark, ref_store).select(
        "partition_id", "section", "requirement", "status", "detail"
    )
    b = read_results(spark, store).select(
        "partition_id", "section", "requirement", "status", "detail"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    av = read_violations(spark, ref_store)
    bv = read_violations(spark, store)
    assert av.exceptAll(bv).count() == 0 and bv.exceptAll(av).count() == 0


@pytest.mark.slow
def test_concurrent_crash_then_resume_converges(spark, table, registry,
                                                tmp_path):
    """A crash mid-CONCURRENT-run propagates, leaves only marker-bearing
    partitions committed (the in-flight ones are cancelled/uncommitted),
    and a concurrent resume converges to the uninterrupted final state."""
    suite = get_suite("transcripts_v1")
    ref_store = str(tmp_path / "cref")
    run_partitioned(spark, suite, table, ref_store, registry_df=registry)

    store = str(tmp_path / "cres")

    class Boom(Exception):
        pass

    calls = []

    def injector(p):
        # injector runs inside the serialized commit section
        calls.append(p)
        if len(calls) == 2:
            raise Boom()

    with pytest.raises(Boom):
        run_partitioned(spark, suite, table, store, registry_df=registry,
                        fail_injector=injector, max_concurrent=3)
    done = committed_partitions(spark, store, suite.suite_id)
    # exactly the pre-crash committed set has markers: at least the one
    # partition whose commit completed, never the crashed one's
    assert 1 <= len(done) < 4

    summary2 = run_partitioned(spark, suite, table, store,
                               registry_df=registry, max_concurrent=3)
    assert sorted(summary2.skipped) == sorted(done)
    assert committed_partitions(spark, store, suite.suite_id) \
        == set(summary2.skipped) | set(summary2.processed)

    a = read_results(spark, ref_store).select(
        "partition_id", "section", "requirement", "status", "detail")
    b = read_results(spark, store).select(
        "partition_id", "section", "requirement", "status", "detail")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.mark.slow
def test_no_resume_reprocesses(spark, table, registry, tmp_path):
    store = str(tmp_path / "nores")
    suite = get_suite("transcripts_v1")
    s1 = run_partitioned(spark, suite, table, store, registry_df=registry)
    s2 = run_partitioned(spark, suite, table, store, registry_df=registry,
                         resume=False)
    assert s2.processed == s1.processed and not s2.skipped


@pytest.mark.slow
def test_change_aware_resume_revalidates_rewritten_partition(
        spark, tmp_path):
    """detect_changes: a committed partition whose files were rewritten
    (backfill) re-enters the todo list; untouched partitions stay
    skipped; markers missing a fingerprint (pre-round-4 lineage)
    revalidate — the safe direction."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        committed_fingerprints, partition_fingerprint)

    tbl = str(tmp_path / "tbl")
    df = generate_transcripts(spark, n_convs=30, seed=23)
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-06-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(3)) * 86400
                          + F.col("turn_idx") * 10),
    )
    write_partitioned_transcripts(df, tbl)
    write_table_properties(tbl, {"license": "CC-BY-4.0",
                                 "consistent_timestep_start": "true"})
    reg = generate_conversations_registry(
        spark.read.parquet(tbl)).localCheckpoint()
    results = str(tmp_path / "store")
    suite = get_suite("transcripts_v1")

    s1 = run_partitioned(spark, suite, tbl, results, registry_df=reg)
    parts = sorted(s1.processed)
    assert len(parts) >= 2
    fps = committed_fingerprints(spark, results, suite.suite_id)
    assert set(fps) == set(parts) and all(fps.values())

    # unchanged table: change-aware resume skips everything
    s2 = run_partitioned(spark, suite, tbl, results, registry_df=reg,
                         detect_changes=True)
    assert not s2.processed and sorted(s2.skipped) == parts

    # rewrite ONE partition's files (same data, new part files — the
    # committer never modifies in place, so the listing changes)
    target = parts[0]
    pdir = f"{tbl}/date={target}"
    pdata = spark.read.parquet(pdir).localCheckpoint()
    before = partition_fingerprint(tbl, target)
    pdata.repartition(2).write.mode("overwrite").parquet(pdir)
    assert partition_fingerprint(tbl, target) != before

    # plain resume is blind to the rewrite; change-aware resume is not
    s3 = run_partitioned(spark, suite, tbl, results, registry_df=reg)
    assert not s3.processed
    s4 = run_partitioned(spark, suite, tbl, results, registry_df=reg,
                         detect_changes=True)
    assert s4.processed == [target]
    assert sorted(s4.skipped) == parts[1:]
    # the redo stamped the NEW fingerprint — a fifth run skips again
    s5 = run_partitioned(spark, suite, tbl, results, registry_df=reg,
                         detect_changes=True)
    assert not s5.processed and sorted(s5.skipped) == parts

    # pre-fingerprint lineage (column absent): change-aware resume
    # treats None as unknown and revalidates everything
    lin_dir = f"{results}/lineage"
    legacy = spark.read.parquet(lin_dir).drop(
        "fingerprint").localCheckpoint()
    legacy.write.mode("overwrite").parquet(lin_dir)
    assert all(v is None for v in committed_fingerprints(
        spark, results, suite.suite_id).values())
    s6 = run_partitioned(spark, suite, tbl, results, registry_df=reg,
                         detect_changes=True)
    assert sorted(s6.processed) == parts and not s6.skipped


@pytest.mark.slow
def test_metrics_store_written_and_outlier_detection(spark, table, registry, tmp_path):
    """run_partitioned persists per-partition scalar metrics (north_star:
    'lineage and metrics'); metric_outlier_partitions flags a planted
    anomalous day via median/MAD."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        metric_outlier_partitions,
        read_metrics,
    )

    results = str(tmp_path / "mstore")
    suite = get_suite("transcripts_v1")
    summary = run_partitioned(spark, suite, table, results, registry_df=registry)
    m = read_metrics(spark, results)
    # every committed partition wrote metrics, incl. the fused-scan row count
    parts_with_rows = {
        r["pid"]
        for r in m.where("metric = '__n_rows'")
                  .select(F.col("partition_id").cast("string").alias("pid"))
                  .collect()
    }
    assert parts_with_rows == set(summary.processed)
    # row counts in the metrics store match lineage exactly
    joined = (
        m.where("metric = '__n_rows'")
        .join(read_lineage(spark, results), "partition_id")
        .where(F.col("value").cast("long") != F.col("n_input_rows"))
    )
    assert joined.count() == 0

    # outlier detection: plant one partition whose value is 10x the rest
    base = [("p1", 0.01), ("p2", 0.012), ("p3", 0.011), ("p4", 0.013),
            ("p5", 0.1)]
    mdf = spark.createDataFrame(
        [("s", "r", "null_rate", v, None, p) for p, v in base],
        "suite_id string, run_id string, metric string, value double, "
        "value_str string, partition_id string",
    )
    out = metric_outlier_partitions(mdf, "null_rate", mad_factor=5.0)
    assert [r["partition_id"] for r in out.collect()] == ["p5"]
    # fewer than min_partitions -> empty, never a noisy flag
    assert metric_outlier_partitions(
        mdf.where("partition_id in ('p1','p5')"), "null_rate"
    ).count() == 0


@pytest.mark.slow
def test_cli_conv_rollup_flag(spark, table, registry, tmp_path):
    """--conv-rollup maintains the rollup store alongside the results run
    and the merged state matches a direct whole-table rollup."""
    from mlcast_sourcedata_validator_spark.checkpoint import read_rollup
    from mlcast_sourcedata_validator_spark.cli import main
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        keyed_rollup,
        transcript_rollup_specs,
    )

    reg = str(tmp_path / "reg")
    spark.read.parquet(table).select("conv_id").distinct().write.parquet(reg)
    rc = main(["--suite", "transcripts_v1", "--table", table,
               "--results", str(tmp_path / "store"),
               "--conv-rollup", str(tmp_path / "roll"), "--compact-rollup",
               "--registry", reg, "--cores", "8"])
    assert rc == 0
    specs = transcript_rollup_specs()
    merged = read_rollup(spark, str(tmp_path / "roll"), ["conv_id"], specs)
    direct = keyed_rollup(spark.read.parquet(table).drop("date"),
                          ["conv_id"], specs)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # --compact-rollup left exactly one active (base) delta, same state
    from mlcast_sourcedata_validator_spark.checkpoint import (
        read_rollup_deltas,
    )

    active = [r["partition_id"] for r in
              read_rollup_deltas(spark, str(tmp_path / "roll"))
              .select("partition_id").distinct().collect()]
    assert len(active) == 1 and active[0].startswith("__base-")


@pytest.mark.slow
def test_cli_vacuum_rollup_flag(spark, table, tmp_path, capsys):
    """--vacuum-rollup after --compact-rollup physically removes the
    superseded delta dirs; merged state unchanged; the flag warns (like
    every checkpointed-run-only flag) when passed outside that mode."""
    import os

    from mlcast_sourcedata_validator_spark.checkpoint import read_rollup
    from mlcast_sourcedata_validator_spark.cli import main
    from mlcast_sourcedata_validator_spark.functions.rollup import (
        keyed_rollup,
        transcript_rollup_specs,
    )

    reg = str(tmp_path / "reg")
    spark.read.parquet(table).select("conv_id").distinct().write.parquet(reg)
    roll = str(tmp_path / "roll")
    rc = main(["--suite", "transcripts_v1", "--table", table,
               "--results", str(tmp_path / "store"),
               "--conv-rollup", roll, "--compact-rollup", "--vacuum-rollup",
               "--registry", reg, "--cores", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rollup vacuum: deleted" in out
    deltas = os.path.join(roll, "deltas", "conv_rollup")
    on_disk = [n for n in os.listdir(deltas) if n.startswith("partition_id=")]
    assert len(on_disk) == 1 and "__base-" in on_disk[0]
    specs = transcript_rollup_specs()
    merged = read_rollup(spark, roll, ["conv_id"], specs)
    direct = keyed_rollup(spark.read.parquet(table).drop("date"),
                          ["conv_id"], specs)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    # outside the checkpointed mode the flag warns instead of silently
    # doing nothing
    rc2 = main(["--suite", "transcripts_v1", "--table", table,
                "--registry", reg, "--whole-table", "--vacuum-rollup",
                "--cores", "8"])
    err = capsys.readouterr().err
    assert "--vacuum-rollup" in err and "only take effect" in err
    assert rc2 == 0


@pytest.mark.slow
def test_cli_audit_metric_flag(spark, table, registry, tmp_path, capsys):
    """--audit-metric reports per-metric outlier partitions (or their
    absence) from the metrics store after the partitioned run."""
    from mlcast_sourcedata_validator_spark.cli import main

    reg = str(tmp_path / "reg2")
    spark.read.parquet(table).select("conv_id").distinct().write.parquet(reg)
    rc = main(["--suite", "transcripts_v1", "--table", table,
               "--results", str(tmp_path / "astore"),
               "--audit-metric", "__n_rows",
               "--registry", reg, "--cores", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "metric audit [__n_rows]:" in out


@pytest.mark.slow
def test_cli_audit_history_flag(spark, table, registry, tmp_path, capsys):
    """--audit-history audits a metric's per-partition run history in the
    store (3 runs of the same data -> a report line, no anomalies); a bad
    strategy exits 2; outside the checkpointed mode the flag warns."""
    from mlcast_sourcedata_validator_spark.cli import main

    reg = str(tmp_path / "hreg")
    spark.read.parquet(table).select("conv_id").distinct().write.parquet(reg)
    store = str(tmp_path / "hstore")
    for i in range(3):
        rc = main(["--suite", "transcripts_v1", "--table", table,
                   "--results", store, "--registry", reg, "--cores", "8"]
                  + (["--no-resume"] if i else [])
                  + (["--audit-history", "__n_rows",
                      "--audit-history", "__n_rows:relative_change",
                      "--audit-history", "__n_rows:cusum"]
                     if i == 2 else []))
        assert rc == 0
    out = capsys.readouterr().out
    assert "history audit [__n_rows/trailing_zscore]:" in out
    # identical re-runs of identical data: the history is flat, so the
    # relative-change and cusum audits must be clean
    assert "history audit [__n_rows/relative_change]: no anomalies" in out
    assert "history audit [__n_rows/cusum]: no anomalies" in out

    rc2 = main(["--suite", "transcripts_v1", "--table", table,
                "--results", store, "--registry", reg, "--cores", "8",
                "--audit-history", "__n_rows:bogus"])
    assert rc2 == 2
    assert "--audit-history" in capsys.readouterr().err

    rc3 = main(["--suite", "transcripts_v1", "--table", table,
                "--registry", reg, "--whole-table",
                "--audit-history", "__n_rows", "--cores", "8"])
    err = capsys.readouterr().err
    assert rc3 == 0 and "--audit-history" in err and "only take effect" in err


def test_metrics_rows_flattening():
    """Scalar typing rules of the metrics store: bools as 0/1 doubles,
    NaN as NULL value, short strings in value_str, lists skipped."""
    import math

    from mlcast_sourcedata_validator_spark.checkpoint import _metrics_rows

    rows = _metrics_rows("s", "r", {
        "n": 7, "rate": 0.25, "flag": True, "nanish": float("nan"),
        "verdict": "PASS", "bins": [1, 2, 3], "long_str": "x" * 300,
    })
    by_metric = {r[2]: r for r in rows}
    assert by_metric["n"][3] == 7.0 and by_metric["rate"][3] == 0.25
    assert by_metric["flag"][3] == 1.0
    assert by_metric["nanish"][3] is None
    assert by_metric["verdict"][4] == "PASS"
    assert "bins" not in by_metric and "long_str" not in by_metric


@pytest.mark.slow
def test_catalog_results_store_commit_resume_parity(spark, table, registry):
    """The catalog-table results backend (north_star: lineage + metrics
    to an Iceberg results table): passing a catalog IDENTIFIER instead
    of a path routes results/violations/lineage/metrics into catalog
    tables via dynamic partition overwrite + lineage append. Here the
    format resolves to parquet session tables (no Iceberg jar in this
    sandbox — iceberg_runtime_available() is the gate); on an Iceberg
    runtime the identical statements become snapshot commits. Pins:
    crash -> data-without-lineage is redone on resume, final state
    equals the path store's, readers work on identifiers."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        CatalogResultsStore,
        iceberg_runtime_available,
        read_metrics,
    )

    assert not iceberg_runtime_available(spark)  # sandbox platform gate
    store = CatalogResultsStore(spark, "valstore")
    assert store.format == "parquet"

    suite = get_suite("transcripts_v1")

    class Boom(Exception):
        pass

    calls = []

    def injector(p):
        calls.append(p)
        if len(calls) == 2:
            raise Boom()

    with pytest.raises(Boom):
        run_partitioned(spark, suite, table, "valstore",
                        registry_df=registry, fail_injector=injector)
    # partition 1 committed; partition 2 wrote data but no lineage row
    assert len(store.committed(suite.suite_id)) == 1
    assert spark.table("valstore_results") \
        .select("partition_id").distinct().count() == 2

    summary = run_partitioned(spark, suite, table, "valstore",
                              registry_df=registry)
    assert len(summary.skipped) == 1
    done = store.committed(suite.suite_id)
    assert done == set(summary.processed) | set(summary.skipped)

    # identical final state to a fresh path-store run
    import tempfile

    ref = tempfile.mkdtemp()
    run_partitioned(spark, suite, table, ref, registry_df=registry)
    cols = ["partition_id", "section", "requirement", "status", "detail"]
    a = read_results(spark, ref).select(*cols)
    b = read_results(spark, "valstore").select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    av = read_violations(spark, ref).select("partition_id", "conv_id")
    bv = read_violations(spark, "valstore").select("partition_id", "conv_id")
    assert av.exceptAll(bv).count() == 0 and bv.exceptAll(av).count() == 0
    assert read_metrics(spark, "valstore").count() == \
        read_metrics(spark, ref).count()
    assert read_lineage(spark, "valstore") \
        .where("status = 'COMMITTED'").count() >= len(done)

    # change-aware resume reads fingerprints through the store too:
    # every commit stamped one, and an unchanged table skips everything
    fps = store.committed_fingerprints(suite.suite_id)
    assert set(fps) == done and all(fps.values())
    s_cw = run_partitioned(spark, suite, table, "valstore",
                           registry_df=registry, detect_changes=True)
    assert not s_cw.processed and set(s_cw.skipped) == done

    for t in ("valstore_results", "valstore_violations",
              "valstore_lineage", "valstore_metrics"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_results_store_routing_sticky_against_cwd_paths(
        spark, tmp_path, monkeypatch):
    """An existing catalog results store must stay the store even when
    an unrelated same-named file later appears in the driver's CWD —
    otherwise resume silently sees zero committed partitions and writes
    to a second store."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        LINEAGE_SCHEMA,
        CatalogResultsStore,
        _maybe_store,
    )

    monkeypatch.chdir(tmp_path)
    # fresh bare name, no local path -> catalog store
    assert _maybe_store(spark, "stickystore") is not None
    # path-like refs always route to the path store
    assert _maybe_store(spark, str(tmp_path / "x")) is None

    # create the store's lineage table (one committed marker)
    store = CatalogResultsStore(spark, "stickystore")
    store.append_lineage(spark.createDataFrame(
        [("transcripts_v1", "r1", "2024-01-01", "COMMITTED",
          10, 0, 0, 0, 5, 0.1, 1.0, None)], schema=LINEAGE_SCHEMA))
    try:
        # a same-named file appears in CWD between runs -> still sticky
        (tmp_path / "stickystore").mkdir()
        routed = _maybe_store(spark, "stickystore")
        assert routed is not None
        assert routed.committed("transcripts_v1") == {"2024-01-01"}
    finally:
        spark.sql("DROP TABLE IF EXISTS stickystore_lineage")


@pytest.mark.slow
def test_violation_trend_audit_flags_jumped_check(spark, table, registry,
                                                  tmp_path):
    """Cross-release check-outcome drift: release 2 rewrites some roles
    to an out-of-domain value on every partition; the audit comparing
    the two results stores flags role_domain (rate jump from zero) on
    the affected partitions and nothing else."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        read_metrics,
        violation_trend_audit,
    )

    suite = get_suite("transcripts_v1")
    store1 = str(tmp_path / "rel1")
    run_partitioned(spark, suite, table, store1, registry_df=registry)

    # release 2: same rows, but ~5% of turns get an out-of-domain role
    table2 = str(tmp_path / "tbl2")
    df = spark.read.parquet(table).drop("date")
    df2 = df.withColumn(
        "role",
        F.when(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(20)) == 0,
               F.lit("robot")).otherwise(F.col("role")),
    )
    write_partitioned_transcripts(df2, table2)
    write_table_properties(table2, {"license": "CC-BY-4.0",
                                    "consistent_timestep_start": "true"})
    store2 = str(tmp_path / "rel2")
    run_partitioned(spark, suite, table2, store2, registry_df=registry)

    out = violation_trend_audit(
        read_metrics(spark, store1), read_lineage(spark, store1),
        read_metrics(spark, store2), read_lineage(spark, store2),
        suite.suite_id, min_ratio=2.0, min_count=5,
    ).collect()
    assert out, "the planted role-domain jump must be flagged"
    flagged_checks = {r["check_id"] for r in out}
    assert "role_domain" in flagged_checks
    for r in out:
        assert r["cur_n"] >= 5 and r["cur_rate"] > r["prev_rate"]
        # prev release was clean for role_domain -> zero-rate recurrence
        if r["check_id"] == "role_domain":
            assert r["prev_n"] == 0 and r["ratio"] is None

    # identical stores -> nothing flagged (no self-drift)
    assert violation_trend_audit(
        read_metrics(spark, store2), read_lineage(spark, store2),
        read_metrics(spark, store2), read_lineage(spark, store2),
        suite.suite_id).count() == 0
