"""spark-submit / python -m entrypoint.

Mirrors the reference CLI contract (specs/cli.py:56-172): suite discovery +
``--list`` (cli.py:122-135), dispatch to the suite, console report, and
**exit code = 1 iff any FAIL** (cli.py:172). Designed to run unchanged via
``spark-submit --py-files mlcast_sourcedata_validator_spark.zip`` on a real
multi-executor cluster; locally it builds its own session.

Usage::

    python -m mlcast_sourcedata_validator_spark.cli --list
    python -m mlcast_sourcedata_validator_spark.cli \
        --suite transcripts_v1 --table /path/to/transcripts \
        [--registry /path/to/conversations] [--baseline /path/to/baseline] \
        [--results /path/to/results_store] [--no-resume] [--whole-table]
    python -m mlcast_sourcedata_validator_spark.cli --demo  # synth demo run
"""

from __future__ import annotations

import argparse
import sys
import uuid

from .suite import RunContext, get_suite, list_suites


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mlcast_sourcedata_validator_spark",
        description="PySpark-native transcript validation engine",
    )
    p.add_argument("--suite", default="transcripts_v1")
    p.add_argument("--suite-file", default=None, metavar="PATH",
                   help="load the suite from a declarative JSON file "
                        "(suite_to_json format) instead of the registry; "
                        "takes precedence over --suite")
    p.add_argument("--table", help="transcripts table path (hive date= partitions)")
    p.add_argument("--format", default=None,
                   choices=("parquet", "orc", "json", "csv"),
                   help="input format override (default: from the path "
                        "extension; directories default to parquet). "
                        "json/csv infer their schema from the FIRST data "
                        "file only — never a full-corpus inference pass")
    p.add_argument("--schema", default=None,
                   help="explicit DDL schema for json/csv inputs, e.g. "
                        "'doc_id bigint, text string' — the scale path "
                        "(zero inference) and the only way a JSON source "
                        "can satisfy a column-ORDER check (JSON objects "
                        "are unordered; Spark sorts inferred fields)")
    p.add_argument("--registry", help="conversations registry parquet path")
    p.add_argument("--baseline", help="drift baseline histogram parquet path")
    p.add_argument("--results", help="results store (enables per-partition "
                                     "checkpointed runs): a filesystem path "
                                     "(parquet dirs + lineage markers) or a "
                                     "catalog identifier (results/violations/"
                                     "lineage/metrics as catalog tables — "
                                     "Iceberg snapshot commits when the "
                                     "runtime is on the classpath)")
    p.add_argument("--detect-changes", action="store_true",
                   help="content-aware resume: re-validate a committed "
                        "partition when its file listing (name+size "
                        "fingerprint) no longer matches the one stamped "
                        "at commit time — catches backfills/compactions "
                        "that plain resume would mask forever")
    p.add_argument("--no-resume", action="store_true",
                   help="reprocess already-committed partitions")
    p.add_argument("--max-partitions", type=int, default=None,
                   help="stop after N uncommitted partitions (bounded "
                        "incremental runs; resume picks up the rest)")
    p.add_argument("--whole-table", action="store_true",
                   help="single unpartitioned run (no checkpointing)")
    p.add_argument("--s3-endpoint-url", default=None,
                   help="custom S3 endpoint for remote table paths "
                        "(reference parity: specs/cli.py:140-160)")
    p.add_argument("--s3-anon", action="store_true",
                   help="anonymous S3 access for remote table paths")
    p.add_argument("--record-schema", action="store_true",
                   help="record the table's current schema signature into "
                        "its properties (run at creation / after an "
                        "intentional migration) and exit; later runs' "
                        "schema_drift check compares against it")
    p.add_argument("--suggest-suite", default=None, metavar="PATH",
                   help="profile --table (<=2 fused scans regardless of "
                        "column count) and write the slack-widened "
                        "declarative CheckSuite the data satisfies as JSON "
                        "to PATH, then exit — the onboarding path: suggest "
                        "-> review the diff -> commit to suites/")
    p.add_argument("--conv-rollup", default=None, metavar="PATH",
                   help="maintain the incremental per-conversation rollup "
                        "store at PATH alongside a --results run (each new "
                        "partition rolled up alone and committed; resume-"
                        "aware like the results store)")
    p.add_argument("--content-index", default=None, metavar="PATH",
                   help="maintain the incremental content-hash dedup "
                        "index at PATH alongside a --results run (id col "
                        "= the suite's key column, hash over --index-text-"
                        "col); prints the global cross-partition "
                        "duplicate count from the merged index")
    p.add_argument("--index-text-col", default="text",
                   help="column hashed into the content index "
                        "(default: text)")
    p.add_argument("--audit-metric", action="append", default=None,
                   metavar="METRIC",
                   help="after a --results run, flag partitions whose "
                        "METRIC deviates > 5 MADs from the cross-"
                        "partition median (repeatable; e.g. "
                        "--audit-metric __n_rows)")
    p.add_argument("--audit-history", action="append", default=None,
                   metavar="METRIC[:STRATEGY]",
                   help="after a --results run, audit METRIC's per-"
                        "partition RUN HISTORY in the store and flag "
                        "points that drift from their own past (strategy "
                        "trailing_zscore | ewma | relative_change | "
                        "cusum, default trailing_zscore; repeatable). "
                        "Catches the creep --audit-metric's single-run "
                        "cross-partition MAD audit cannot see; cusum "
                        "catches small persistent shifts the others miss")
    p.add_argument("--compact-rollup", action="store_true",
                   help="after maintaining + auditing the --conv-rollup "
                        "store, rewrite its active deltas as one base "
                        "delta (trims read-side merge fan-in)")
    p.add_argument("--vacuum-rollup", action="store_true",
                   help="after compaction, physically delete COMPACTED "
                        "delta dirs and crash-orphaned base dirs from "
                        "the rollup/content-index stores (reclaims the "
                        "dead bytes compaction leaves behind)")
    p.add_argument("--trend-baseline", default=None, metavar="STORE",
                   help="previous release's results store: after the "
                        "partitioned run, flag checks whose violation "
                        "rate jumped >=2x (or recurred from zero) vs "
                        "that store's latest committed runs")
    p.add_argument("--max-concurrent", type=int, default=1, metavar="N",
                   help="validate up to N partitions concurrently from "
                        "driver threads (commits stay serialized): fills "
                        "a large cluster's stage-tail idle time; on FAIR "
                        "scheduling each partition gets its own pool")
    p.add_argument("--report-json", default=None, metavar="PATH",
                   help="also write the report as a JSON document "
                        "(summary + exit code + every check row; for a "
                        "partitioned run, a per-partition breakdown) — "
                        "the CI-pipeline surface beside the console "
                        "print and the results store")
    p.add_argument("--sample", type=float, default=None, metavar="FRACTION",
                   help="run the suite on a deterministic conversation-"
                        "level hash sample (sampled.py): FAILs are true "
                        "FAILs, PASSes carry a one-sided upper bound on "
                        "the violating-conversation share")
    p.add_argument("--sample-seed", type=int, default=0,
                   help="hash seed for --sample (default 0)")
    p.add_argument("--certify-rate", type=float, default=None, metavar="P",
                   help="with --sample: target violating-conversation "
                        "share to certify; checks whose bound cannot "
                        "reach P at this sample size report WARNING")
    p.add_argument("--confidence", type=float, default=0.95,
                   help="certificate confidence level (default 0.95)")
    p.add_argument("--violations-limit", type=int, default=None,
                   metavar="N",
                   help="cap the violations sink to N example rows per "
                        "check (verdict counts stay exact — they ride "
                        "the fused metrics pass, not the sink). Bounds "
                        "the output of a pathological all-rows-dirty "
                        "batch by construction")
    p.add_argument("--quarantine", default=None,
                   help="also write the FULL-WIDTH offending rows (row/"
                        "window verdicts) to this parquet path — the "
                        "pipeline-stage form: clean rows flow on, flagged "
                        "rows are parked for inspection")
    p.add_argument("--repair", default=None, metavar="PATH",
                   help="also write a canonically REPAIRED copy of the "
                        "input to this parquet path (case-mangled roles "
                        "normalized, stray tool values nulled, duplicate "
                        "keys keep-one, turn_idx re-contiguized — one "
                        "conv_id shuffle; unrepairable violations are "
                        "left for revalidation to flag)")
    p.add_argument("--list", action="store_true", help="list available suites")
    p.add_argument("--profile-skew", action="store_true",
                   help="measure hot keys on the suite's conv column and "
                        "print the top offenders with share/x_mean plus a "
                        "suggested n_salts for salted_agg, then exit (the "
                        "north_rule's 'find the conv_id hot keys to salt' "
                        "step as a first-class action)")
    p.add_argument("--skew-top", type=int, default=10, metavar="K",
                   help="how many hot keys --profile-skew prints "
                        "(default 10)")
    p.add_argument("--demo", action="store_true",
                   help="run the suite on synthetic dirty data")
    p.add_argument("--cores", default=None, help="local[N] cores (default: all)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.list:
        for s in list_suites():
            print(s)
        return 0

    if args.suite_file:
        from .suite import load_suite_file

        try:
            suite = load_suite_file(args.suite_file)
        except (OSError, ValueError) as e:
            print(f"error: cannot load suite file {args.suite_file!r}: {e}",
                  file=sys.stderr)
            return 2
    else:
        try:
            suite = get_suite(args.suite)
        except KeyError:
            print(f"error: unknown suite {args.suite!r}; available: "
                  f"{', '.join(list_suites())}", file=sys.stderr)
            return 2

    from .session import get_spark

    # flags that only act inside the checkpointed partitioned-run branch
    # must not be ACCEPTED-then-dropped: a user who passes --trend-baseline
    # with --whole-table would otherwise believe the audit ran clean
    if not (args.table and not args.whole_table and args.results):
        ignored = [flag for flag, val in (
            ("--trend-baseline", args.trend_baseline),
            ("--audit-metric", args.audit_metric),
            ("--audit-history", args.audit_history),
            ("--conv-rollup", args.conv_rollup),
            ("--content-index", args.content_index),
            ("--compact-rollup", args.compact_rollup),
            ("--vacuum-rollup", args.vacuum_rollup),
        ) if val]
        if ignored:
            print(
                f"warning: {', '.join(ignored)} only take effect in "
                "checkpointed partitioned runs (--table + --results, "
                "without --whole-table); ignored in this mode",
                file=sys.stderr)

    # fsspec-style storage options for DRIVER-side metadata I/O (sidecar
    # properties, footer sampling, partition listing); Spark's own scans
    # resolve remote schemes through Hadoop FileSystems independently
    storage_options = None
    if args.s3_endpoint_url or args.s3_anon:
        storage_options = {}
        if args.s3_endpoint_url:
            storage_options["client_kwargs"] = {
                "endpoint_url": args.s3_endpoint_url
            }
        if args.s3_anon:
            storage_options["anon"] = True

    spark = get_spark(cores=args.cores)

    # onboarding action: profile the table, emit the suite it satisfies,
    # exit. Takes precedence over every run mode (like --record-schema, it
    # is something you do INSTEAD of validating).
    if args.suggest_suite:
        if not args.table:
            print("error: --suggest-suite requires --table", file=sys.stderr)
            return 2
        from .profiler import suggest_suite
        from .sources import fs as _fs
        from .sources.tables import read_table
        from .suite import suite_to_json

        schema = None
        if args.schema:
            from pyspark.sql.types import StructType

            schema = StructType.fromDDL(args.schema)
        df = read_table(spark, args.table, fmt=args.format, schema=schema)
        sug = suggest_suite(df, suite_id=f"suggested_{suite.suite_id}")
        _fs.write_text(args.suggest_suite, suite_to_json(sug))
        print(f"suggested suite ({len(sug.checks)} checks) written "
              f"to {args.suggest_suite}")
        return 0

    # measurement action: hot-key profile on the suite's conv column +
    # a suggested n_salts — run INSTEAD of validating, like
    # --suggest-suite (north_rule: "salted repartitioning on skewed
    # conv_id hot keys" starts with finding them).
    if args.profile_skew:
        if not args.table:
            print("error: --profile-skew requires --table", file=sys.stderr)
            return 2
        from .skew import skew_profile, suggest_salts
        from .sources.tables import read_table

        df = read_table(spark, args.table, fmt=args.format)
        key = suite.conv_col
        if key not in df.columns:
            print(f"error: conv column {key!r} not in table columns "
                  f"{df.columns}", file=sys.stderr)
            return 2
        rows = skew_profile(df, [key], k=args.skew_top).collect()
        print(f"top {len(rows)} hot {key} keys (n_rows, share, x_mean):")
        for r in rows:
            print(f"  {r[key]}\t{r['n_rows']}\t{r['share']:.6f}"
                  f"\t{r['x_mean']:.2f}")
        n = suggest_salts(df, [key])
        print(f"suggested n_salts for salted_agg over {key}: {n}")
        return 0

    registry = spark.read.parquet(args.registry) if args.registry else None
    baseline = spark.read.parquet(args.baseline) if args.baseline else None

    if args.demo:
        from .operators.drift import build_suite_baseline
        from .synth import (
            dangling_conv_ids,
            generate_conversations_registry,
            generate_transcripts,
            inject_violations,
        )

        clean = generate_transcripts(spark, n_convs=300, seed=42).localCheckpoint()
        dirty, _expected = inject_violations(clean, k=7, seed=42)
        registry = generate_conversations_registry(
            dirty, drop_convs=dangling_conv_ids(_expected)
        )
        # suite-driven: every drift metric the suite declares gets a
        # baseline, including ones added to the plan later
        has_drift = any(c.kind in ("drift", "categorical_drift")
                        for c in suite.checks)
        baseline = build_suite_baseline(clean, suite) if has_drift else None
        df = dirty
    elif args.table and not args.whole_table and args.results:
        from .checkpoint import run_partitioned

        summary = run_partitioned(
            spark, suite, args.table, args.results,
            registry_df=registry, baseline_df=baseline,
            resume=not args.no_resume,
            max_partitions=args.max_partitions,
            storage_options=storage_options,
            violations_limit=args.violations_limit,
            max_concurrent=args.max_concurrent,
            sample_fraction=args.sample,
            sample_seed=args.sample_seed,
            detect_changes=args.detect_changes,
        )
        if args.sample is not None:
            print(f"sampled partitioned run (fraction={args.sample:g} "
                  f"seed={args.sample_seed}): FAILs are true FAILs; use a "
                  f"dedicated --results path so sampled commits never "
                  f"mask the full run")
        print(
            f"run {summary.run_id}: processed {len(summary.processed)} "
            f"partitions, skipped {len(summary.skipped)} (committed), "
            f"{summary.n_fails} FAIL rows, {summary.n_violations} violations"
        )
        rc = summary.exit_code()
        if args.report_json:
            import json

            from .sources import fs as _fs

            doc = {
                "suite_id": suite.suite_id,
                "run_id": summary.run_id,
                "exit_code": rc,
                "processed": sorted(summary.processed),
                "skipped": sorted(summary.skipped),
                "partitions": {
                    p: r.report.to_dict(suite.suite_id, summary.run_id, p)
                    for p, r in sorted(summary.results.items())
                },
            }
            _fs.write_text(args.report_json, json.dumps(doc, indent=2))
            print(f"report JSON written to {args.report_json}")
        if args.conv_rollup:
            from .checkpoint import (
                maintain_rollup,
                read_rollup,
                read_rollup_deltas,
            )
            from .functions.rollup import (
                boundary_audit,
                contiguity_audit,
                transcript_rollup_specs,
            )

            specs = transcript_rollup_specs(
                ts_col=suite.ts_col, turn_col=suite.turn_col)
            rolled = maintain_rollup(
                spark, args.table, args.conv_rollup,
                [suite.conv_col], specs,
                resume=not args.no_resume,
                max_partitions=args.max_partitions,
                storage_options=storage_options,
                max_concurrent=args.max_concurrent,
                detect_changes=args.detect_changes,
            )
            print(f"conv rollup: {len(rolled)} partition deltas committed "
                  f"at {args.conv_rollup}")
            n_span = contiguity_audit(
                read_rollup(spark, args.conv_rollup, [suite.conv_col], specs,
                            storage_options=storage_options),
                conv_col=suite.conv_col).count()
            n_boundary = boundary_audit(
                read_rollup_deltas(spark, args.conv_rollup,
                                   storage_options=storage_options),
                conv_col=suite.conv_col).count()
            print(f"rollup audits: {n_span} span violations, "
                  f"{n_boundary} boundary ordering violations")
            # the audits own the start-at-0 / cross-boundary half of the
            # MUST-level ordering contract that partition-scoped batch
            # checks deliberately relax — their violations are FAILs
            if n_span or n_boundary:
                rc = 1
            if args.compact_rollup:
                from .checkpoint import compact_rollup

                base = compact_rollup(
                    spark, args.conv_rollup, [suite.conv_col], specs,
                    storage_options=storage_options)
                print(f"rollup compaction: "
                      f"{base or 'no-op (fewer than 2 active deltas)'}")
            if args.vacuum_rollup:
                from .checkpoint import vacuum_rollup

                rep = vacuum_rollup(spark, args.conv_rollup,
                                    storage_options=storage_options)
                print(f"rollup vacuum: deleted {len(rep['deleted'])} "
                      f"dead delta dir(s), kept "
                      f"{len(rep['kept_active'])} active")
        if args.audit_metric:
            from .checkpoint import metric_outlier_partitions, read_metrics

            m = read_metrics(spark, args.results)
            for metric in args.audit_metric:
                out = metric_outlier_partitions(m, metric).collect()
                if out:
                    detail = ", ".join(
                        f"{r['partition_id']}={r['value']:g} "
                        f"(median {r['median']:g})" for r in out)
                    print(f"metric audit [{metric}]: {len(out)} outlier "
                          f"partition(s): {detail}")
                else:
                    print(f"metric audit [{metric}]: no outliers")
        if args.audit_history:
            from .checkpoint import read_lineage, read_metrics
            from .functions.anomaly import metric_history_anomaly

            m = read_metrics(spark, args.results)
            lin = read_lineage(spark, args.results)
            for spec in args.audit_history:
                metric, _, strat = spec.partition(":")
                strat = strat or "trailing_zscore"
                try:
                    flagged = metric_history_anomaly(
                        m, lin, metric, strategy=strat).collect()
                except ValueError as e:
                    print(f"error: --audit-history {spec!r}: {e}",
                          file=sys.stderr)
                    return 2
                score_col = {"trailing_zscore": "zscore", "ewma": "ew_zscore",
                             "relative_change": "ratio", "cusum": "cusum"}[strat]

                def _score(r):
                    # cusum evidence is two-sided; report the firing side
                    if strat == "cusum":
                        return max(r["cusum_pos"], r["cusum_neg"])
                    return r[score_col]

                if flagged:
                    detail = ", ".join(
                        f"{r['partition_id']}={r['value']:g} "
                        f"({score_col} "
                        f"{_score(r):g})" if _score(r) is not None else
                        f"{r['partition_id']}={r['value']:g}"
                        for r in flagged)
                    print(f"history audit [{metric}/{strat}]: "
                          f"{len(flagged)} anomalous point(s): {detail}")
                else:
                    print(f"history audit [{metric}/{strat}]: no anomalies")
        if args.trend_baseline:
            from .checkpoint import (
                read_lineage,
                read_metrics,
                violation_trend_audit,
            )

            flags = violation_trend_audit(
                read_metrics(spark, args.trend_baseline),
                read_lineage(spark, args.trend_baseline),
                read_metrics(spark, args.results),
                read_lineage(spark, args.results),
                suite.suite_id,
            ).collect()
            if flags:
                detail = "; ".join(
                    f"{r['check_id']}@{r['partition_id']} "
                    f"{r['prev_rate']:g}->{r['cur_rate']:g}"
                    f" (x{r['ratio']:g})" if r["ratio"] is not None else
                    f"{r['check_id']}@{r['partition_id']} "
                    f"0->{r['cur_rate']:g} ({r['cur_n']} rows)"
                    for r in flags)
                print(f"trend audit vs {args.trend_baseline}: "
                      f"{len(flags)} check-rate jump(s): {detail}")
            else:
                print(f"trend audit vs {args.trend_baseline}: "
                      f"no check-rate jumps")
        if args.content_index:
            from pyspark.sql import functions as F

            from .checkpoint import (
                compact_rollup,
                maintain_rollup,
                read_rollup,
            )
            from .functions.dedup import content_index_specs

            ispecs = content_index_specs(suite.conv_col)
            idone = maintain_rollup(
                spark, args.table, args.content_index,
                ["text_hash"], ispecs, rollup_id="content_index",
                derive={"text_hash": F.md5(F.col(args.index_text_col))},
                resume=not args.no_resume,
                max_partitions=args.max_partitions,
                storage_options=storage_options,
                max_concurrent=args.max_concurrent,
                detect_changes=args.detect_changes,
            )
            # compact FIRST when requested: the dup-group count then reads
            # the just-written base instead of re-merging every delta —
            # one corpus-cardinality merge per run, not two. (Unlike the
            # conv-rollup boundary audit, the content index has no
            # per-boundary semantics to preserve pre-compaction.)
            if args.compact_rollup:
                base = compact_rollup(
                    spark, args.content_index, ["text_hash"], ispecs,
                    rollup_id="content_index",
                    storage_options=storage_options)
                print(f"content index compaction: "
                      f"{base or 'no-op (fewer than 2 active deltas)'}")
            if args.vacuum_rollup:
                from .checkpoint import vacuum_rollup

                rep = vacuum_rollup(
                    spark, args.content_index, rollup_id="content_index",
                    storage_options=storage_options)
                print(f"content index vacuum: deleted "
                      f"{len(rep['deleted'])} dead delta dir(s), kept "
                      f"{len(rep['kept_active'])} active")
            n_dup_groups = read_rollup(
                spark, args.content_index, ["text_hash"], ispecs,
                rollup_id="content_index",
                storage_options=storage_options,
            ).where("n_copies > 1").count()
            print(f"content index: {len(idone)} partition deltas "
                  f"committed; {n_dup_groups} cross-partition duplicate "
                  f"groups in the merged index")
        return rc
    elif args.table:
        from .sources.tables import read_table

        schema = None
        if args.schema:
            from pyspark.sql.types import StructType

            schema = StructType.fromDDL(args.schema)
        df = read_table(spark, args.table, fmt=args.format, schema=schema)
        if args.record_schema:
            from .operators.schema_check import record_schema

            sig = record_schema(df, args.table, spark=spark)
            print(f"recorded schema signature: {sig}")
            return 0
    else:
        print("error: provide --table, --demo, or --list", file=sys.stderr)
        return 2

    from .compiler import run_suite

    ctx = RunContext(
        spark=spark, df=df, suite=suite, run_id=uuid.uuid4().hex[:12],
        registry_df=registry, baseline_df=baseline, table_path=args.table,
        storage_options=storage_options,
        violations_limit=args.violations_limit,
    )
    if args.sample is not None:
        from .sampled import run_suite_sampled

        sres = run_suite_sampled(
            ctx, fraction=args.sample, seed=args.sample_seed,
            delta=1.0 - args.confidence, certify_rate=args.certify_rate)
        sres.report.console_print()
        res = sres.result
        print(f"sampled run: fraction={args.sample:g} "
              f"seed={args.sample_seed} -> {sres.n_convs_sampled} "
              f"conversations, {res.n_input_rows} rows "
              f"(est. totals: {sres.est_total_convs:.0f} convs, "
              f"{sres.est_total_rows:.0f} rows)")
        print(f"{res.n_violations} violation rows in sample")
        if args.report_json:
            from .sources import fs as _fs

            _fs.write_text(args.report_json,
                           sres.report.to_json(suite.suite_id, ctx.run_id))
            print(f"report JSON written to {args.report_json}")
        # exit 1 iff a sampled FAIL (a true FAIL by subset monotonicity);
        # an unmet --certify-rate is a WARNING certificate row, advisory
        return res.exit_code()
    res = run_suite(ctx)
    res.report.console_print()
    if args.report_json:
        from .sources import fs as _fs

        _fs.write_text(args.report_json,
                       res.report.to_json(suite.suite_id, ctx.run_id))
        print(f"report JSON written to {args.report_json}")
    # per-check counts were collected during the run — re-counting the
    # violations DataFrame would be a second pass over the data
    print(f"{res.n_violations} violation rows; input rows: {res.n_input_rows}")
    if args.quarantine:
        from .compiler import quarantine

        _clean, flagged = quarantine(ctx)
        flagged.write.mode("overwrite").parquet(args.quarantine)
        print(f"quarantined rows written to {args.quarantine}")
    if args.repair:
        from .functions.repair import repair_transcripts

        repair_transcripts(
            df, conv_col=suite.conv_col, turn_col=suite.turn_col,
        ).write.mode("overwrite").parquet(args.repair)
        print(f"repaired table written to {args.repair} — revalidate it "
              f"to confirm which violations remain")
    return res.exit_code()


if __name__ == "__main__":
    raise SystemExit(main())
