"""CheckSuite compiler + runner: fuse every check into ONE Spark job.

The reference runs 13 sequential check functions over one in-memory dataset
(specs/source_data/radar_precipitation.py:38-270), sharing work only through
an ad-hoc memo cache (checks/coords/variable_timestep.py:12,35-44). The
Spark-native re-expression compiles the whole suite into a single plan:

    input scan
      └─ Observation (CollectMetrics): ALL aggregate metrics — null counts,
         min/max ts, HLL cardinality, drift-histogram bin counts — ride the
         same scan for free (SURVEY.md §4 "single-pass multi-aggregate")
      └─ broadcast-left-join conversations registry   (refint; no shuffle)
      └─ ONE Window.partitionBy(conv_id).orderBy(turn_idx) enrichment
         (lag ts / lag turn / row_number / per-conv distinct-dt)
         — the suite's ONLY shuffle
      └─ per-row violation array: [struct(check_id, detail) | pred_i] …
         filtered + exploded -> violations DataFrame

One action materializes the violations table AND populates the Observation;
verdicts are then pure driver math over ~dozens of scalars. At 10^12 rows
the cost is: 1 scan + 1 conv_id shuffle + 1 broadcast, independent of the
number of checks in the suite.

Skew note: the conv_id window shuffle is bounded per key by max conversation
length (turns per conv ≤ a few thousand), so hot conv_ids cannot create a
straggler partition the way unbounded groupBy keys can; AQE skew handling
stays enabled for the registry join. Salted two-phase aggregation (skew.py)
is used by the grouped drift path where keys are unbounded.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from .operators import (
    anomaly,
    column_rules,
    conditional,
    domains,
    drift,
    interop,
    licensing,
    ordering,
    refint,
    schema_check,
    stats,
    storage,
    text_quality,
)
from .functions import conversations
from .report import VIOLATIONS_SCHEMA, ValidationReport
from .skew import compile_hot_keys
from .suite import (
    AggCheck,
    CheckSuite,
    DriftCheck,
    DriverCheck,
    PostAggCheck,
    RowCheck,
    RunContext,
)

_COMPILERS = {
    # driver-side (zero scan)
    "required_columns": schema_check.compile_required_columns,
    "schema_drift": schema_check.compile_schema_drift,
    "column_rules": column_rules.compile_column_rules,
    "storage_codec": storage.compile_codec,
    "storage_partitioning": storage.compile_partitioning,
    "storage_format": storage.compile_format,
    # row-level layout: rows must live in the partition their ts derives
    "partition_alignment": storage.compile_partition_alignment,
    # fused aggregates
    "null_rate": stats.compile_null_rate,
    "temporal_coverage": stats.compile_temporal_coverage,
    "cardinality": stats.compile_cardinality,
    "numeric_bounds": stats.compile_numeric_bounds,
    # tail budget: percentile_approx sketch riding the same Observation
    "quantile_bounds": stats.compile_quantile_bounds,
    "min_rows": stats.compile_min_rows,
    "unique_column": stats.compile_unique_column,
    "dup_rate": stats.compile_dup_rate,
    "freshness": stats.compile_freshness,
    # text quality (fused agg band + map-side violation rows)
    "text_quality": text_quality.compile_text_quality,
    "text_repetition": text_quality.compile_text_repetition,
    "pii": text_quality.compile_pii,
    "gopher_rules": text_quality.compile_gopher_rules,
    # row predicates
    "domain": domains.compile_domain,
    "conditional_column": domains.compile_conditional_column,
    "sql_predicate": domains.compile_sql_predicate,
    "json_validity": domains.compile_json_validity,
    # window predicates
    "unique_key": ordering.compile_unique_key,
    "turn_contiguity": ordering.compile_turn_contiguity,
    "ts_monotonic": ordering.compile_ts_monotonic,
    "variable_timestep": ordering.compile_variable_timestep,
    # inter-turn gap tail budget (rides the shared window enrichment +
    # post-window Observation; see ordering.compile_gap_bounds)
    "gap_bounds": ordering.compile_gap_bounds,
    "max_conv_turns": ordering.compile_max_conv_turns,
    "role_transitions": ordering.compile_role_transitions,
    "fd_constant": ordering.compile_fd_constant,
    # within-conversation immediate repetition (agent-loop signature)
    "consecutive_dup": ordering.compile_consecutive_dup,
    "refint": refint.compile_refint,
    # cross-table aggregate reconciliation (own bounded key-agg job)
    "reconciliation": refint.compile_reconciliation,
    # drift
    "drift": drift.compile_drift,
    "categorical_drift": drift.compile_categorical_drift,
    # table properties (ds.attrs analog)
    "license": licensing.compile_license,
    "required_property": licensing.compile_required_property,
    "conditional_property": conditional.compile_conditional_property,
    # interop / roundtrip
    "roundtrip": interop.compile_roundtrip,
    "sampled_decode": interop.compile_sampled_decode,
    # operational: hot-key skew profiling (own bounded salted-agg job)
    "hot_keys": compile_hot_keys,
    # point anomalies: Benford rides the fused Observation (zero extra
    # jobs); the volume monitor needs its own O(keys x days) agg job
    "benford": anomaly.compile_benford,
    "volume_anomaly": anomaly.compile_volume_anomaly,
    # operational: physical clustering quality (own bounded per-file agg)
    "clustering": storage.compile_clustering,
    # operational: whole-conversation duplicate share (own conv-key job)
    "conv_duplicates": conversations.compile_conv_duplicates,
}

_AGG_KINDS = {"null_rate", "temporal_coverage", "cardinality",
              "numeric_bounds", "quantile_bounds", "min_rows",
              "unique_column", "dup_rate", "freshness"}
_MOD_NAME = __name__


@dataclass
class CompiledSuite:
    suite: CheckSuite
    driver_checks: list[tuple[str, DriverCheck]] = field(default_factory=list)
    agg_checks: list[tuple[str, AggCheck]] = field(default_factory=list)
    row_checks: list[tuple[str, RowCheck]] = field(default_factory=list)
    drift_checks: list[tuple[str, DriftCheck]] = field(default_factory=list)
    post_agg_checks: list[tuple[str, PostAggCheck]] = field(default_factory=list)
    #: check order for report assembly
    order: list[str] = field(default_factory=list)


@dataclass
class SuiteRunResult:
    report: ValidationReport
    violations: DataFrame
    metrics: dict[str, Any]
    run_id: str
    partition_id: Optional[str]
    n_input_rows: int
    wall_sec: float
    #: total violation rows, from the per-check counts already collected
    #: during the run — callers must NOT re-count the violations DataFrame
    #: (a second pass over checkpointed violations at cluster scale)
    n_violations: int = 0

    def has_fails(self) -> bool:
        return self.report.has_fails()

    def exit_code(self) -> int:
        # ref: specs/cli.py:172 — exit 1 iff any FAIL
        return 1 if self.has_fails() else 0


#: kinds whose default semantics differ between a whole-table run and a
#: single-partition batch (properties that are not locally decidable)
_PARTITION_SCOPED_KINDS = {"turn_contiguity", "role_transitions",
                           "reconciliation"}


def compile_suite(
    suite: CheckSuite, exact: bool = False, partition_scoped: bool = False
) -> CompiledSuite:
    """``partition_scoped=True`` compiles for a one-date-partition batch:
    checks whose property is not locally decidable relax to their local
    form (turn_contiguity stops requiring turn 0 in the batch — a
    conversation legitimately continues across date partitions; the
    global start-at-0 + boundary continuity are the rollup audit's job,
    functions/rollup.py `contiguity_audit`)."""
    cs = CompiledSuite(suite)
    for spec in suite.checks:
        if spec.kind not in _COMPILERS:
            raise ValueError(f"unknown check kind: {spec.kind!r} ({spec.check_id})")
        fn = _COMPILERS[spec.kind]
        if spec.kind in _AGG_KINDS:
            out = fn(spec, suite, exact=exact)
        elif spec.kind in _PARTITION_SCOPED_KINDS:
            out = fn(spec, suite, partition_scoped=partition_scoped)
        else:
            out = fn(spec, suite)
        cs.order.append(spec.check_id)
        items = out if isinstance(out, list) else [out]
        for item in items:
            if isinstance(item, DriverCheck):
                cs.driver_checks.append((spec.check_id, item))
            elif isinstance(item, AggCheck):
                cs.agg_checks.append((spec.check_id, item))
            elif isinstance(item, RowCheck):
                cs.row_checks.append((spec.check_id, item))
            elif isinstance(item, DriftCheck):
                cs.drift_checks.append((spec.check_id, item))
            elif isinstance(item, PostAggCheck):
                cs.post_agg_checks.append((spec.check_id, item))
            else:  # pragma: no cover
                raise TypeError(f"unexpected contribution {type(item)}")
    return cs


def _bucket_col(check_id: str) -> str:
    return f"__bucket_{check_id}"


def _with_bucket_cols(df, cs: CompiledSuite):
    """Project each drift check's bucket expression ONCE per row.

    The bin metrics are n_bins `sum(when(bucket == i, ...))` aggregates;
    referencing an inline bucket expression makes the (interpreted)
    CollectMetrics accumulator re-evaluate the ln/floor chain n_bins times
    per row — measured ~25% of metric-evaluation time at 10M rows x 56
    bins. Pre-projecting reduces each bin to an int comparison.
    """
    for cid, dc in cs.drift_checks:
        df = df.withColumn(_bucket_col(cid), dc.bucket)
    # RowCheck pre-projections (same rationale; additionally the ONLY way
    # a predicate derived from a non-deterministic source like
    # input_file_name() can ride the Observation — CollectMetrics rejects
    # such expressions inline but accepts a projected attribute)
    seen: set = set()
    for _, rc in cs.row_checks:
        for name, col in rc.pre_cols.items():
            if name in seen:
                raise ValueError(f"duplicate pre_col {name}")
            seen.add(name)
            df = df.withColumn(name, col)
    return df


def _viol_metric(check_id: str) -> str:
    return f"__viol_{check_id}"


def _count_exprs(checks: list[tuple[str, RowCheck]]) -> list:
    """Exact per-check violation counters as aggregate Columns — these
    ride the same Observation as the stats metrics, so verdict counts
    cost zero extra jobs (and land in the metrics store as trendable
    per-check series). The violations DataFrame is then free to be
    capped to bounded EXAMPLES without corrupting any verdict."""
    return [
        F.sum(F.when(rc.pred, 1).otherwise(0)).cast("long")
        .alias(_viol_metric(rc.check_id))
        for _, rc in checks
    ]


def _agg_exprs(cs: CompiledSuite) -> list:
    exprs = [F.count(F.lit(1)).alias("__n_rows")]
    seen = {"__n_rows"}
    for _, ac in cs.agg_checks:
        for name, col in ac.exprs.items():
            if name in seen:
                raise ValueError(f"duplicate metric name {name}")
            seen.add(name)
            exprs.append(col.alias(name))
    for cid, dc in cs.drift_checks:
        b = F.col(_bucket_col(cid))
        for i in range(1, dc.n_bins + 1):
            exprs.append(
                F.sum(F.when(b == i, 1).otherwise(0)).alias(f"{dc.check_id}__bin_{i}")
            )
    exprs.extend(
        _count_exprs([(c, rc) for c, rc in cs.row_checks if not rc.needs_window])
    )
    return exprs


@dataclass
class SuitePlan:
    """The fully-built (unexecuted) fused plan for one suite run."""

    agg_exprs: list
    post_exprs: list
    obs: Optional[Observation]
    post_obs: Optional[Observation]
    #: window-enriched slim plan (None when no row/post-agg checks)
    enriched: Any
    #: violations DataFrame plan (None when no row checks)
    violations: Any


def build_suite_plan(ctx: RunContext, cs: CompiledSuite,
                     observe: bool = True) -> SuitePlan:
    """Assemble the single fused Spark plan for the suite.

    Payload predicates (domain/nullness/...) are evaluated MAP-SIDE, before
    any shuffle, and packed into a hits array that is empty for clean rows.
    The window shuffle then carries only (conv_id, turn_idx, ts, hits) — at
    10^12 rows this is the difference between shuffling keys (~40B/row) and
    shuffling full transcripts (text included, ~10x more bytes). Every
    aggregate (stats + drift bins) rides the same scan via CollectMetrics;
    condition-gated post-aggregates ride the same action as a second
    Observation on the enriched plan.
    """
    suite = ctx.suite
    conv, turn, ts = suite.conv_col, suite.turn_col, suite.ts_col
    agg_exprs = _agg_exprs(cs)

    need_registry = any(spec.kind == "refint" for spec in suite.checks)
    need_conv_stats = any(
        spec.kind == "variable_timestep"
        and not spec.params.get("allow_variable_timestep", True)
        for spec in suite.checks
    )
    need_dt = need_conv_stats or any(
        "dt" in pc.needs for _, pc in cs.post_agg_checks
    )

    df = _with_bucket_cols(ctx.df, cs)
    obs: Optional[Observation] = None
    if observe and cs.row_checks and not ctx.exact:
        # stats ride the violations action via CollectMetrics (observe);
        # exact mode (count_distinct) is not observable -> separate agg.
        # observe=False builds the same violations plan WITHOUT metric
        # accumulators for callers that discard metrics (quarantine)
        obs = Observation("suite_metrics")
        df = df.observe(obs, *agg_exprs)

    def _hits_array(checks: list[tuple[str, RowCheck]]):
        return F.array_compact(
            F.array(
                *[
                    F.when(
                        rc.pred,
                        F.struct(
                            F.lit(rc.check_id).alias("check_id"),
                            rc.detail.cast("string").alias("detail"),
                        ),
                    )
                    for _, rc in checks
                ]
            )
        )

    enriched = None
    all_hits = None
    if cs.row_checks or cs.post_agg_checks:
        pre_checks = [(cid, rc) for cid, rc in cs.row_checks if not rc.needs_window]
        win_checks = [(cid, rc) for cid, rc in cs.row_checks if rc.needs_window]

        slim_cols = [
            F.col(conv),
            F.col(turn),
            F.col(ts),
            _hits_array(pre_checks).alias("_row_hits"),
        ]
        # role-transition grammar: ship a tiny-int role code through the
        # shuffle (not the role string) only when the check is declared.
        # The code/lag columns are shared plan state keyed to ONE spec's
        # (column, alphabet) — a second spec would silently read the
        # first's codes, so reject it loudly
        role_specs = [s for s in suite.checks if s.kind == "role_transitions"]
        if len(role_specs) > 1:
            raise ValueError(
                "at most one role_transitions check per suite: the role-code "
                "window columns are shared plan state bound to one "
                "(column, roles) pair; a second spec would be evaluated "
                f"against the first's codes (got {[s.check_id for s in role_specs]})")
        role_spec = role_specs[0] if role_specs else None
        if role_spec is not None:
            slim_cols.append(
                ordering.role_code_expr(
                    role_spec.params.get("column", "role"),
                    role_spec.params["roles"],
                ).alias(ordering.ROLE_CODE)
            )
        # functional-dependency checks: ship each declared dependent
        # column (as string) through the shuffle under a per-check name —
        # check_ids are unique, so two fd specs never collide
        fd_specs = [s for s in suite.checks if s.kind == "fd_constant"]
        for s in fd_specs:
            slim_cols.append(
                F.col(s.params["column"]).cast("string")
                .alias(ordering.fd_val_name(s.check_id))
            )
        # consecutive_dup checks: ship an 8-byte turn-identity hash (not
        # the payload text) through the shuffle, one per declared check.
        # The sentinel coalesce keeps NULL distinct from absent: a NULL
        # arg to xxhash64 is SKIPPED, so (NULL,'x') would otherwise
        # collide with ('x', NULL)
        cd_specs = [s for s in suite.checks if s.kind == "consecutive_dup"]
        for s in cd_specs:
            ident = [
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
                for c in s.params.get("columns", ["role", "text"])
            ]
            slim_cols.append(
                F.xxhash64(*ident).alias(ordering.cd_hash_name(s.check_id)))
        slim = df.select(*slim_cols)

        if need_registry:
            if ctx.registry_df is None:
                raise ValueError("suite has a refint check but no registry_df given")
            reg = ctx.registry_df.select(
                F.col(conv).alias(refint.REG_MARKER)
            ).distinct()
            # no broadcast hint: AQE broadcasts small registries
            # automatically; large ones sort-merge on conv_id, and that
            # exchange is the SAME partitioning the window needs, so the
            # exchange is reused — forcing broadcast would serialize a
            # driver-side hash build of the whole registry (measured: flat
            # cost that destroys N->4N scaling)
            slim = slim.join(reg, slim[conv] == reg[refint.REG_MARKER], "left")

        enriched = slim
        if win_checks or need_dt:
            w = Window.partitionBy(conv).orderBy(turn)
            enriched = (
                enriched.withColumn(ordering.RN, F.row_number().over(w))
                .withColumn(ordering.LAG_TS, F.lag(ts).over(w))
                .withColumn(ordering.LAG_TURN, F.lag(turn).over(w))
            )
            if role_spec is not None:
                enriched = enriched.withColumn(
                    ordering.LAG_ROLE, F.lag(ordering.ROLE_CODE).over(w))
            for s in fd_specs:
                enriched = enriched.withColumn(
                    ordering.fd_lag_name(s.check_id),
                    F.lag(ordering.fd_val_name(s.check_id)).over(w))
            for s in cd_specs:
                enriched = enriched.withColumn(
                    ordering.cd_lag_name(s.check_id),
                    F.lag(ordering.cd_hash_name(s.check_id)).over(w))
            if need_dt:
                # unix_micros over an explicit TIMESTAMP cast: NTZ inputs
                # cannot cast straight to BIGINT under ANSI mode
                enriched = enriched.withColumn(
                    "_dt",
                    F.unix_micros(F.col(ts).cast("timestamp"))
                    - F.unix_micros(F.col(ordering.LAG_TS).cast("timestamp")),
                )
            if need_conv_stats:
                w_all = Window.partitionBy(conv)
                enriched = (
                    enriched.withColumn(
                        ordering.N_DISTINCT_DT,
                        F.size(F.array_distinct(F.collect_list("_dt").over(w_all))),
                    )
                    .withColumn(
                        ordering.IS_LAST,
                        F.col(ordering.RN) == F.count(F.lit(1)).over(w_all),
                    )
                )
        if win_checks:
            all_hits = F.concat(F.col("_row_hits"), _hits_array(win_checks))
        else:
            all_hits = F.col("_row_hits")

    post_obs: Optional[Observation] = None
    post_exprs = [
        col.alias(name)
        for _, pc in cs.post_agg_checks
        for name, col in pc.exprs.items()
    ]
    if (cs.row_checks or cs.post_agg_checks) and not ctx.exact:
        # window-check counters need the enrichment columns, so they ride
        # the SECOND observation (same action, post-window plan position).
        # Exact mode takes its counts from the violations table instead
        # (run_suite 3c) — appending them there would manufacture an
        # otherwise-unneeded full window-agg job just to discard them
        post_exprs = post_exprs + _count_exprs(win_checks)
    if (observe and post_exprs and enriched is not None and cs.row_checks
            and not ctx.exact):
        post_obs = Observation("post_metrics")
        enriched = enriched.observe(post_obs, *post_exprs)

    viol = None
    if cs.row_checks:
        if ctx.violations_limit is not None and ctx.exact:
            raise ValueError(
                "violations_limit needs the observed per-check counters "
                "(exact=False): in exact mode counts come from the "
                "violations table itself, which the cap truncates")
        viol = (
            enriched.select(
                # explicit casts: VIOLATIONS_SCHEMA is fixed across suites
                # (documents_v1 binds a bigint doc_id into both id slots).
                # conv_id is the lossless row identifier (string); turn_idx
                # is try_cast — an id beyond int range becomes NULL there
                # instead of an ANSI CAST_OVERFLOW aborting the suite
                F.col(conv).cast("string").alias("conv_id"),
                F.col(turn).try_cast("int").alias("turn_idx"),
                all_hits.alias("_hits"),
            )
            .where(F.size("_hits") > 0)
            .select(F.explode("_hits").alias("h"), "conv_id", "turn_idx")
            .select(
                F.col("h.check_id").alias("check_id"),
                "conv_id",
                "turn_idx",
                F.col("h.detail").alias("detail"),
                F.lit(ctx.partition_id).cast("string").alias("partition_id"),
            )
        )
        if ctx.violations_limit is not None:
            viol = _cap_examples(viol, ctx.violations_limit)

    return SuitePlan(agg_exprs, post_exprs, obs, post_obs, enriched, viol)


def _cap_examples(viol, limit: int):
    """Bound the violations table to at most ``limit`` EXAMPLE rows per
    check while verdict counts stay exact (they ride the Observations,
    not this table).

    At 10^12 rows a misdeclared domain turns "violations are the
    exception" into a violations table the size of the input; the sink
    must be bounded by construction. Two-phase cap, the top-k shape:

    1. map-side: each task passes through at most ``limit`` rows per
       check_id (stateful counter inside one Arrow ``mapInPandas`` task
       stream) — bounds the data to O(limit x n_tasks) BEFORE any
       shuffle, so a pathological batch cannot concentrate billions of
       rows into the final cap;
    2. exact: row_number over (check_id) ordered by (conv_id, turn_idx)
       keeps the first ``limit`` of the bounded survivors — a shuffle of
       at most limit x n_tasks rows, trivially small.

    Which examples survive phase 1 depends on task order (retry-safe but
    not globally deterministic); phase 2 makes the FINAL pick
    deterministic given phase-1 survivors.
    """
    schema = viol.schema

    def cap_iter(batches):
        seen: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = []
            for cid in pdf["check_id"]:
                c = seen.get(cid, 0)
                keep = c < limit
                if keep:
                    seen[cid] = c + 1
                mask.append(keep)
            if any(mask):
                yield pdf[mask]

    capped = viol.mapInPandas(cap_iter, schema=schema)
    w = Window.partitionBy("check_id").orderBy("conv_id", "turn_idx")
    return (
        capped.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= limit)
        .drop("__rn")
    )


def quarantine(
    ctx: RunContext, broadcast_keys: bool = True, fail_only: bool = False,
    materialize_keys: bool = True,
):
    """Split the input into (clean_df, flagged_df) by the suite's ROW and
    WINDOW verdicts — the pipeline-stage form of the validator: feed
    ``clean_df`` downstream, route ``flagged_df`` to a quarantine sink.

    The fused violations plan's distinct offending (conv, turn) keys are
    anti-/semi-joined back to the input. Violations are the exception by
    construction at 10^12 rows, so the key set is tiny and broadcasts
    (``broadcast_keys=False`` drops the hint for pathological
    all-rows-dirty batches, letting AQE pick a shuffle join). Driver/
    aggregate checks don't identify individual rows and therefore don't
    quarantine — run :func:`run_suite` for the full report and exit code.

    ``fail_only=True`` splits on FAIL-severity row checks only: advisory
    checks (``RowCheck.severity == WARNING`` — non-canonical spellings,
    PII screens) then flag rows in the REPORT without evicting them from
    the clean path. The default quarantines every flagged row, which is
    what a training-data pipeline usually wants for PII.

    ``materialize_keys`` (default) localCheckpoints the tiny key set
    eagerly, so the full scan + window plan that derives it executes
    ONCE instead of once per downstream action on clean/flagged (the
    plan is built without metric accumulators either way — quarantine
    discards metrics). Pass ``False`` to keep both outputs fully lazy.
    """
    cs = compile_suite(ctx.suite, exact=ctx.exact,
                       partition_scoped=ctx.partition_id is not None)
    if ctx.violations_limit is not None:
        # the cap bounds EXAMPLES for the report sink; quarantine must
        # split on every offending key, so it always builds uncapped
        import dataclasses

        ctx = dataclasses.replace(ctx, violations_limit=None)
    plan = build_suite_plan(ctx, cs, observe=False)
    if plan.violations is None:  # no row/window checks in the suite
        return ctx.df, ctx.df.limit(0)
    conv, turn = ctx.suite.conv_col, ctx.suite.turn_col
    viols = plan.violations
    if fail_only:
        advisory = [rc.check_id for _, rc in cs.row_checks
                    if rc.severity != "FAIL"]
        if advisory:
            viols = viols.where(~F.col("check_id").isin(advisory))
    keys = viols.select(
        F.col("conv_id").alias("__q_conv"),
        F.col("turn_idx").alias("__q_turn"),
    ).distinct()
    if materialize_keys:
        keys = keys.localCheckpoint()
    if broadcast_keys:
        keys = F.broadcast(keys)
    # same casts the violations plan applied, so the join key roundtrips
    cond = (
        F.col(conv).cast("string").eqNullSafe(F.col("__q_conv"))
        & F.col(turn).try_cast("int").eqNullSafe(F.col("__q_turn"))
    )
    flagged = ctx.df.join(keys, cond, "left_semi")
    clean = ctx.df.join(keys, cond, "left_anti")
    return clean, flagged


def run_suite(ctx: RunContext, violations_path: Optional[str] = None) -> SuiteRunResult:
    """Compile + execute the suite on ctx.df; optionally persist violations."""
    t0 = time.time()
    suite = ctx.suite
    run_id = ctx.run_id or uuid.uuid4().hex[:12]
    cs = compile_suite(suite, exact=ctx.exact,
                       partition_scoped=ctx.partition_id is not None)
    spark = ctx.spark

    # --- 1. driver-side checks (no scan) ---------------------------------
    reports: dict[str, ValidationReport] = {}
    for cid, dc in cs.driver_checks:
        reports.setdefault(cid, ValidationReport())
        reports[cid] += dc.fn(ctx)

    # short-circuit: a failed schema check gates every scan-based check
    # (reference pattern: cheap checks gate expensive ones; early returns at
    # licensing.py:76,101 / temporal.py:30-34). Running the scan against a
    # wrong schema would abort with an unresolved-column error instead of a
    # report row.
    schema_failed = any(
        spec.kind == "required_columns"
        and spec.check_id in reports
        and reports[spec.check_id].has_fails()
        for spec in suite.checks
    )
    if schema_failed:
        final = ValidationReport()
        skipped = {cid for cid, _ in cs.agg_checks}
        skipped |= {rc.check_id for _, rc in cs.row_checks}
        skipped |= {cid for cid, _ in cs.drift_checks}
        skipped |= {cid for cid, _ in cs.post_agg_checks}
        for spec in suite.checks:
            if spec.check_id in reports:
                final += reports[spec.check_id]
            elif spec.check_id in skipped or any(
                # sub-checks append a '_suffix' to their spec's id; a bare
                # startswith would cross-match a spec whose id is a prefix
                # of another spec's sub-check (e.g. 'role' vs
                # 'role_domain_canonical')
                c.startswith(spec.check_id + "_") for c in skipped
            ):
                final.add(spec.section, spec.requirement, "FAIL",
                          "skipped: schema validation failed",
                          _MOD_NAME, "run_suite")
        return SuiteRunResult(
            report=final,
            violations=spark.createDataFrame([], schema=VIOLATIONS_SCHEMA),
            metrics={},
            run_id=run_id,
            partition_id=ctx.partition_id,
            n_input_rows=0,
            wall_sec=time.time() - t0,
        )

    # --- 2./3. build the fused plan ----------------------------------------
    metrics: dict[str, Any] = {}
    plan = build_suite_plan(ctx, cs)
    obs, post_obs = plan.obs, plan.post_obs
    agg_exprs, post_exprs = plan.agg_exprs, plan.post_exprs
    enriched, viol = plan.enriched, plan.violations

    n_input_rows = 0
    counts: dict = {}
    if cs.row_checks:
        if violations_path:
            # per-run OVERWRITE, never append: a retry must REPLACE its
            # previous attempt's rows, not double them — appended stale
            # rows would inflate exact-mode verdict counts and
            # n_violations (the same idempotency rule as checkpoint.py's
            # per-partition writes; partition-scoped runs overwrite only
            # their own partition_id subdirectory)
            from .sources import fs as _fs

            if ctx.partition_id is not None:
                tgt = _fs.join(violations_path,
                               f"partition_id={ctx.partition_id}")
                viol.drop("partition_id").write.mode("overwrite").parquet(tgt)
                viol = spark.read.parquet(tgt).withColumn(
                    "partition_id",
                    F.lit(ctx.partition_id).cast("string"))
            else:
                viol.write.mode("overwrite").parquet(violations_path)
                viol = spark.read.parquet(violations_path)
        else:
            viol = viol.localCheckpoint()  # materializes -> observation filled
        if obs is not None:
            try:
                metrics.update(obs.get)
            except Exception:
                # zero input tasks -> no CollectMetrics row (e.g. empty
                # batch); fall back to a direct aggregate, which returns a
                # well-formed all-null/zero row
                row = _with_bucket_cols(ctx.df, cs).agg(*agg_exprs).collect()[0]
                metrics.update(row.asDict())
            n_input_rows = metrics.get("__n_rows", 0)
    else:
        viol = spark.createDataFrame([], schema=VIOLATIONS_SCHEMA)

    if obs is None and (cs.agg_checks or cs.drift_checks):
        row = _with_bucket_cols(ctx.df, cs).agg(*agg_exprs).collect()[0]
        metrics.update(row.asDict())
        n_input_rows = metrics.get("__n_rows", 0)
    elif obs is None and cs.row_checks:
        # exact mode with only row checks still must report the input
        # volume (lineage records n_input_rows); count(*) reads no
        # payload columns
        n_input_rows = ctx.df.count()
        metrics["__n_rows"] = n_input_rows

    # --- 3b. shared post-aggregates (explicit analog of the reference's
    # memoized shared timestep analysis, variable_timestep.py:12,35-44) ----
    if post_exprs and enriched is not None:
        if post_obs is not None:
            try:
                metrics.update(post_obs.get)
            except Exception:
                metrics.update(enriched.agg(*post_exprs).collect()[0].asDict())
        else:
            metrics.update(enriched.agg(*post_exprs).collect()[0].asDict())

    # --- 3c. per-check violation counts ------------------------------------
    # Observed path: the exact counters rode the two Observations (pre-
    # window checks on the scan, window checks on the enriched plan) — no
    # extra job, and the violations table may be example-capped. Exact
    # mode has no Observations, so counts come from the (uncapped by
    # construction) violations table itself.
    if cs.row_checks:
        if obs is not None:
            counts = {
                rc.check_id: int(metrics.get(_viol_metric(rc.check_id)) or 0)
                for _, rc in cs.row_checks
            }
        else:
            counts = {
                r["check_id"]: r["n"]
                for r in viol.groupBy("check_id")
                .agg(F.count(F.lit(1)).alias("n")).collect()
            }
    # --- 4. drift baselines ------------------------------------------------
    for cid, dc in cs.drift_checks:
        if ctx.baseline_df is not None:
            base_rows = (
                ctx.baseline_df.where(F.col("metric") == dc.metric)
                .select("bin", "count")
                .collect()
            )
            if base_rows:
                by_bin = {r["bin"]: r["count"] for r in base_rows}
                metrics[f"{cid}__baseline"] = [
                    float(by_bin.get(i, 0)) for i in range(1, dc.n_bins + 1)
                ]

    # --- 5. verdicts in suite order ----------------------------------------
    for cid, ac in cs.agg_checks:
        reports.setdefault(cid, ValidationReport())
        reports[cid] += ac.verdict(metrics)
    for cid, rc in cs.row_checks:
        reports.setdefault(cid, ValidationReport())
        reports[cid] += rc.verdict(counts.get(rc.check_id, 0), metrics)
    for cid, dc in cs.drift_checks:
        reports.setdefault(cid, ValidationReport())
        reports[cid] += dc.verdict(metrics)
    for cid, pc in cs.post_agg_checks:
        reports.setdefault(cid, ValidationReport())
        reports[cid] += pc.verdict(metrics, ctx)

    final = ValidationReport()
    for cid in cs.order:
        if cid in reports:
            final += reports[cid]

    return SuiteRunResult(
        report=final,
        violations=viol,
        metrics=metrics,
        run_id=run_id,
        partition_id=ctx.partition_id,
        n_input_rows=int(n_input_rows or 0),
        wall_sec=time.time() - t0,
        n_violations=int(sum(counts.values())),
    )
