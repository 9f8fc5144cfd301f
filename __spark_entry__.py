"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation sweep on sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
training-data pipeline ops) as (spark, sf_dir) -> DataFrame; ``oracle_sql()``
holds the DuckDB-ANSI equivalents. Column names and float rounding are
aligned on both sides because the driver hash-compares values after
sorting columns by name.

The driver checks the FIRST 50 registered queries, so ``queries()``
returns exactly 50 distinct operators in an explicit order
(``_DRIVER_ORDER``); redundant oracle-twin variants are exposed via
``extra_queries()``/``extra_oracle_sql()`` and verified by
tests/test_extra_oracles.py + tools/check_oracles.py with the same
compare semantics.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import dedup as dd
from mlcast_sourcedata_validator_spark.functions import similarity as sim
from mlcast_sourcedata_validator_spark.functions import text as tx
from mlcast_sourcedata_validator_spark.functions import multimodal as mm
from mlcast_sourcedata_validator_spark.functions.hashing import (
    MINHASH_COEFFS,
    P,
    char_shingles_sql,
    enc4_sql,
    encw_sql,
    uhash_sql,
    word_shingles_sql,
)

EVENT_DOMAIN = ["click", "view", "purchase", "signup"]  # 'error' = violation


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship: validate events-as-transcripts with the real check suite
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Run the transcripts_v1 suite on sf0.001 events mapped to the
    transcript schema (user_id->conv_id, row_number->turn_idx,
    event_type->role, props->text). Returns the results DataFrame
    (stable RESULTS_SCHEMA; 'error' event_type rows are genuine domain
    violations the suite must flag)."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite

    ev = _t(spark, "/root/testdata/sf0.001", "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )
    registry = transcripts.select("conv_id").distinct()

    suite = get_suite("transcripts_v1")
    # bind the role domain to the events vocabulary ('error' stays invalid)
    suite.spec("role_domain").params["allowed"] = EVENT_DOMAIN
    ctx = RunContext(spark=spark, df=transcripts, suite=suite,
                     run_id="entry", registry_df=registry)
    res = run_suite(ctx)
    return res.report.to_df(spark, suite.suite_id, res.run_id, None)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- column stats (ref: temporal.py/spatial.py aggregates) ------------
    def stats_events(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    q["stats_events"] = stats_events

    def temporal_coverage_events(spark, sf):
        ev = _t(spark, sf, "events")
        return ev.agg(
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.round(
                (F.unix_micros(F.max("ts").cast("timestamp"))
                 - F.unix_micros(F.min("ts").cast("timestamp")))
                / 86400.0e6, 6,
            ).alias("span_days"),
        )
    q["temporal_coverage_events"] = temporal_coverage_events

    # --- uniqueness (north_rule PK check shape) ----------------------------
    def uniqueness_events(spark, sf):
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
        )
    q["uniqueness_events"] = uniqueness_events

    def dup_groups_events(spark, sf):
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= 20)
        )
    q["dup_groups_events"] = dup_groups_events

    # --- domain membership (ref: naming.py lower/trim semantics) -----------
    def domain_violations_events(spark, sf):
        ev = _t(spark, sf, "events")
        return (
            ev.where(~F.lower(F.trim("event_type")).isin(EVENT_DOMAIN))
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n_violations"))
        )
    q["domain_violations_events"] = domain_violations_events

    # --- referential integrity (ref: georeferencing.py -> left_anti) -------
    def refint_events_registry(spark, sf):
        ev = _t(spark, sf, "events")
        reg = _t(spark, sf, "customer").where(F.col("c_custkey") >= 10) \
                                       .select(F.col("c_custkey").alias("user_id"))
        return (
            ev.join(F.broadcast(reg), "user_id", "left_anti")
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
        )
    q["refint_events_registry"] = refint_events_registry

    # --- ordering / window (ref: variable_timestep.py lag-diff analysis) ---
    def ordering_regressions_events(spark, sf):
        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("event_id")
        lag_ts = F.lag("ts").over(w)
        return (
            ev.select("user_id", "ts", lag_ts.alias("lag_ts"))
            .where(F.col("lag_ts").isNotNull() & (F.col("ts") < F.col("lag_ts")))
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_regressions"))
        )
    q["ordering_regressions_events"] = ordering_regressions_events

    def timestep_analysis_events(spark, sf):
        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("event_id")
        # microsecond precision: unix_timestamp would truncate sub-second;
        # cast NTZ->TZ is lossless under the UTC session timezone
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        dt = ts_us - F.lag(ts_us).over(w)
        return (
            ev.select("user_id", dt.alias("dt"))
            .where(F.col("dt").isNotNull())
            .groupBy("user_id")
            .agg(F.count_distinct("dt").alias("n_unique_diffs"))
            .withColumn("has_variable", (F.col("n_unique_diffs") > 1).cast("boolean"))
        )
    q["timestep_analysis_events"] = timestep_analysis_events

    def role_grammar_violations_events(spark, sf):
        """Role-transition GRAMMAR over the events stream: per user
        (ordered by event_id) every (prev event_type -> event_type)
        pair must be in the allowed set, and a user's first event must
        be a session opener. Exercises the operators/ordering.py
        compile_role_transitions predicate shape — map-side tiny-int
        role coding via role_code_expr (~1 byte through the window
        shuffle instead of the type string), lag over ONE key window —
        against a plain lag() SQL oracle. 'error' is outside the
        alphabet (code -1): it violates every transition, like an
        unknown role in a transcript."""
        from mlcast_sourcedata_validator_spark.operators.ordering import (
            role_code_expr,
        )

        roles = ["click", "view", "purchase", "signup"]
        code = {r: i for i, r in enumerate(roles)}
        allowed = [("signup", "view"), ("signup", "click"),
                   ("view", "view"), ("view", "click"),
                   ("click", "view"), ("click", "click"),
                   ("click", "purchase"),
                   ("purchase", "view"), ("purchase", "click")]
        start = ["signup", "view", "click"]

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("event_id")
        cur = role_code_expr("event_type", roles)
        lagged = ev.select(
            "user_id", "event_id", "event_type", cur.alias("_c"),
        ).select(
            "user_id", "event_type", F.col("_c").alias("cur"),
            F.lag("_c").over(w).alias("prev"),
            F.row_number().over(w).alias("rn"),
        )
        ok_pairs = None
        for fr, to in allowed:
            c = (F.col("prev") == code[fr]) & (F.col("cur") == code[to])
            ok_pairs = c if ok_pairs is None else (ok_pairs | c)
        bad_transition = F.col("prev").isNotNull() & ~ok_pairs
        ok_start = None
        for r in start:
            c = F.col("cur") == code[r]
            ok_start = c if ok_start is None else (ok_start | c)
        bad_start = (F.col("rn") == 1) & ~ok_start
        name = None
        for r, i in code.items():
            cond = F.col("prev") == i
            name = (F.when(cond, F.lit(r)) if name is None
                    else name.when(cond, F.lit(r)))
        from_type = F.when(F.col("rn") == 1, F.lit("<start>")) \
                     .otherwise(name.otherwise(F.lit("error")))
        return (
            lagged.where(bad_transition | bad_start)
            .groupBy(from_type.alias("from_type"),
                     F.col("event_type").alias("to_type"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
    q["role_grammar_violations_events"] = role_grammar_violations_events

    def fd_violations_events(spark, sf):
        """Functional-dependency change points (operators/ordering.py
        compile_fd_constant / fd_change_pred): treat user_id -> event_type
        as a claimed FD over the events stream (ordered by event_id) and
        emit every adjacent flip — the exact predicate the fd_constant
        check rides on the suite's shared conversation window, here
        against a plain lag() SQL oracle. A key has >1 distinct value iff
        some ADJACENT pair differs, so change points find every FD
        violation with only the lag the window already computes (no
        per-key count_distinct)."""
        from mlcast_sourcedata_validator_spark.operators.ordering import (
            fd_change_pred,
        )

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("event_id")
        lagged = ev.select(
            "user_id", "event_id", F.col("event_type").alias("value"),
            F.lag("event_type").over(w).alias("prev_value"),
            F.row_number().over(w).alias("rn"),
        )
        return lagged.where(
            fd_change_pred(F.col("value"), F.col("prev_value"), F.col("rn"))
        ).select("user_id", "event_id", "prev_value", "value")
    q["fd_violations_events"] = fd_violations_events

    def scd2_user_state_events(spark, sf):
        """SCD2 interval derivation (functions/scd.py scd2_from_log):
        collapse each user's event_type observation log into versioned
        validity intervals — one shuffle on the key, change points via
        the same adjacent-lag argument as fd_constant, lead() closes
        each interval. The registry/dimension maintenance primitive."""
        from mlcast_sourcedata_validator_spark.functions.scd import (
            scd2_from_log,
        )

        ev = _t(spark, sf, "events")
        return scd2_from_log(ev, ["user_id"], "event_id", ["event_type"])
    q["scd2_user_state_events"] = scd2_user_state_events

    def scd2_merge_events(spark, sf):
        """Incremental SCD2 maintenance (functions/scd.py scd2_merge):
        history built from the first two-thirds of the log (by the order
        column, so the batch satisfies the after-current-version guard);
        the last third applied as a batch. Only touched keys' versions
        re-enter the window (broadcast semi/anti split on the batch's
        distinct keys); untouched history passes through. Must equal the
        full re-derivation exactly — same oracle as a one-shot build
        over the whole log. The one-scalar max() collect sizes the split
        deterministically at every SF."""
        from mlcast_sourcedata_validator_spark.functions.scd import (
            scd2_from_log,
            scd2_merge,
        )

        ev = _t(spark, sf, "events")
        cut = ev.agg(F.max("event_id")).first()[0] * 2 // 3
        hist_log = ev.where(F.col("event_id") <= cut)
        updates = ev.where(F.col("event_id") > cut)
        history = scd2_from_log(hist_log, ["user_id"], "event_id",
                                ["event_type"])
        return scd2_merge(history, updates, ["user_id"], "event_id",
                          ["event_type"])
    q["scd2_merge_events"] = scd2_merge_events

    def disorder_profile_events(spark, sf):
        """Event-time disorder profile (streaming/sizing.py
        disorder_profile): per user stream (arrival order = event_id),
        an event's lateness is how far it arrived behind the stream's
        event-time high-water mark; the summary row's exact quantiles
        size the streaming stages' watermark delay from MEASURED
        disorder instead of a folklore constant. One window shuffle on
        the key, integer-microsecond lateness, exact percentiles."""
        from mlcast_sourcedata_validator_spark.streaming.sizing import (
            disorder_profile,
        )

        ev = _t(spark, sf, "events")
        return disorder_profile(ev, "user_id", "event_id", "ts")
    q["disorder_profile_events"] = disorder_profile_events

    # --- histogram + drift (north_rule KS/PSI shape) ------------------------
    def hist_value_events(spark, sf):
        ev = _t(spark, sf, "events")
        bucket = F.least(
            F.greatest(F.floor((F.col("value") - 0.0) / 500.0 * 25) + 1, F.lit(1)),
            F.lit(25),
        ).cast("int")
        return ev.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    q["hist_value_events"] = hist_value_events

    def drift_psi_events(spark, sf):
        ev = _t(spark, sf, "events")
        bucket = F.least(
            F.greatest(F.floor(F.col("value") / 500.0 * 25) + 1, F.lit(1)), F.lit(25)
        ).cast("int")
        half = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
        hist = ev.select(bucket.alias("bucket"), half.alias("first_half")) \
                 .groupBy("bucket").agg(
                     F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("a"),
                     F.sum(F.when(~F.col("first_half"), 1).otherwise(0)).alias("b"))
        tot = hist.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
        psi = (
            hist.crossJoin(tot)
            .select(
                (
                    (F.greatest(F.col("a") / F.col("ta"), F.lit(1e-6))
                     - F.greatest(F.col("b") / F.col("tb"), F.lit(1e-6)))
                    * F.log(
                        F.greatest(F.col("a") / F.col("ta"), F.lit(1e-6))
                        / F.greatest(F.col("b") / F.col("tb"), F.lit(1e-6))
                    )
                ).alias("term")
            )
            .agg(F.round(F.sum("term"), 6).alias("psi"))
        )
        return psi
    q["drift_psi_events"] = drift_psi_events

    def categorical_drift_events(spark, sf):
        """TVD + PSI of the event_type mix, second half vs first half of
        the month — the categorical-drift primitive (operators/drift.py
        compile_categorical_drift) computed relationally. 'error' is
        deliberately left out of the declared list so the <other> bin
        carries real mass."""
        from mlcast_sourcedata_validator_spark.operators.drift import (
            categorical_bucket,
        )

        ev = _t(spark, sf, "events")
        bucket = categorical_bucket(
            F.col("event_type"), ["click", "purchase", "signup", "view"]
        )
        half = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
        hist = ev.select(bucket.alias("bucket"), half.alias("first_half")) \
                 .groupBy("bucket").agg(
                     F.sum(F.when(~F.col("first_half"), 1).otherwise(0)).alias("a"),
                     F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("b"))
        tot = hist.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
        p = F.greatest(F.col("a") / F.col("ta"), F.lit(1e-6))
        qq = F.greatest(F.col("b") / F.col("tb"), F.lit(1e-6))
        return (
            hist.crossJoin(tot)
            .select(
                F.abs(F.col("a") / F.col("ta") - F.col("b") / F.col("tb"))
                .alias("gap"),
                ((p - qq) * F.log(p / qq)).alias("term"),
            )
            .agg(F.round(F.sum("gap") / 2, 6).alias("tvd"),
                 F.round(F.sum("term"), 6).alias("psi"))
        )
    q["categorical_drift_events"] = categorical_drift_events

    def daily_drift_events(spark, sf):
        """Per-day KS/PSI of the value distribution vs the whole-table
        baseline — exercises the applyInPandas (Arrow) drift path against a
        pure-SQL oracle."""
        from mlcast_sourcedata_validator_spark.operators.drift import (
            build_baseline,
            daily_drift,
        )

        ev = _t(spark, sf, "events")
        baseline = build_baseline(ev, expr="value", metric="value",
                                  scale="linear", lo=0.0, hi=500.0, n_bins=25)
        out = daily_drift(ev, baseline, expr="value", metric="value",
                          scale="linear", lo=0.0, hi=500.0, n_bins=25)
        return out.select("day", "metric",
                          F.round("ks", 6).alias("ks"),
                          F.round("psi", 6).alias("psi"), "n")
    q["daily_drift_events"] = daily_drift_events

    def salted_count_events(spark, sf):
        """Two-phase salted per-key count (skew path) — must equal a plain
        GROUP BY, which is exactly what the oracle runs."""
        from mlcast_sourcedata_validator_spark.skew import salted_count

        ev = _t(spark, sf, "events")
        return salted_count(ev, ["user_id"], n_salts=8)
    q["salted_count_events"] = salted_count_events

    def skew_profile_events(spark, sf):
        """Hot-key profiler: top-20 user_ids by row count with share and
        x_mean — the measurement that decides where salting / AQE
        skew-splitting is needed (north_rule: 'salted repartitioning on
        skewed conv_id hot keys'). Counting is itself salted two-phase so
        profiling a skewed table does not straggle; top-k is TakeOrdered."""
        from mlcast_sourcedata_validator_spark.skew import skew_profile

        ev = _t(spark, sf, "events")
        return skew_profile(ev, ["user_id"], k=20, n_salts=8)
    q["skew_profile_events"] = skew_profile_events

    def cm_freq_events(spark, sf):
        """Count-Min point-frequency estimates for every distinct
        user_id vs exact counts (functions/sketch.py cm_sketch /
        cm_estimate): O(depth x width) mergeable state, est >= exact by
        construction (overcount column pins it), portable-hash cells so
        the DuckDB oracle builds the IDENTICAL sketch. width=512 keeps
        collisions present at test scale so the estimate-vs-exact
        relationship is exercised, not vacuous."""
        from mlcast_sourcedata_validator_spark.functions.sketch import (
            cm_estimate,
            cm_sketch,
        )

        ev = _t(spark, sf, "events")
        sk = cm_sketch(ev, "user_id", depth=4, width=512)
        probes = ev.select("user_id").where(
            F.col("user_id").isNotNull()).distinct()
        est = cm_estimate(sk, probes, "user_id", depth=4, width=512)
        exact = ev.where(F.col("user_id").isNotNull()) \
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
        return est.join(exact, "user_id").select(
            F.col("user_id").alias("key"), "n_exact",
            F.col("est").alias("n_est"),
            (F.col("est") - F.col("n_exact")).alias("overcount"))
    q["cm_freq_events"] = cm_freq_events

    def emd_drift_events(spark, sf):
        """Per-day integer-exact normalized Wasserstein-1 (EMD) of the
        value distribution vs the whole-table baseline
        (operators/drift.py daily_emd): cross-multiplied CDF-area form,
        emd_ppm as BIGINT, entirely in whole-stage codegen — the
        displacement-weighted complement of daily_drift_events' KS/PSI
        on the same linear 25-bin histograms."""
        from mlcast_sourcedata_validator_spark.operators.drift import (
            build_baseline,
            daily_emd,
        )

        ev = _t(spark, sf, "events")
        baseline = build_baseline(ev, expr="value", metric="value",
                                  scale="linear", lo=0.0, hi=500.0,
                                  n_bins=25)
        return daily_emd(ev, baseline, expr="value", metric="value",
                         scale="linear", lo=0.0, hi=500.0, n_bins=25)
    q["emd_drift_events"] = emd_drift_events

    def volume_anomaly_events(spark, sf):
        """Trailing-window volume monitor (operators/anomaly.py
        volume_anomaly): per (event_type, day) counts labeled
        SPIKE/DROP/OK/WARMUP against the type's own last-7-observed-days
        trail, verdicts by integer cross-multiplication (exact oracle).
        One O(keys x days) shuffle; the window runs on the daily table,
        never the raw stream."""
        from mlcast_sourcedata_validator_spark.operators.anomaly import (
            volume_anomaly,
        )

        ev = _t(spark, sf, "events")
        return volume_anomaly(ev, "event_type", "ts")
    q["volume_anomaly_events"] = volume_anomaly_events

    def benford_value_events(spark, sf):
        """Benford first-digit conformance of the value column
        (operators/anomaly.py benford_profile): quantize to integer
        cents, first digit from the decimal STRING (no float log10
        boundary bug), observed ppm by integer division vs shared
        literal expectations summing to exactly 1e6. <= 9 output rows
        whatever the input size."""
        from mlcast_sourcedata_validator_spark.operators.anomaly import (
            benford_profile,
        )

        ev = _t(spark, sf, "events")
        return benford_profile(ev, "value")
    q["benford_value_events"] = benford_value_events

    def zorder_values_events(spark, sf):
        """Morton (Z-order) clustering value per event over
        (user_id, value) at 8 bits/dim, min/max-normalized — the
        clustering key functions/layout.py zorder_write range-partitions
        on to give every interleaved column parquet min/max file
        skipping (the Delta OPTIMIZE ZORDER idea on plain parquet).
        Pure floor/shift/mask integer arithmetic == exact SQL oracle;
        the equi-depth variant + actual file-skipping wins are pinned in
        tests/test_layout.py."""
        from mlcast_sourcedata_validator_spark.functions import layout as lay

        ev = _t(spark, sf, "events")
        ranges = lay.profile_ranges(ev, ["user_id", "value"])
        return ev.select(
            "event_id", lay.zorder_expr(ranges, bits=8).alias("zval"))
    q["zorder_values_events"] = zorder_values_events

    def incremental_rollup_events(spark, sf):
        """Per-user rollup maintained INCREMENTALLY (functions/rollup.py):
        the two halves of the month are rolled up separately — as two
        date-partition deltas would be — then merged with the algebraic
        merge aggs over rollup rows only. Must equal the oracle's plain
        whole-table GROUP BY exactly, for any split."""
        from mlcast_sourcedata_validator_spark.functions.rollup import (
            keyed_rollup,
            merge_rollups,
        )

        ev = _t(spark, sf, "events")
        specs = {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "first_ts": (F.min("ts"), F.min("first_ts")),
            "last_ts": (F.max("ts"), F.max("last_ts")),
            "sum_value": (F.sum(F.col("value").cast("decimal(24,6)")),
                          F.sum("sum_value")),
            "n_purchases": (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
                F.sum("n_purchases"),
            ),
        }
        half = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
        parts = [keyed_rollup(ev.where(half), ["user_id"], specs),
                 keyed_rollup(ev.where(~half), ["user_id"], specs)]
        merged = merge_rollups(parts, ["user_id"], specs)
        return merged.select(
            "user_id", "n_events", "first_ts", "last_ts",
            F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"),
            "n_purchases",
        )
    q["incremental_rollup_events"] = incremental_rollup_events

    def dedup_keep_min_documents(spark, sf):
        """Exact dedup keeping the min-id representative of each
        identical-text group; documents are all distinct at these SFs so a
        duplicated slice is unioned in first."""
        d = _t(spark, sf, "documents")
        dup = d.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        return dd.exact_dedup(d.unionByName(dup), "doc_id", "text") \
                 .select("doc_id", "n_chars")
    q["dedup_keep_min_documents"] = dedup_keep_min_documents

    def incremental_dedup_documents(spark, sf):
        """Incremental exact dedup against a content-hash index
        (functions/dedup.py content_index_specs/dedup_against_index):
        the index covers doc_id < 250 (history); the rest of the corpus
        plus a duplicated slice arrive as the 'new batch' and are deduped
        against the index WITHOUT rescanning history. History ids are all
        smaller than batch ids, so the result equals the oracle's global
        keep-min dedup over the whole union exactly."""
        from mlcast_sourcedata_validator_spark.functions.dedup import (
            content_index_specs,
            dedup_against_index,
        )
        from mlcast_sourcedata_validator_spark.functions.rollup import (
            keyed_rollup,
        )

        d = _t(spark, sf, "documents")
        hist = d.where(F.col("doc_id") < 250)
        dup = d.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        batch = d.where(F.col("doc_id") >= 250).unionByName(dup)
        index = keyed_rollup(
            hist.withColumn("text_hash", F.md5("text")),
            ["text_hash"], content_index_specs("doc_id"),
        )
        kept_new = dedup_against_index(batch, index, "doc_id", "text")
        return hist.unionByName(kept_new).select("doc_id", "n_chars")
    q["incremental_dedup_documents"] = incremental_dedup_documents

    def bloom_incremental_dedup_documents(spark, sf):
        """Bloom-gated twin of incremental_dedup_documents
        (functions/bloom.py + dedup_against_index_bloom): a distributed
        sparse-built Bloom filter over the index's content hashes clears
        definitely-new batch content MAP-SIDE, so only probable hits
        (true dups + an fpp-bounded sliver) enter the exact anti-join.
        Row-identical to the exact form by construction — same oracle —
        while at 10^12 rows the daily index join shuffles ~(dup_rate +
        fpp) of the batch instead of all of it."""
        from mlcast_sourcedata_validator_spark.functions.dedup import (
            content_index_specs,
            dedup_against_index_bloom,
        )
        from mlcast_sourcedata_validator_spark.functions.rollup import (
            keyed_rollup,
        )

        d = _t(spark, sf, "documents")
        hist = d.where(F.col("doc_id") < 250)
        dup = d.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        batch = d.where(F.col("doc_id") >= 250).unionByName(dup)
        index = keyed_rollup(
            hist.withColumn("text_hash", F.md5("text")),
            ["text_hash"], content_index_specs("doc_id"),
        )
        kept_new = dedup_against_index_bloom(
            batch, index, "doc_id", "text", fpp=0.01, n_index=250
        )
        return hist.unionByName(kept_new).select("doc_id", "n_chars")
    q["bloom_incremental_dedup_documents"] = bloom_incremental_dedup_documents

    def budget_tail_events(spark, sf):
        """Per-user suffix under a weight budget (functions/packing.py
        tail_by_budget): each user's most recent events while their
        running value stays <= 300, ties broken by event_id. The
        context-window truncation primitive, relationally identical to
        'keep each conversation's latest K-token turns'."""
        from mlcast_sourcedata_validator_spark.functions.packing import (
            tail_by_budget,
        )

        ev = _t(spark, sf, "events")
        out = tail_by_budget(ev, ["user_id"], "ts", F.col("value"), 300.0,
                             tiebreak_cols=["event_id"])
        return out.select("event_id", "user_id", "value")
    q["budget_tail_events"] = budget_tail_events

    def table_diff_events(spark, sf):
        """Snapshot diff (functions/diff.py diff_tables): snapshot B is
        events with a deterministic edit script applied — value bumped
        where event_id%97==0 (changed), rows event_id%89==0 dropped
        (removed), 20 re-keyed rows appended (added). The diff must
        recover the exact edit script."""
        from mlcast_sourcedata_validator_spark.functions.diff import (
            diff_tables,
        )

        ev = _t(spark, sf, "events")
        b = (
            ev.where(F.col("event_id") % 89 != 0)
            .withColumn("value",
                        F.when(F.col("event_id") % 97 == 0,
                               F.round(F.col("value") + 1.0, 2))
                        .otherwise(F.col("value")))
            .unionByName(ev.where(F.col("event_id") < 20)
                         .withColumn("event_id",
                                     F.col("event_id") + 1_000_000))
        )
        out = diff_tables(ev, b, ["event_id"], ["event_type", "value"])
        return out.select("event_id", "change")
    q["table_diff_events"] = table_diff_events

    # --- TPC-H-ish analytics (scan/filter/agg/join/window/topk coverage) ---
    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )
    q["q1_pricing_summary"] = q1_pricing_summary

    def top_customers_revenue(spark, sf):
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy(F.desc("revenue"), F.col("c_custkey"))
            .limit(10)
        )
    q["top_customers_revenue"] = top_customers_revenue

    def nation_region_rollup(spark, sf):
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"))
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"))
        )
    q["nation_region_rollup"] = nation_region_rollup

    def lineitem_top_line_per_order(spark, sf):
        li = _t(spark, sf, "lineitem")
        w = W.partitionBy("l_orderkey").orderBy(
            F.desc("l_extendedprice"), F.col("l_linenumber")
        )
        return (
            li.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("l_orderkey", "l_linenumber",
                    F.round("l_extendedprice", 6).alias("l_extendedprice"))
        )
    q["lineitem_top_line_per_order"] = lineitem_top_line_per_order

    def sessionize_events(spark, sf):
        """Gap-based sessionization (30-min inactivity) via one window pass:
        lag-diff -> new-session flag -> running sum = session index."""
        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        gap = ts_us - F.lag(ts_us).over(w)
        new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
        return (
            ev.select("user_id", "ts", "event_id",
                      F.sum(new_s).over(w).alias("session_idx"))
            .groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
        )
    q["sessionize_events"] = sessionize_events

    def conv_text_equality_events(spark, sf):
        """north_star invariant: per-turn text equality under the stable
        window-ordered (conv_id, turn_idx) sort — per conversation, an
        order-sensitive md5 over the turn texts; any reorder or text drift
        changes the hash."""
        ev = _t(spark, sf, "events")
        rows = F.sort_array(F.collect_list(F.struct(
            F.col("ts"), F.col("event_id"),
            F.coalesce(F.col("props"), F.lit("")).alias("p"))))
        return (
            ev.groupBy(F.col("user_id").alias("conv_id"))
            .agg(
                F.md5(F.concat_ws("|", F.transform(rows, lambda r: r["p"])))
                .alias("text_hash"),
                F.count(F.lit(1)).alias("n_turns"),
            )
        )
    q["conv_text_equality_events"] = conv_text_equality_events

    # conversation-granular dedup family (functions/conversations.py) —
    # events mapped onto the transcript shape the same way as
    # conv_text_equality_events: user_id=conversation, (ts, event_id)=
    # stable turn order, props=turn text
    def conv_dedup_events(spark, sf):
        """Whole-conversation exact dedup: the event stream unioned with
        a conv-remapped copy of itself (every conversation logged twice
        under a shifted id); dedup_conversations keeps the min-id copy of
        each fingerprint, so exactly the original conversations' turns
        survive — order-sensitive fingerprints make this a unit-level
        dedup no turn-level hash can express."""
        from mlcast_sourcedata_validator_spark.functions.conversations import (
            dedup_conversations,
        )

        ev = _t(spark, sf, "events").select("user_id", "ts", "event_id",
                                            "props")
        dup = ev.withColumn("user_id", F.col("user_id") + 1_000_000)
        both = ev.unionByName(dup)
        out = dedup_conversations(both, "user_id", ["ts", "event_id"],
                                  "props")
        return out.select(
            F.col("user_id").alias("conv_id"),
            F.col("event_id"), F.col("props"))

    q["conv_dedup_events"] = conv_dedup_events

    def template_turns_events(spark, sf):
        """Template-turn detection: props values recurring in >= 5
        distinct conversations (canned/boilerplate turn content — the
        transcript analog of frequent-line web boilerplate)."""
        from mlcast_sourcedata_validator_spark.functions.conversations import (
            template_turns,
        )

        ev = _t(spark, sf, "events")
        return template_turns(ev, "user_id", "props", min_convs=5)

    q["template_turns_events"] = template_turns_events

    def prefix_pairs_events(spark, sf):
        """Prefix-containment dedup: each conversation unioned with a
        3-turn truncated re-log of itself under a shifted id; the
        detector must recover exactly the (truncated, original) pairs —
        the re-logged-agent-run duplicate neither turn-level nor
        whole-fingerprint dedup can see. Conversations whose first 3
        turns coincide with another conversation's prefix also pair (the
        detector reports ALL containments, not just planted ones) — the
        oracle mirrors the same construction so the sets match exactly."""
        from mlcast_sourcedata_validator_spark.functions.conversations import (
            prefix_containment_pairs,
        )

        ev = _t(spark, sf, "events").select("user_id", "ts", "event_id",
                                            "props")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        trunc = (
            ev.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 3).drop("_rn")
            .withColumn("user_id", F.col("user_id") + 1_000_000)
        )
        both = ev.unionByName(trunc)
        return prefix_containment_pairs(
            both, "user_id", ["ts", "event_id"], "props", prefix_depth=8)

    q["prefix_pairs_events"] = prefix_pairs_events

    def json_extract_events(spark, sf):
        """JSON payload probing (props is a JSON object {'k': int})."""
        ev = _t(spark, sf, "events")
        k = F.get_json_object("props", "$.k").cast("int")
        return (
            ev.where(F.col("props").isNotNull())
            .groupBy("event_type")
            .agg(F.round(F.avg(k), 6).alias("avg_k"),
                 F.sum(k).alias("sum_k"),
                 F.count(F.lit(1)).alias("n"))
        )
    q["json_extract_events"] = json_extract_events

    def percentiles_value_events(spark, sf):
        ev = _t(spark, sf, "events")
        pct = F.percentile("value", F.array(*[F.lit(p) for p in
                                              (0.25, 0.5, 0.75, 0.95)]))
        return ev.agg(
            F.round(pct[0], 6).alias("p25"),
            F.round(pct[1], 6).alias("p50"),
            F.round(pct[2], 6).alias("p75"),
            F.round(pct[3], 6).alias("p95"),
        )
    q["percentiles_value_events"] = percentiles_value_events

    def setop_users_without_high_value(spark, sf):
        """Distinct users with no high-value event (EXCEPT set semantics)."""
        ev = _t(spark, sf, "events")
        allu = ev.select("user_id").distinct()
        high = ev.where(F.col("value") > 450).select("user_id").distinct()
        return allu.exceptAll(high)
    q["setop_users_without_high_value"] = setop_users_without_high_value

    def intersect_clickers_and_buyers(spark, sf):
        """INTERSECT set semantics: users with both a click and a purchase."""
        ev = _t(spark, sf, "events")
        clicks = ev.where(F.col("event_type") == "click").select("user_id")
        buys = ev.where(F.col("event_type") == "purchase").select("user_id")
        return clicks.intersect(buys)
    q["intersect_clickers_and_buyers"] = intersect_clickers_and_buyers

    def quantile_sketch_events(spark, sf):
        """Mergeable quantile sketch (approx_percentile, the distributed
        scale path for percentiles): exact p50 plus a portable bound that
        the sketch landed within 1%% of it."""
        ev = _t(spark, sf, "events")
        exact = F.percentile("value", F.lit(0.5))
        appr = F.approx_percentile("value", F.lit(0.5), F.lit(10000))
        return ev.agg(
            F.round(exact, 6).alias("exact_p50"),
            (F.abs(appr - exact) <= 0.01 * F.abs(exact)).alias("sketch_within_1pct"),
        )
    q["quantile_sketch_events"] = quantile_sketch_events

    def semi_join_big_spenders(spark, sf):
        """left_semi membership: customers having >=1 order above 300k."""
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").where(F.col("o_totalprice") > 300000)
        return (
            c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 4).alias("c_acctbal"))
        )
    q["semi_join_big_spenders"] = semi_join_big_spenders

    def q3_shipping_priority(spark, sf):
        """TPC-H Q3 shape: filter both join sides, 3-way join (broadcast the
        pruned customer dim), revenue agg, top-10."""
        c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
        o = _t(spark, sf, "orders").where(
            F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp"))
        li = _t(spark, sf, "lineitem").where(
            F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4).alias("revenue"))
            .orderBy(F.desc("revenue"), F.col("l_orderkey"))
            .limit(10)
        )
    q["q3_shipping_priority"] = q3_shipping_priority

    def q18_large_volume_customer(spark, sf):
        """TPC-H Q18 shape: HAVING-filtered aggregate as a semi-join
        probe — find orders whose total quantity exceeds a threshold,
        then join customer + orders + lineitem and re-aggregate for the
        top-100. The probe output is order-keys only (bounded), so the
        driver-side shape is: one agg, one semi join, one re-agg; the
        customer dim is broadcast."""
        li = _t(spark, sf, "lineitem")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("_q"))
            .where(F.col("_q") > 250)
            .select("l_orderkey")
        )
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        return (
            li.join(big, "l_orderkey", "left_semi")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
            .limit(100)
        )
    q["q18_large_volume_customer"] = q18_large_volume_customer

    def rollup_region_nation(spark, sf):
        """Multi-level aggregate (ROLLUP): acctbal totals by (region,
        nation), per-region subtotals, and a grand total."""
        r = _t(spark, sf, "region")
        n = _t(spark, sf, "nation")
        c = _t(spark, sf, "customer")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .rollup(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"))
        )
    q["rollup_region_nation"] = rollup_region_nation

    def pivot_user_event_counts(spark, sf):
        """Pivot: per-user counts with one column per event type."""
        ev = _t(spark, sf, "events")
        piv = (
            ev.groupBy("user_id")
            .pivot("event_type", EVENT_DOMAIN + ["error"])
            .agg(F.count(F.lit(1)))
        )
        return piv.select(
            "user_id",
            *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"n_{c}")
              for c in EVENT_DOMAIN + ["error"]],
        )
    q["pivot_user_event_counts"] = pivot_user_event_counts

    def sql_api_revenue_by_priority(spark, sf):
        """Same engine through the spark.sql surface: testdata registered
        as temp views, the query text is ANSI SQL (identical to the
        oracle) — demonstrates the SQL entry point over the same Catalyst
        plans the DataFrame API builds."""
        from mlcast_sourcedata_validator_spark.sources.tables import (
            register_testdata_views,
        )

        register_testdata_views(spark, sf)
        return spark.sql("""
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_acctbal > 0
            GROUP BY o_orderpriority""")
    q["sql_api_revenue_by_priority"] = sql_api_revenue_by_priority

    def cube_status_priority_orders(spark, sf):
        """CUBE: all four grouping combinations of (status, priority)."""
        o = _t(spark, sf, "orders")
        return (
            o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 4).alias("revenue"))
        )
    q["cube_status_priority_orders"] = cube_status_priority_orders

    def orders_above_customer_avg(spark, sf):
        """Correlated-predicate shape (order > its customer's average),
        decorrelated as a single window pass instead of a per-row
        subquery — the scale-correct plan (one shuffle on o_custkey)."""
        o = _t(spark, sf, "orders")
        w = W.partitionBy("o_custkey")
        return (
            o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
            .where(F.col("o_totalprice") > 2 * F.col("cust_avg"))
            .select("o_orderkey", "o_custkey",
                    F.round("o_totalprice", 4).alias("o_totalprice"),
                    F.round("cust_avg", 2).alias("cust_avg"))
        )
    q["orders_above_customer_avg"] = orders_above_customer_avg

    def window_funcs_events(spark, sf):
        """Window-function breadth on one pass: lead (gap to next event),
        ntile quartile, cume_dist, first/last value over a unique
        (ts, event_id) ordering."""
        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        next_ts = F.lead("ts").over(w)
        return ev.select(
            "user_id", "event_id",
            (F.unix_micros(next_ts.cast("timestamp"))
             - F.unix_micros(F.col("ts").cast("timestamp"))).alias("gap_to_next_us"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("event_id").over(wf).alias("first_event_id"),
            F.last("event_id").over(wf).alias("last_event_id"),
        )
    q["window_funcs_events"] = window_funcs_events

    def unpivot_customer_balances(spark, sf):
        """Unpivot/melt: per-nation aggregate row widened to two metric
        columns, melted back to (nation, metric, val) long form."""
        c = _t(spark, sf, "customer")
        wide = c.groupBy("c_nationkey").agg(
            F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        return wide.unpivot("c_nationkey", ["sum_bal", "avg_bal"],
                            "metric", "val")
    q["unpivot_customer_balances"] = unpivot_customer_balances

    def pandas_udaf_median_value_events(spark, sf):
        """Grouped-aggregate pandas UDF (Arrow-batched UDAF surface):
        per-type median of value. np.median's midpoint interpolation
        equals quantile_cont(0.5)."""
        import numpy as np
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        # explicit functionType: this module's `from __future__ import
        # annotations` stringifies type hints, breaking inference
        @pandas_udf("double", PandasUDFType.GROUPED_AGG)
        def median_udaf(v):
            return float(np.median(v))

        # Spark disallows mixing pandas and native aggregates in one agg
        # (INVALID_PANDAS_UDF_PLACEMENT), so the count is pandas too
        @pandas_udf("long", PandasUDFType.GROUPED_AGG)
        def count_udaf(v):
            return len(v)

        ev = _t(spark, sf, "events")
        return ev.groupBy("event_type").agg(
            F.round(median_udaf("value"), 6).alias("median_value"),
            count_udaf("value").alias("n"),
        )
    q["pandas_udaf_median_value_events"] = pandas_udaf_median_value_events

    def udtf_sentences_documents(spark, sf):
        """Python UDTF (lateral table function surface): one output row
        per '. '-separated sentence with its position. API demonstration —
        a production text pipeline would use the JVM-side split/explode
        (text_profile); the UDTF exists to cover the UDTF registration +
        LATERAL join path."""
        from pyspark.sql.functions import udtf

        @udtf(returnType="pos int, sentence string")
        class Sentences:
            def eval(self, text: str):
                if text is None:
                    return
                for i, s in enumerate(text.split(". ")):
                    yield i, s

        spark.udtf.register("sentences_udtf", Sentences)
        _t(spark, sf, "documents").createOrReplaceTempView("docs_for_udtf")
        return spark.sql("""
            SELECT d.doc_id, s.pos, length(s.sentence) AS sentence_len
            FROM docs_for_udtf d, LATERAL sentences_udtf(d.text) s
            WHERE d.doc_id < 200""")
    q["udtf_sentences_documents"] = udtf_sentences_documents

    # --- dedup family -------------------------------------------------------
    def dedup_exact_documents(spark, sf):
        return dd.exact_dup_groups(_t(spark, sf, "documents"), "doc_id", "text") \
                 .select("text_hash", "n_docs")
    q["dedup_exact_documents"] = dedup_exact_documents

    def minhash_signatures_documents(spark, sf):
        return dd.minhash_signatures(_t(spark, sf, "documents"), "doc_id", "text")
    q["minhash_signatures_documents"] = minhash_signatures_documents

    def minhash_lsh_pairs_documents(spark, sf):
        """max_bucket_size=None: the exact parameterization matching the
        uncapped SQL banding oracle (the production default caps hot
        buckets at 10k — a documented approximation the oracle cannot
        express)."""
        return dd.minhash_lsh_candidates(
            _t(spark, sf, "documents"), "doc_id", "text",
            max_bucket_size=None,
        )
    q["minhash_lsh_pairs_documents"] = minhash_lsh_pairs_documents

    def ngram_jaccard_pairs_documents(spark, sf):
        """Bounded EXACT parameterization: the global path with a
        shingle document-frequency cap (max_shingle_df=1000). The cap
        bounds the join's worst-case fanout (a shingle shared by 1e5
        boilerplate docs is dropped instead of emitting 1e10 join rows)
        and the result equals the uncapped oracle exactly while no
        shingle exceeds it — true at every test SF, so this hash-matches
        at any gate scale. The library DEFAULT is the other bounded
        variant (method='auto': LSH candidates + array_intersect verify),
        which is preferable at corpus scale but is recall-bounded: at
        sf0.1 it recovers 255 of 256 >=0.5 pairs, missing one borderline
        — exactness was chosen for the oracle-paired query.
        hot_shingle_action='fail' turns the exactness precondition into a
        runtime assertion: if a shingle's document frequency ever exceeds
        the cap at gate scale, the query fails loudly instead of silently
        dropping pairs the uncapped oracle includes."""
        return dd.ngram_jaccard_pairs(
            _t(spark, sf, "documents"), "doc_id", "text", n=3, threshold=0.5,
            method="global", max_shingle_df=1000, hot_shingle_action="fail",
        )
    q["ngram_jaccard_pairs_documents"] = ngram_jaccard_pairs_documents

    def lsh_verified_near_dups_documents(spark, sf):
        """max_bucket_size=None: exact parameterization matching the
        uncapped SQL oracle (same pinning as minhash_lsh_pairs_documents
        and simhash_banded_pairs_documents — the production default caps
        hot buckets at 10k, which the oracle cannot express)."""
        return dd.lsh_verified_near_dups(
            _t(spark, sf, "documents"), "doc_id", "text", n=3, threshold=0.5,
            max_bucket_size=None,
        )
    q["lsh_verified_near_dups_documents"] = lsh_verified_near_dups_documents

    def simhash_documents(spark, sf):
        return dd.simhash(_t(spark, sf, "documents"), "doc_id", "text")
    q["simhash_documents"] = simhash_documents

    def simhash_pairs_documents(spark, sf):
        return dd.simhash_pairs(
            _t(spark, sf, "documents"), "doc_id", "text", max_hamming=3
        )
    q["simhash_pairs_documents"] = simhash_pairs_documents

    def simhash_banded_pairs_documents(spark, sf):
        """Banded (pigeonhole) SimHash pairs — must equal the O(n^2)
        self-join exactly, so it shares simhash_pairs' oracle SQL;
        max_bucket_size=None is the exact parameterization (the capped
        production default is an approximation once a 6-bit block bucket
        exceeds the cap, i.e. corpora beyond ~64x the cap)."""
        return dd.simhash_banded_pairs(
            _t(spark, sf, "documents"), "doc_id", "text", max_hamming=3,
            max_bucket_size=None,
        )
    q["simhash_banded_pairs_documents"] = simhash_banded_pairs_documents

    def embedding_near_dup_pairs(spark, sf):
        return dd.embedding_near_dup_pairs(
            _t(spark, sf, "embeddings"), "vec_id", "embedding", threshold=0.4
        )
    q["embedding_near_dup_pairs"] = embedding_near_dup_pairs

    def semantic_dedup_embeddings(spark, sf):
        """SemDeDup (Abbas et al. 2023) with n_lists=1 (single cluster):
        equals the global brute-force smaller-id-neighbor keep rule
        exactly, so the O(n^2) SQL is an exact oracle. The scale
        parameterization (n_lists sized to the corpus, KMeans fit on a
        sample, map-side assignment) is pinned as a survivor-superset in
        tests/test_functions.py."""
        e = _t(spark, sf, "embeddings")
        return sim.semantic_dedup(
            e, "vec_id", "embedding", threshold=0.4, n_lists=1, dim=64
        ).select("vec_id", "label")
    q["semantic_dedup_embeddings"] = semantic_dedup_embeddings

    def embedding_drift_embeddings(spark, sf):
        """Vector drift between two halves of the embeddings table
        (vec_id parity as current/baseline): mean-vector cosine + L2
        gap + norm shift. One pass per side — norm fold + posexplode
        share a select, per-dim sums ride one hash aggregate (shuffle
        = d rows/task), so the oracle is plain per-ordinality SQL."""
        emb = _t(spark, sf, "embeddings")
        return sim.embedding_drift(
            emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 0),
            emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 1),
        )
    q["embedding_drift_embeddings"] = embedding_drift_embeddings

    def embedding_lsh_near_dup_pairs_q(spark, sf):
        """Multi-table RHP-LSH near-dup pairs; every emitted pair is
        exact-cosine-verified, so the oracle is the brute-force SQL with
        the LSH's recall accounted for by a higher threshold that this
        dataset's pair distribution makes recall-complete."""
        return sim.embedding_lsh_near_dup_pairs(
            _t(spark, sf, "embeddings"), "vec_id", "embedding",
            threshold=0.4, n_tables=16, n_planes=2,
            dim=64,  # testdata embedding dim; explicit => no first-row probe job
        )
    q["embedding_lsh_near_dup_pairs"] = embedding_lsh_near_dup_pairs_q

    def dedup_clusters_documents(spark, sf):
        """Near-dup clustering: LSH-verified pairs -> connected components
        (iterative hash-min label propagation, converges in diameter
        rounds) -> cluster id/size/representative. Oracle: the same pairs
        via SQL + a WITH RECURSIVE transitive closure taking min reachable
        id. max_bucket_size=None: the recursive-CTE oracle is uncapped, so
        the Spark side must run the exact (uncapped) LSH candidate stage
        too."""
        return dd.dedup_clusters(
            _t(spark, sf, "documents"), "doc_id", "text", n=3, threshold=0.5,
            max_bucket_size=None,
        )
    q["dedup_clusters_documents"] = dedup_clusters_documents

    # --- similarity search --------------------------------------------------
    def embedding_cosine_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        return sim.cosine_topk(
            emb.where(F.col("vec_id") != 0), "vec_id", "embedding",
            [float(v) for v in qv], k=20,
        )
    q["embedding_cosine_topk"] = embedding_cosine_topk

    def cosine_topk_batch_embeddings(spark, sf):
        """Exact top-5 per query for 3 query vectors in ONE corpus scan
        (broadcast query set + window rank)."""
        emb = _t(spark, sf, "embeddings")
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return sim.cosine_topk_batch(
            emb.where(F.col("vec_id") >= 3), "vec_id", "embedding",
            qs, k=5,
        )
    q["cosine_topk_batch_embeddings"] = cosine_topk_batch_embeddings

    def ann_lsh_topk_embeddings(spark, sf):
        """RHP-LSH ANN run probe-all: the search goes through the full
        signature/bucket machinery but probes every bucket, so the result
        equals brute-force top-k EXACTLY and the window-rank SQL is an
        exact oracle (recall of the sublinear home-bucket/multiprobe
        settings is pinned separately in tests/test_functions.py)."""
        emb = _t(spark, sf, "embeddings")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        return sim.ann_lsh_topk(
            emb.where(F.col("vec_id") != 0), "vec_id", "embedding",
            [float(v) for v in qv], k=10, n_planes=8, probe_all=True,
        )
    q["ann_lsh_topk_embeddings"] = ann_lsh_topk_embeddings

    def ann_ivf_topk_embeddings(spark, sf):
        """IVF ANN run with nprobe == n_lists: every list is probed, so
        the result equals brute force regardless of where the KMeans
        centroids land — the exact-oracle parameterization (sublinear
        nprobe<n_lists recall is pinned in tests/test_functions.py)."""
        emb = _t(spark, sf, "embeddings")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        rest = emb.where(F.col("vec_id") != 0)
        cents = sim.ivf_fit(rest, "embedding", n_lists=8, seed=7)
        return sim.ivf_topk(rest, "vec_id", "embedding",
                            [float(v) for v in qv], cents, k=10, nprobe=8)
    q["ann_ivf_topk_embeddings"] = ann_ivf_topk_embeddings

    def pq_topk_embeddings(spark, sf):
        """Product-quantization ANN run with rerank_factor=None: every id
        flows from the compressed-codes ADC ranking into the exact
        cosine re-rank, so the result equals brute-force top-k EXACTLY
        regardless of codebook quality — the exact-oracle
        parameterization (the truncated-rerank scale path's recall is
        pinned in tests/test_pq.py)."""
        emb = _t(spark, sf, "embeddings")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        rest = emb.where(F.col("vec_id") != 0)
        books = sim.pq_fit(rest, "embedding", dim=64,
                           n_subspaces=8, n_codes=16, seed=7)
        enc = sim.pq_encode(rest, "vec_id", "embedding", books)
        return sim.pq_topk(enc, rest, "vec_id", "embedding",
                           [float(v) for v in qv], books, k=10,
                           rerank_factor=None)
    q["pq_topk_embeddings"] = pq_topk_embeddings

    def ivfpq_topk_embeddings(spark, sf):
        """Composed IVF-PQ persisted index (coarse partition pruning +
        PQ-coded residuals + ADC) searched in its exact
        parameterization: nprobe=n_lists probes every list and
        rerank_factor=None routes every id through the exact cosine
        re-rank, so the result equals brute-force top-k EXACTLY while
        executing the real prune -> ADC -> re-rank plan (partition +
        column pruning pinned in tests/test_pq.py)."""
        import tempfile

        emb = _t(spark, sf, "embeddings")
        qv = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        rest = emb.where(F.col("vec_id") != 0)
        idx = tempfile.mkdtemp(prefix="ivfpq_entry_") + "/index"
        sim.ivfpq_build_index(rest, "vec_id", "embedding", idx, dim=64,
                              n_lists=8, n_subspaces=8, n_codes=16, seed=7)
        return sim.ivfpq_topk(spark, idx, "vec_id", "embedding",
                              [float(v) for v in qv], k=10,
                              nprobe=8, rerank_factor=None)
    q["ivfpq_topk_embeddings"] = ivfpq_topk_embeddings

    # --- text analysis -------------------------------------------------------
    def text_profile_documents(spark, sf):
        return tx.text_profile(_t(spark, sf, "documents"), "doc_id", "text")
    q["text_profile_documents"] = text_profile_documents

    def langid_documents(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.select("lang", tx.lang_id(F.col("text")).alias("lang_guess"))
            .groupBy("lang", "lang_guess").agg(F.count(F.lit(1)).alias("n"))
        )
    q["langid_documents"] = langid_documents

    def lang_mix_documents(spark, sf):
        """CCNet-style per-segment language mix: segment-level LID vote
        (doc-level LID misses code-switched/template-mixed docs) ->
        per-doc majority language, share, distinct-language count.
        functions/text.py lang_mix."""
        return tx.lang_mix(_t(spark, sf, "documents"), "doc_id", "text")
    q["lang_mix_documents"] = lang_mix_documents

    def oov_rate_documents(spark, sf):
        """Release-over-release vocabulary coverage: word vocab induced
        from the source='web' slice, per-doc OOV rate measured on every
        OTHER source — OOV jumps when a new crawl source enters the mix
        before length/quality stats move. Broadcast Heaps-bounded vocab,
        one scan. functions/text.py oov_rate."""
        d = _t(spark, sf, "documents")
        ref = d.where(F.col("source") == "web")
        vocab = ref.select(
            F.explode(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))),
                              r"\s+")).alias("w")
        ).where(F.length("w") > 0).distinct()
        return tx.oov_rate(d.where(F.col("source") != "web"),
                           "doc_id", "text", vocab)
    q["oov_rate_documents"] = oov_rate_documents

    def text_repetition_documents(spark, sf):
        """Repetition quality signals (dup-sentence ratio, top-token
        share) — the degenerate-text filter of an LLM data pipeline."""
        return tx.text_repetition(_t(spark, sf, "documents"), "doc_id", "text")
    q["text_repetition_documents"] = text_repetition_documents

    def gopher_repetition_documents(spark, sf):
        """Gopher-style repetition quality signals (Rae et al. 2021):
        duplicate-line fractions + top-{2,3,4}-gram character coverage —
        the published repetition-filter family for LLM training data."""
        return tx.gopher_repetition(_t(spark, sf, "documents"), "doc_id", "text")
    q["gopher_repetition_documents"] = gopher_repetition_documents

    def gopher_quality_documents(spark, sf):
        """Gopher/MassiveText 7-rule document quality filter (Rae et
        al. 2021 appendix A1.1): integer cross-multiplied thresholds
        => exact verdicts, zero-shuffle map-side expressions.
        functions/text.py gopher_quality."""
        return tx.gopher_quality(_t(spark, sf, "documents"),
                                 "doc_id", "text")
    q["gopher_quality_documents"] = gopher_quality_documents

    def vocab_topk_documents(spark, sf):
        """Corpus-level vocabulary top-k (count desc, token asc —
        deterministic set under ties); TakeOrdered top-k, no full sort."""
        return tx.vocab_topk(_t(spark, sf, "documents"), "text", k=50)
    q["vocab_topk_documents"] = vocab_topk_documents

    def heavy_hitters_documents(spark, sf):
        """Bounded-state twin of vocab_topk_documents: Misra-Gries
        per-partition candidates (state capped at `capacity`, never a
        distinct-token-sized hash table) + exact broadcast-join recount
        (functions/sketch.py). Its default fail-loud mode certifies the
        result equals the one-pass exact top-k, so the oracle is the
        plain SQL."""
        from mlcast_sourcedata_validator_spark.functions import sketch as sk

        return sk.heavy_hitters(
            sk.token_keys(_t(spark, sf, "documents"), "text"),
            k=20, capacity=4096,
        )
    q["heavy_hitters_documents"] = heavy_hitters_documents

    def hot_users_events(spark, sf):
        """Hot-key discovery on events.user_id through the same
        bounded-state sketch — the skew_profile measurement re-expressed
        so it survives a key space that no longer fits executor hash
        tables (north_rule: finding the conv_id hot keys to salt)."""
        from mlcast_sourcedata_validator_spark.functions import sketch as sk

        keys = _t(spark, sf, "events").select(
            F.col("user_id").cast("string").alias("key"))
        return sk.heavy_hitters(keys, k=15, capacity=4096)
    q["hot_users_events"] = hot_users_events

    def corr_profile_events(spark, sf):
        """Pairwise Pearson corr + covariance profile
        (profiler.numeric_correlations): all pairs as codegen'd
        co-moment aggregates in ONE scan, long-form output via a
        driver-free explode of the single aggregate row. Spark/DuckDB
        co-moment merges agree to ~1e-14; rounded to 6."""
        from mlcast_sourcedata_validator_spark.profiler import (
            numeric_correlations,
        )

        e = _t(spark, sf, "events")
        out = numeric_correlations(e, ["event_id", "user_id", "value"])
        return out.select(
            "col_a", "col_b",
            F.round("corr", 6).alias("corr"),
            F.round("covar", 6).alias("covar"),
            "n",
        )
    q["corr_profile_events"] = corr_profile_events

    def bm25_topk_documents(spark, sf):
        """BM25 keyword top-15 (functions/search.py): one stats agg job
        (N/avgdl/df as plan literals), then map-side scoring + TakeOrdered
        — no join, no shuffle. Ranked on the ROUNDED score with doc_id
        tiebreak so boundary membership is engine-stable (scores tie
        exactly in a bag-of-words corpus; ln() may differ 1 ULP)."""
        from mlcast_sourcedata_validator_spark.functions import search as srch

        d = _t(spark, sf, "documents")
        terms = ["spark", "merge", "window"]
        st = srch.bm25_stats(d, terms)
        score = srch.bm25_score_expr(F.col("text"), terms, st)
        return (
            d.select("doc_id", F.round(score, 6).alias("score"))
            .where(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(15)
        )
    q["bm25_topk_documents"] = bm25_topk_documents

    def pii_profile_documents(spark, sf):
        """Per-doc PII screen (email/ipv4/ssn/phone regexp counts) plus a
        redaction-idempotence bit: redacted == original iff no PII —
        both the detector and the redaction chain execute under the
        oracle compare (the synthetic corpus is PII-free, so the value
        content is the all-clear; crafted-fixture tests carry the
        positive cases)."""
        d = _t(spark, sf, "documents")
        prof = tx.pii_profile(d, "doc_id", "text")
        red = tx.redact_pii(d, "text", "red").select(
            "doc_id", (F.md5("red") == F.md5("text")).alias("redact_noop"))
        return prof.join(red, "doc_id")
    q["pii_profile_documents"] = pii_profile_documents

    def decontaminate_documents(spark, sf):
        """Benchmark decontamination: every 50th doc plays the EVAL set,
        the rest are training docs; flags = exact md5 hit OR >= 3 shared
        word-3-gram codes (n=3 because the synthetic docs are short; the
        production default window is 13)."""
        d = _t(spark, sf, "documents")
        ev = d.where(F.col("doc_id") % 50 == 0)
        tr = d.where(F.col("doc_id") % 50 != 0)
        return dd.decontaminate_flags(tr, "doc_id", "text", ev, "text",
                                      n=3, min_hits=3)
    q["decontaminate_documents"] = decontaminate_documents

    def sample_mixture_documents(spark, sf):
        """Deterministic training-mix reweighting: per-language keep
        rates applied via an id-derived portable uniform (md5 -> encw ->
        uhash / P) — retry-stable, partitioning-independent, and
        reproduced bit-for-bit by the DuckDB oracle. Map-side filter,
        zero shuffle."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.sample_by_mixture(
            d, "doc_id", "lang",
            {"en": 1.0, "de": 0.4, "fr": 0.1}, default=0.02, seed=7,
        ).select("doc_id", "lang")
    q["sample_mixture_documents"] = sample_mixture_documents

    def stratified_cap_documents(spark, sf):
        """At most 20 docs per source, deterministically ranked by the
        portable uniform (one window shuffle on the stratum key)."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.stratified_cap(d, "source", "doc_id", k=20, seed=7) \
                 .select("doc_id", "source")
    q["stratified_cap_documents"] = stratified_cap_documents

    def upsample_mixture_documents(spark, sf):
        """Full mixture weighting (weights > 1 repeat rows with 0-based
        copy indices; fractional parts resolved by the portable
        deterministic uniform)."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.upsample_mixture(
            d, "doc_id", "lang", {"en": 2.5, "de": 1.0}, default=0.5, seed=7,
        ).select("doc_id", "lang", "copy_idx")
    q["upsample_mixture_documents"] = upsample_mixture_documents

    def pack_sequences_documents(spark, sf):
        """Concat-then-chunk sequence packing (GPT-style pretraining
        layout): docs laid out by id within each source shard, chunked
        every 512 whitespace tokens; emits each doc's pack id/offset and
        a straddles flag. Pure window prefix-sum arithmetic — exact
        DuckDB oracle."""
        from mlcast_sourcedata_validator_spark.functions import packing as pk

        d = _t(spark, sf, "documents").withColumn(
            "n_toks", F.size(F.split(F.col("text"), " ")))
        return pk.pack_sequences(d, "doc_id", "n_toks", budget=512,
                                 partition_col="source")
    q["pack_sequences_documents"] = pack_sequences_documents

    def prioritized_dedup_documents(spark, sf):
        """Cross-source preference dedup: pretend rank = doc_id % 3 and
        keep the best-ranked copy of each distinct text (ties by min
        id). Returns (doc_id, rank) of survivors."""
        d = _t(spark, sf, "documents").withColumn(
            "rank", (F.col("doc_id") % 3).cast("int"))
        return dd.prioritized_dedup(d, "doc_id", "text", "rank") \
                 .select("doc_id", "rank")
    q["prioritized_dedup_documents"] = prioritized_dedup_documents

    def token_count_stage_documents(spark, sf):
        """Tokenizer-faithful counting stage (functions/text.py
        count_tokens): one Arrow mapInPandas pass resolving a pluggable
        tokenizer factory per task. Uses the deterministic ~4-chars/
        token stub (no real tokenizer in this container — the PIL-
        pattern degrade) so the DuckDB oracle can mirror the count
        formula exactly; a real tiktoken/HF factory changes only the
        closure, not the Spark plumbing under test here."""
        from mlcast_sourcedata_validator_spark.functions import text as tx

        def stub_factory():
            return lambda texts: [0 if not t else max(1, (len(t) + 3) // 4)
                                  for t in texts]

        d = _t(spark, sf, "documents").select("doc_id", "text")
        return tx.count_tokens(d, "text", tokenizer_factory=stub_factory) \
                 .select("doc_id", "n_tokens")
    q["token_count_stage_documents"] = token_count_stage_documents

    def shuffle_shards_documents(spark, sf):
        """Deterministic global shuffle: every doc gets a pseudo-random
        shard in [0, 8) and a contiguous 1-based position within it —
        integer-only universal-hash arithmetic, so the DuckDB oracle
        reproduces the full (shard, pos) layout exactly."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.shuffle_into_shards(d, "doc_id", n_shards=8, seed=11) \
                 .select("doc_id", "shard_id", "shard_pos")
    q["shuffle_shards_documents"] = shuffle_shards_documents

    def deterministic_take_documents(spark, sf):
        """Exact-k deterministic global sample (k rows of smallest
        (u(id), id)): TakeOrdered per-partition heaps, retry/engine-
        stable selection the oracle reproduces bit-for-bit."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.deterministic_take(d, "doc_id", k=100, seed=5) \
                 .select("doc_id", "lang", "source")
    q["deterministic_take_documents"] = deterministic_take_documents

    def normalized_dedup_documents(spark, sf):
        """Near-exact dedup over the C4/Dolma-style normalization key
        (lowercase + whitespace collapse): keep-min over
        md5(normalize_text(text)) — catches case/whitespace variants
        byte-exact dedup misses; same one-shuffle shape."""
        d = _t(spark, sf, "documents")
        survivors = dd.exact_dedup(
            d.withColumn("_norm", tx.normalize_text(F.col("text"))),
            "doc_id", "_norm",
        )
        return survivors.select("doc_id", "source")
    q["normalized_dedup_documents"] = normalized_dedup_documents

    def dsir_weights_documents(spark, sf):
        """DSIR importance weights (arXiv:2302.03169): hashed bag-of-words
        bucket models for target (lang='en') vs raw corpus, per-doc
        quantized log-likelihood-ratio weight. Scoring is a zero-shuffle
        map-side `aggregate` over the token array with the 256-bucket
        log-ratio table as a plan literal; the only distributed extra is
        one bounded bucket-distribution agg. Integer weights => exact
        oracle."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.dsir_weights(d, "doc_id", "text", F.col("lang") == "en",
                               n_buckets=256, seed=7) \
                 .select("doc_id", "weight_q")
    q["dsir_weights_documents"] = dsir_weights_documents

    def dsir_resample_documents(spark, sf):
        """DSIR selection step: Gumbel-top-k over weight/T + Gumbel(u(id))
        — sampling-without-replacement proportional to exp(weight/T),
        deterministic because the noise derives from the id. TakeOrdered
        (per-partition heaps + driver merge), no global sort."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.dsir_resample(d, "doc_id", "text", F.col("lang") == "en",
                                k=100, n_buckets=256, temperature=1.0,
                                seed=7) \
                 .select("doc_id", "weight_q", "dsir_key")
    q["dsir_resample_documents"] = dsir_resample_documents

    def lm_ppl_documents(spark, sf):
        """CCNet-style hashed bigram-LM quality score (arXiv:1911.00359):
        fit bucketed bigram counts on the lang='en' slice (one bounded
        agg), score every doc with a ZERO-SHUFFLE map-side aggregate over
        its token array (quantized log tables as plan literals). Integer
        log-probs => exact oracle. functions/lm.py."""
        from mlcast_sourcedata_validator_spark.functions import lm

        d = _t(spark, sf, "documents")
        return lm.lm_score(d, "doc_id", "text", F.col("lang") == "en",
                           n_ctx=256, n_pair=4096, seed=7) \
                 .select("doc_id", "logprob_q", "n_bigrams")
    q["lm_ppl_documents"] = lm_ppl_documents

    def nb_classify_documents(spark, sf):
        """fastText-analog hashed Naive-Bayes quality filter (GPT-3
        appx A / CCNet): closed-form fit on lang='en' vs rest (one
        bounded token agg + one scalar agg), ZERO-SHUFFLE scoring via a
        literal weight table. Integer log-odds => exact oracle.
        functions/classify.py."""
        from mlcast_sourcedata_validator_spark.functions import classify

        d = _t(spark, sf, "documents")
        return classify.nb_score(d, "doc_id", "text",
                                 F.col("lang") == "en", n_feat=2048,
                                 seed=7) \
                       .select("doc_id", "score_q", "n_tokens", "pred")
    q["nb_classify_documents"] = nb_classify_documents

    def semantic_decontaminate_embeddings(spark, sf):
        """Embedding-space benchmark decontamination (fuzzy complement
        of the exact/shingle decontaminate_documents): label=0 vectors
        are the 'eval set'; every other row is flagged when its max
        cosine to any eval vector clears 0.45. Broadcast eval join, one
        corpus scan, map-side codegen'd dot products.
        functions/similarity.py semantic_decontaminate."""
        from mlcast_sourcedata_validator_spark.functions import similarity

        e = _t(spark, sf, "embeddings")
        return similarity.semantic_decontaminate(
            e.where(F.col("label") != 0), e.where(F.col("label") == 0),
            "vec_id", "embedding", threshold=0.45, dim=64)
    q["semantic_decontaminate_embeddings"] = semantic_decontaminate_embeddings

    def bpe_vocab_documents(spark, sf):
        """Distributed BPE vocabulary induction (Sennrich et al. 2016):
        learn 12 merges from the corpus — vocab-bounded iteration, one
        small agg job per merge. Oracle = the same loop as 12 chained
        DuckDB CTE stages. functions/bpe.py."""
        from mlcast_sourcedata_validator_spark.functions import bpe

        model, _ = bpe.bpe_learn(_t(spark, sf, "documents"), "text",
                                 n_merges=12)
        return bpe.bpe_merge_table(spark, model)
    q["bpe_vocab_documents"] = bpe_vocab_documents

    def bpe_tokenize_documents(spark, sf):
        """Learn 12 BPE merges, then segment the training corpus via the
        broadcast vocab-lookup join (zero re-derivation): per-doc token
        count + md5 fingerprint of the token stream. functions/bpe.py."""
        from mlcast_sourcedata_validator_spark.functions import bpe

        d = _t(spark, sf, "documents")
        _, vocab = bpe.bpe_learn(d, "text", n_merges=12)
        return bpe.bpe_tokenize(d, "doc_id", "text", vocab)
    q["bpe_tokenize_documents"] = bpe_tokenize_documents

    def weighted_sample_documents(spark, sf):
        """Efraimidis–Spirakis weighted sampling without replacement
        (exponential race: k earliest -ln(u(id))/weight arrivals),
        inclusion probability proportional to n_chars — deterministic
        id-derived noise, TakeOrderedAndProject (no global sort).
        functions/sampling.py `weighted_take`."""
        from mlcast_sourcedata_validator_spark.functions import sampling as sp

        d = _t(spark, sf, "documents")
        return sp.weighted_take(d, "doc_id", "n_chars", k=200, seed=7) \
                 .select("doc_id", "n_chars", "race_key")
    q["weighted_sample_documents"] = weighted_sample_documents

    def duplicate_spans_documents(spark, sf):
        """Exact duplicate-substring spans (arXiv:2107.06499): per-doc
        count of length-60 char windows whose content repeats anywhere in
        the corpus + the hottest window's occurrence count. Map-side HOF
        window generation; shuffles only the md5 count groupBy and the
        md5-keyed match join. The winnowed fingerprint mode is the scale
        path (subset + coverage guarantee pinned in tests/test_dsir.py)."""
        d = _t(spark, sf, "documents")
        spans = dd.duplicate_spans(d, "doc_id", "text", min_len=60)
        return spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.max("n_occ").alias("max_occ"))
    q["duplicate_spans_documents"] = duplicate_spans_documents

    def quantized_embeddings(spark, sf):
        """Symmetric per-vector int8 quantization + worst reconstruction
        error — map-side array expressions, IEEE-identical in DuckDB."""
        return sim.quantize_embeddings(
            _t(spark, sf, "embeddings"), "vec_id", "embedding")
    q["quantized_embeddings"] = quantized_embeddings

    def _event_row_sig():
        """Canonical per-row signature for stream fingerprinting —
        engine-portable pieces only (epoch micros, not rendered
        timestamps; no doubles)."""
        return F.concat_ws(
            "\x1f",
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            F.col("event_id").cast("string"),
            F.col("event_type"),
            F.coalesce(F.col("props"), F.lit("")),
        )

    def stream_fingerprint_events(spark, sf):
        """Commutative multiset fingerprint per user stream
        (functions/dedup.py stream_fingerprint): constant-size algebraic
        partials (count, bit_xor, sum mod P) instead of the collect_list
        fingerprint's ship-every-row shuffle — the 100-TB shape for
        whole-stream identity."""
        return dd.stream_fingerprint(
            _t(spark, sf, "events"), "user_id", _event_row_sig())
    q["stream_fingerprint_events"] = stream_fingerprint_events

    def duplicate_streams_events(spark, sf):
        """Re-ingested-stream detection: clone every user_id % 10 == 3
        stream under a fresh key (deterministic fixture corruption,
        mirrored in the oracle), then find fingerprint-colliding keys —
        the duplicate-conversation class that (conv_id, turn_idx)
        uniqueness is blind to."""
        ev = _t(spark, sf, "events")
        clones = ev.where(F.col("user_id") % 10 == 3).withColumn(
            "user_id", F.col("user_id") + F.lit(1000000))
        dup = dd.duplicate_streams(
            ev.unionByName(clones), "user_id", _event_row_sig())
        return dup.select(
            "n_rows", "fp_xor", "fp_sum", "n_keys",
            F.array_join(F.col("keys").cast("array<string>"), ",")
            .alias("keys"))
    q["duplicate_streams_events"] = duplicate_streams_events

    def frequent_spans_documents(spark, sf):
        """Corpus boilerplate profiler: word 3-grams by document frequency
        (per-document distinct, so spammy repeats count once). One
        explode + one map-side-partial groupBy."""
        from mlcast_sourcedata_validator_spark.functions import (
            boilerplate as bp)

        return bp.frequent_spans(_t(spark, sf, "documents"),
                                 "doc_id", "text", n=3, min_df=5)
    q["frequent_spans_documents"] = frequent_spans_documents

    def boilerplate_removed_documents(spark, sf):
        """CCNet-style frequent-line removal, exercised at word
        granularity (the fixture text is newline-free): every token
        appearing in >=60% of documents is stripped; surviving tokens
        rejoin in original order, all-boilerplate/NULL docs come back
        ''. The DuckDB oracle reproduces the reassembly exactly."""
        from mlcast_sourcedata_validator_spark.functions import (
            boilerplate as bp)

        d = _t(spark, sf, "documents")
        min_df = d.count() * 6 // 10  # integer arithmetic == the oracle's
        return bp.remove_frequent_lines(
            d, "doc_id", "text", min_df=min_df, delimiter=" ",
        ).select("doc_id", "text")
    q["boilerplate_removed_documents"] = boilerplate_removed_documents

    def pipeline_clean_documents(spark, sf):
        """The composed training-data pipeline: text profiling -> quality +
        language filter -> exact dedup -> per-language summary. All stages
        are the library operators chained as one lazy plan (Catalyst fuses
        the profile expressions into the scan; the only shuffles are the
        dedup hash-agg and the final groupBy)."""
        d = _t(spark, sf, "documents")
        prof = tx.text_profile(d, "doc_id", "text")
        keep = prof.where(
            (F.col("quality") >= 0.66) & (F.col("lang_guess") == "en")
        ).select("doc_id")
        kept = d.join(keep, "doc_id", "left_semi")
        deduped = dd.exact_dedup(kept, "doc_id", "text")
        return deduped.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    q["pipeline_clean_documents"] = pipeline_clean_documents

    # --- temporal joins (as-of, binned interval) ----------------------------
    def asof_last_purchase_events(spark, sf):
        """As-of join within events: every event gets the user's most
        recent purchase at-or-before its ts. Union + single-window plan
        (one shuffle, no range explosion) — joins.asof_join."""
        from mlcast_sourcedata_validator_spark.functions.joins import asof_join

        ev = _t(spark, sf, "events")
        purch = (
            ev.where(F.col("event_type") == "purchase")
            # one right row per (user_id, ts): deterministic tie-break
            .groupBy("user_id", F.col("ts").alias("pts"))
            .agg(F.max_by("event_id", "event_id").alias("last_purchase_id"),
                 F.max_by("value", "event_id").alias("pv"))
        )
        out = asof_join(
            ev.select("event_id", "user_id", "ts"), purch,
            on=["user_id"], left_ts="ts", right_ts="pts",
            payload_cols=["last_purchase_id", "pv"],
        )
        return out.select(
            "event_id", "user_id", "ts", "last_purchase_id",
            F.round("pv", 6).alias("last_purchase_value"),
        )
    q["asof_last_purchase_events"] = asof_last_purchase_events

    def range_count_purchase_window_events(spark, sf):
        """Binned point-in-interval join: for each purchase, how many
        events (any user) land in [ts, ts+10min)."""
        from mlcast_sourcedata_validator_spark.functions.joins import (
            point_in_interval_join,
        )

        ev = _t(spark, sf, "events")
        points = ev.select(F.col("event_id").alias("pid"),
                           F.col("ts").alias("pts"))
        ivs = ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("interval 10 minutes")).alias("w_end"),
        )
        m = point_in_interval_join(points, ivs, "pts", "w_start", "w_end",
                                   bin_width_sec=600)
        return m.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_events"))
    q["range_count_purchase_window_events"] = range_count_purchase_window_events

    def q5_local_supplier_volume(spark, sf):
        """TPC-H Q5 shape: 6-way join (two broadcast dims), local-supplier
        predicate c_nationkey == s_nationkey, revenue by nation."""
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders").where(
            (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")))
        li = _t(spark, sf, "lineitem")
        s = _t(spark, sf, "supplier")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .where(c.c_nationkey == s.s_nationkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4).alias("revenue"))
        )
    q["q5_local_supplier_volume"] = q5_local_supplier_volume

    def q14_promo_revenue(spark, sf):
        """TPC-H Q14 shape: lineitem x part equi-join (part is the
        broadcast dim), conditional aggregation ratio — covers the PART
        table and the broadcast-dim + CASE-agg pattern."""
        li = _t(spark, sf, "lineitem").where(
            (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp")))
        p = _t(spark, sf, "part")
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
        return (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6)
                 .alias("promo_revenue_pct"))
        )
    q["q14_promo_revenue"] = q14_promo_revenue

    def running_revenue_customers(spark, sf):
        """Cumulative window: per-customer running order revenue in
        (o_orderdate, o_orderkey) order — deterministic summation order,
        so the rounded running totals match the oracle exactly."""
        o = _t(spark, sf, "orders")
        w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey") \
             .rowsBetween(W.unboundedPreceding, W.currentRow)
        seq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return o.select(
            "o_custkey", "o_orderkey",
            F.row_number().over(seq).alias("order_seq"),
            F.round(F.sum("o_totalprice").over(w), 4).alias("running_rev"),
        )
    q["running_revenue_customers"] = running_revenue_customers

    def dim_stats_embeddings(spark, sf):
        """Per-dimension stats via posexplode — array column unpivoted to
        (dim, value) rows, then a plain hash aggregate."""
        emb = _t(spark, sf, "embeddings")
        ex = emb.select(F.posexplode("embedding").alias("dim", "v"))
        return ex.groupBy("dim").agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("avg_v"),
            F.round(F.min(F.col("v").cast("double")), 6).alias("min_v"),
            F.round(F.max(F.col("v").cast("double")), 6).alias("max_v"),
        )
    q["dim_stats_embeddings"] = dim_stats_embeddings

    def cardinality_sketch_events(spark, sf):
        """HLL sketch (north_star cardinality path): exact distinct count
        plus a boolean that the 2%-rsd approx_count_distinct landed within
        5% of it — the sketch value itself is engine-specific, the bound
        is portable."""
        ev = _t(spark, sf, "events")
        return ev.agg(
            F.count_distinct("user_id").alias("exact_users"),
            (
                F.abs(F.approx_count_distinct("user_id", 0.02)
                      - F.count_distinct("user_id"))
                <= 0.05 * F.count_distinct("user_id")
            ).alias("approx_within_5pct"),
        )
    q["cardinality_sketch_events"] = cardinality_sketch_events

    # --- structured streaming (watermark + tumbling window, availableNow) ---
    _stream_seq = [0]

    def _start_stream(spark, agg, qname, output_mode="complete"):
        """Start + drain an availableNow stream with state partitions
        sized to the drain, not the batch default.

        A stateful operator creates one state-store instance PER shuffle
        partition, and that count is frozen into the checkpoint at the
        first micro-batch; every batch then pays per-instance commit +
        task overhead. The session default (2x cores, for batch scans) is
        the wrong size for a bounded drain: measured at sf0.1 (3 reps,
        medians), dedup 7.4s @64 -> 2.0s @8 and hourly 2.8s @64 -> 1.0s
        @8 (BENCH/stream_state_partitions_r04.json). Sizing rule at real
        scale: state partitions ~ live-key volume / executor heap, set
        ONCE for the checkpoint's lifetime — a continuous 10^12-turn
        stream sizes UP; these single-batch drains size down to 8."""
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q_ = (agg.writeStream.outputMode(output_mode).format("memory")
                  .queryName(qname).trigger(availableNow=True).start())
            q_.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    def streaming_hourly_counts_events(spark, sf):
        """Hourly tumbling-window aggregate computed by Structured Streaming
        (readStream over the parquet file, 1h watermark, availableNow
        trigger, memory sink) — the drained result must equal the batch
        GROUP BY the oracle runs."""
        _stream_seq[0] += 1
        qname = f"stream_hourly_{_stream_seq[0]}"
        sch = _t(spark, sf, "events").schema
        s = (
            spark.readStream.schema(sch)
            # FileStreamSource needs a directory or glob, not a plain file
            .parquet(os.path.join(sf, "events*.parquet"))
            # watermark requires TIMESTAMP; NTZ->TZ cast is lossless under
            # the UTC session timezone
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        # sum over DECIMAL, not DOUBLE: decimal addition is exact and
        # order-independent, so the streaming state-store merge order
        # (which varies under load) can never diverge from the batch
        # oracle at a round() boundary; a binary double never ties at a
        # decimal midpoint, so the per-value cast agrees across engines
        agg = (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(24,6)"))
                         .cast("double"), 4).alias("sum_value"))
        )
        _start_stream(spark, agg, qname)
        return spark.sql(
            f"SELECT w.start AS hour_start, n_events, sum_value FROM {qname}"
        )
    q["streaming_hourly_counts_events"] = streaming_hourly_counts_events

    def streaming_dedup_events(spark, sf):
        """Stateful streaming dedup: the event stream unioned with itself
        (every row arrives twice), dropDuplicatesWithinWatermark on
        event_id removes the copies, then a per-type aggregate. Result
        must equal the batch DISTINCT the oracle runs.

        dropDuplicatesWithinWatermark — NOT plain dropDuplicates — so the
        keyed dedup state is BOUNDED: a key's state is evicted once the
        event-time watermark passes its timestamp + delay, instead of
        growing with total distinct keys forever (the 100-TB hazard).

        Delay sizing rule (operational, from Spark's own watermark
        contract): the delay must cover the maximum event-time disorder
        between duplicate arrivals. When DRAINING A BACKLOG with
        availableNow, that disorder is the backlog's whole event-time
        span — if the planner splits the drain into multiple
        micro-batches, a duplicate's second copy can arrive after the
        watermark advanced past most of the month, where a short delay
        would both evict its key's state and late-drop legitimately
        deduped rows nondeterministically. Hence 40 days > the 31-day
        table span for the drain; in live operation the backlog is
        minutes and the same rule yields a small delay. State remains
        eviction-bounded to one delay-window of keys either way."""
        _stream_seq[0] += 1
        qname = f"stream_dedup_{_stream_seq[0]}"
        sch = _t(spark, sf, "events").schema
        src = os.path.join(sf, "events*.parquet")

        def _read():
            return (
                spark.readStream.schema(sch).parquet(src)
                # watermark needs TIMESTAMP; NTZ->TZ lossless under UTC
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )

        dedup = (
            _read().unionByName(_read())
            .withWatermark("ts", "40 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        # decimal-accumulated sum: exact + order-independent (see
        # streaming_hourly) — retry-stable at the correctness gate
        agg = dedup.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(24,6)"))
                    .cast("double"), 4).alias("sum_value"),
        )
        _start_stream(spark, agg, qname)
        return spark.sql(
            f"SELECT event_type, n_events, sum_value FROM {qname}"
        )
    q["streaming_dedup_events"] = streaming_dedup_events

    def streaming_hot_types_events(spark, sf):
        """Streaming windowed Misra-Gries heavy hitters
        (streaming/hot_keys.py): per-day top-5 event types through the
        bounded-state applyInPandasWithState operator — state per
        in-flight window is O(capacity) counters regardless of key
        cardinality, evicted by event-time timeout. capacity=64 >> the
        handful of distinct types, so no decrement ever runs and the
        drained latest-snapshot top-k equals the batch exact per-window
        top-k the oracle computes (the certified regime; saturation is
        unit-tested in test_hot_keys_stream.py)."""
        from mlcast_sourcedata_validator_spark.streaming.hot_keys import (
            hot_keys_stream,
            latest_topk_sql,
        )

        _stream_seq[0] += 1
        qname = f"stream_hotk_{_stream_seq[0]}"
        sch = _t(spark, sf, "events").schema
        s = (
            spark.readStream.schema(sch)
            .parquet(os.path.join(sf, "events*.parquet"))
        )
        out = hot_keys_stream(s, "event_type", ts_col="ts",
                              window="1 day", watermark="1 day",
                              capacity=64)
        # arbitrary-stateful operators only run in append mode
        _start_stream(spark, out, qname, output_mode="append")
        return spark.sql(latest_topk_sql(qname, 5))
    q["streaming_hot_types_events"] = streaming_hot_types_events

    def streaming_sessions_events(spark, sf):
        """Native session-window aggregation in Structured Streaming:
        F.session_window(ts, gap) merges overlapping per-event windows
        in the state store — the streaming twin of the in-window batch
        sessionize_events (which builds sessions with a lag-diff window
        pass). Boundary semantics are [start, end): an event at exactly
        prev_ts + gap starts a NEW session, so the oracle's gap test is
        >=, not > (the batch sessionize uses > — a deliberate, pinned
        difference between the two definitions).

        Session state is per (user, open session) and is evicted once
        the watermark passes a session's end — bounded by concurrently
        open sessions, not history (the 100-TB shape)."""
        _stream_seq[0] += 1
        qname = f"stream_sessions_{_stream_seq[0]}"
        sch = _t(spark, sf, "events").schema
        s = (
            spark.readStream.schema(sch)
            .parquet(os.path.join(sf, "events*.parquet"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        _start_stream(spark, agg, qname)
        return spark.sql(
            f"SELECT user_id, w.start AS session_start, "
            f"w.end AS session_end, n_events FROM {qname}"
        )
    q["streaming_sessions_events"] = streaming_sessions_events

    def streaming_join_events(spark, sf):
        """Stream-stream inner join: each purchase matched to the same
        user's clicks in the preceding hour — the remaining Structured
        Streaming join capability (tumbling agg, dedup, sessions are
        covered by the other streaming queries). Both sides carry
        event-time watermarks and the join condition bounds the time
        range, so each side's buffered state is evicted once the other
        side's watermark passes the range — state is bounded by the
        1-hour horizon, not history (the 100-TB shape). Oracle = the
        identical batch range join."""
        _stream_seq[0] += 1
        qname = f"stream_join_{_stream_seq[0]}"
        sch = _t(spark, sf, "events").schema

        def _side(kind, alias):
            return (
                spark.readStream.schema(sch)
                .parquet(os.path.join(sf, "events*.parquet"))
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .where(F.col("event_type") == kind)
                .selectExpr(f"user_id AS {alias}_user",
                            f"event_id AS {alias}_id",
                            f"ts AS {alias}_ts")
                .withWatermark(f"{alias}_ts", "1 hour")
            )

        joined = _side("purchase", "p").join(
            _side("click", "c"),
            F.expr("p_user = c_user AND "
                   "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
            "inner",
        )
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            s_q = (joined.writeStream.outputMode("append").format("memory")
                   .queryName(qname).trigger(availableNow=True).start())
            s_q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        return spark.sql(
            f"SELECT p_user AS user_id, p_id AS purchase_id, "
            f"c_id AS click_id FROM {qname}")
    q["streaming_join_events"] = streaming_join_events

    def trailing_7d_spend_events(spark, sf):
        """Event-time RANGE window frame: per purchase, the user's
        purchase-value sum over the trailing 7 days — rangeBetween on
        epoch seconds (a peer-inclusive value frame, the primitive ROWS
        frames cannot express). One shuffle on user_id; decimal sum so
        the frame's accumulation order can't move a rounded double."""
        ev = _t(spark, sf, "events").where(F.col("event_type") == "purchase")
        # micros, not seconds: unix_timestamp truncates sub-second parts
        # and the frame boundary would then disagree with the oracle's
        # full-resolution interval arithmetic
        epoch = F.unix_micros(F.col("ts").cast("timestamp"))
        w = (W.partitionBy("user_id").orderBy(epoch)
             .rangeBetween(-7 * 86400 * 1_000_000, 0))
        return ev.select(
            "user_id", "event_id",
            F.round(F.sum(F.col("value").cast("decimal(24,6)")).over(w)
                    .cast("double"), 4).alias("trailing_7d_spend"),
            F.count(F.lit(1)).over(w).alias("trailing_7d_purchases"),
        )
    q["trailing_7d_spend_events"] = trailing_7d_spend_events

    def chunked_documents(spark, sf):
        """Context-window chunking: 500-char chunks, stride 400 (100-char
        overlap) — pure map-side sequence+explode+substring, zero
        shuffle. functions/text.py `chunk_documents`."""
        from mlcast_sourcedata_validator_spark.functions.text import (
            chunk_documents)
        d = _t(spark, sf, "documents")
        return chunk_documents(d, "doc_id", "text", size=500, stride=400) \
            .select("doc_id", "chunk_no",
                    F.md5("chunk_text").alias("chunk_md5"),
                    F.length("chunk_text").alias("chunk_len"))
    q["chunked_documents"] = chunked_documents

    # --- multimodal plumbing (pandas UDF over binary payloads) --------------
    def frame_sample_documents(spark, sf):
        """Row-expanding frame extraction over the fake media payload —
        offsets computed JVM-side, one row per 64-byte 'frame'."""
        d = mm.attach_fake_media(_t(spark, sf, "documents"), "text")
        fr = mm.frame_sample(d, "doc_id", "media", every_n_bytes=64)
        return fr.select("doc_id", "frame_no",
                         F.length("frame_bytes").alias("frame_len"))
    q["frame_sample_documents"] = frame_sample_documents

    def multimodal_meta_documents(spark, sf):
        d = mm.attach_fake_media(_t(spark, sf, "documents"), "text")
        return mm.extract_media_meta(d, "doc_id", "media")
    q["multimodal_meta_documents"] = multimodal_meta_documents

    def funnel_conversion_events(spark, sf):
        """Ordered view->click->purchase funnel: per-user greedy
        earliest-completion fold over ONE sorted collect (a single
        user-key shuffle; the textbook k-step funnel is k-1 self-joins).
        functions/behavior.py `funnel_counts`."""
        from mlcast_sourcedata_validator_spark.functions.behavior import (
            funnel_counts)
        ev = _t(spark, sf, "events")
        return funnel_counts(ev, ["view", "click", "purchase"],
                             order_col="event_id")
    q["funnel_conversion_events"] = funnel_conversion_events

    def cohort_retention_events(spark, sf):
        """Weekly cohort retention matrix in a SINGLE user-key shuffle:
        groupBy(user).agg(min, collect_set(week)) -> explode -> count.
        functions/behavior.py `cohort_retention`."""
        from mlcast_sourcedata_validator_spark.functions.behavior import (
            cohort_retention)
        return cohort_retention(_t(spark, sf, "events"))
    q["cohort_retention_events"] = cohort_retention_events

    def loop_runs_events(spark, sf):
        """Gaps-and-islands repeat-run profile per user: longest
        consecutive run of an identical event_type, qualifying-run and
        repeated-row counts. One user-key exchange (lag change-flag +
        running-sum run id share the window); run lengths reduce
        map-side before their shuffle. The analytics twin of the
        consecutive_dup check kind. functions/behavior.py
        `repeat_runs`."""
        from mlcast_sourcedata_validator_spark.functions.behavior import (
            repeat_runs)
        return repeat_runs(_t(spark, sf, "events"), "user_id",
                           ["ts", "event_id"], "event_type", min_run=3)
    q["loop_runs_events"] = loop_runs_events

    def reconcile_orders_lineitem(spark, sf):
        """Cross-table aggregate reconciliation (header vs detail): per
        order, sum(extprice*(1-disc)*(1+tax)) over lineitem compared to
        the declared o_totalprice. One key shuffle with map-side
        partials; the join is between aggregate-sized relations.
        functions/behavior.py `reconcile_aggregates` (the engine behind
        the declarative `reconciliation` check kind)."""
        from mlcast_sourcedata_validator_spark.functions.behavior import (
            reconcile_aggregates)
        li = _t(spark, sf, "lineitem")
        orders = _t(spark, sf, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
        bad = reconcile_aggregates(
            li, orders, "l_orderkey",
            [{"agg_sql":
              "round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2)",
              "expect": "o_totalprice", "atol": 0.01}])
        return bad.select(
            "l_orderkey",
            F.col("actual_str").cast("double").alias("lineitem_total"),
            F.col("expected_str").cast("double").alias("o_totalprice"))
    q["reconcile_orders_lineitem"] = reconcile_orders_lineitem

    return q


def _all_oracles() -> dict[str, str]:
    dom = ", ".join(f"'{d}'" for d in EVENT_DOMAIN)

    o: dict[str, str] = {}

    o["stats_events"] = """
        SELECT count(*)::BIGINT AS n_rows,
               count(DISTINCT user_id)::BIGINT AS n_users,
               min(ts) AS min_ts, max(ts) AS max_ts,
               sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_props,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value,
               round(avg(value), 6) AS avg_value
        FROM events"""

    o["temporal_coverage_events"] = """
        SELECT min(ts) AS min_ts, max(ts) AS max_ts,
               round((epoch_us(max(ts)) - epoch_us(min(ts))) / 86400.0e6, 6)
                 AS span_days
        FROM events"""

    o["uniqueness_events"] = """
        SELECT event_id, count(*)::BIGINT AS n FROM events
        GROUP BY event_id HAVING count(*) > 1"""

    o["dup_groups_events"] = """
        SELECT user_id, event_type, count(*)::BIGINT AS n FROM events
        GROUP BY user_id, event_type HAVING count(*) >= 20"""

    o["domain_violations_events"] = f"""
        SELECT event_type, count(*)::BIGINT AS n_violations FROM events
        WHERE lower(trim(event_type)) NOT IN ({dom})
        GROUP BY event_type"""

    o["refint_events_registry"] = """
        SELECT user_id, count(*)::BIGINT AS n_events FROM events
        WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey >= 10)
        GROUP BY user_id"""

    o["ordering_regressions_events"] = """
        WITH lagged AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS lag_ts
          FROM events)
        SELECT user_id, count(*)::BIGINT AS n_regressions FROM lagged
        WHERE lag_ts IS NOT NULL AND ts < lag_ts GROUP BY user_id"""

    o["timestep_analysis_events"] = """
        WITH lagged AS (
          SELECT user_id,
                 epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY event_id)) AS dt
          FROM events)
        SELECT user_id, count(DISTINCT dt)::BIGINT AS n_unique_diffs,
               (count(DISTINCT dt) > 1) AS has_variable
        FROM lagged WHERE dt IS NOT NULL GROUP BY user_id"""

    o["role_grammar_violations_events"] = """
        WITH lagged AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY event_id) AS prev_type,
                 row_number() OVER
                   (PARTITION BY user_id ORDER BY event_id) AS rn
          FROM events)
        SELECT CASE WHEN rn = 1 THEN '<start>'
                    WHEN prev_type IN ('click','view','purchase','signup')
                      THEN prev_type
                    ELSE 'error' END AS from_type,
               event_type AS to_type,
               count(*)::BIGINT AS n
        FROM lagged
        WHERE (rn = 1 AND event_type NOT IN ('signup','view','click'))
           OR (rn > 1 AND NOT (
                (prev_type = 'signup'   AND event_type IN ('view','click')) OR
                (prev_type = 'view'     AND event_type IN ('view','click')) OR
                (prev_type = 'click'    AND event_type IN ('view','click','purchase')) OR
                (prev_type = 'purchase' AND event_type IN ('view','click'))))
        GROUP BY 1, 2"""

    o["hist_value_events"] = """
        SELECT least(greatest(floor(value / 500.0 * 25)::BIGINT + 1, 1), 25)::INT
                 AS bucket,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1"""

    o["drift_psi_events"] = """
        WITH hist AS (
          SELECT least(greatest(floor(value / 500.0 * 25)::BIGINT + 1, 1), 25) AS bucket,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS b
          FROM events GROUP BY 1),
        tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM hist)
        SELECT round(sum(
          (greatest(a/ta, 1e-6) - greatest(b/tb, 1e-6))
          * ln(greatest(a/ta, 1e-6) / greatest(b/tb, 1e-6))), 6) AS psi
        FROM hist, tot"""

    o["categorical_drift_events"] = """
        WITH hist AS (
          SELECT CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' THEN 2
                                 WHEN 'signup' THEN 3 WHEN 'view' THEN 4
                                 ELSE 5 END AS bucket,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END) AS a,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS b
          FROM events GROUP BY 1),
        tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM hist)
        SELECT round(sum(abs(a/ta - b/tb)) / 2, 6) AS tvd,
               round(sum(
                 (greatest(a/ta, 1e-6) - greatest(b/tb, 1e-6))
                 * ln(greatest(a/ta, 1e-6) / greatest(b/tb, 1e-6))), 6) AS psi
        FROM hist, tot"""

    o["daily_drift_events"] = """
        WITH hist AS (
          SELECT ts::DATE AS day,
                 least(greatest(floor(value / 500.0 * 25)::BIGINT + 1, 1), 25) AS bucket,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        base AS (
          SELECT least(greatest(floor(value / 500.0 * 25)::BIGINT + 1, 1), 25) AS bucket,
                 count(*) AS c
          FROM events GROUP BY 1),
        grid AS (
          SELECT d.day, t.range AS bucket
          FROM (SELECT DISTINCT day FROM hist) d, range(1, 26) t),
        filled AS (
          SELECT g.day, g.bucket,
                 coalesce(h.c, 0)::DOUBLE AS cur,
                 coalesce(b.c, 0)::DOUBLE AS bas
          FROM grid g
          LEFT JOIN hist h ON g.day = h.day AND g.bucket = h.bucket
          LEFT JOIN base b ON g.bucket = b.bucket),
        tot AS (
          SELECT day, sum(cur) AS na, (SELECT sum(c) FROM base)::DOUBLE AS nb
          FROM filled GROUP BY day),
        cum AS (
          SELECT f.day,
                 sum(f.cur) OVER (PARTITION BY f.day ORDER BY f.bucket) / t.na AS ca,
                 sum(f.bas) OVER (PARTITION BY f.day ORDER BY f.bucket) / t.nb AS cb,
                 greatest(f.cur / t.na, 1e-6) AS p,
                 greatest(f.bas / t.nb, 1e-6) AS q2,
                 t.na
          FROM filled f JOIN tot t ON f.day = t.day)
        SELECT day, 'value' AS metric,
               round(max(abs(ca - cb)), 6) AS ks,
               round(sum((p - q2) * ln(p / q2)), 6) AS psi,
               max(na)::BIGINT AS n
        FROM cum GROUP BY day"""

    o["salted_count_events"] = """
        SELECT user_id, count(*)::BIGINT AS count FROM events GROUP BY user_id"""

    # Morton interleave unrolled to shift/mask/or terms (the exact
    # expression shape of layout.zorder_expr at 8 bits/dim; dimension
    # order user_id=even positions, value=odd).
    _z_terms = " | ".join(
        [f"(((qu >> {i}) & 1) << {2 * i})" for i in range(8)]
        + [f"(((qv >> {i}) & 1) << {2 * i + 1})" for i in range(8)]
    )
    o["zorder_values_events"] = f"""
        WITH r AS (SELECT CAST(min(user_id) AS DOUBLE) AS ulo,
                          CAST(max(user_id) AS DOUBLE) AS uhi,
                          CAST(min(value) AS DOUBLE) AS vlo,
                          CAST(max(value) AS DOUBLE) AS vhi
                   FROM events),
        q AS (SELECT event_id,
                     GREATEST(0, LEAST(255, CAST(FLOOR(
                         (CAST(user_id AS DOUBLE) - r.ulo) / (r.uhi - r.ulo)
                         * 256.0) AS BIGINT))) AS qu,
                     GREATEST(0, LEAST(255, CAST(FLOOR(
                         (CAST(value AS DOUBLE) - r.vlo) / (r.vhi - r.vlo)
                         * 256.0) AS BIGINT))) AS qv
              FROM events, r)
        SELECT event_id, CAST({_z_terms} AS BIGINT) AS zval FROM q"""

    o["skew_profile_events"] = """
        WITH c AS (SELECT user_id, count(*)::BIGINT AS n_rows
                   FROM events GROUP BY user_id),
        t AS (SELECT sum(n_rows)::BIGINT AS total,
                     count(*)::BIGINT AS n_keys FROM c)
        SELECT user_id, n_rows,
               ROUND(n_rows::DOUBLE / total, 6) AS share,
               ROUND(n_rows::DOUBLE * n_keys / total, 6) AS x_mean
        FROM c, t ORDER BY n_rows DESC, user_id ASC LIMIT 20"""

    from mlcast_sourcedata_validator_spark.operators.anomaly import (
        benford_profile_sql,
        volume_anomaly_sql,
    )

    o["volume_anomaly_events"] = volume_anomaly_sql(
        "events", "event_type", "ts")
    o["benford_value_events"] = benford_profile_sql("events", "value")

    from mlcast_sourcedata_validator_spark.functions.sketch import (
        cm_freq_sql,
    )

    o["cm_freq_events"] = cm_freq_sql("events", "user_id", depth=4,
                                      width=512)

    # same bucketing literal as daily_drift_events' oracle; both sides
    # densify to the full 25-bucket grid before the cumulative sums
    _emd_b = "least(greatest(floor(value / 500.0 * 25)::BIGINT + 1, 1), 25)"
    o["emd_drift_events"] = f"""
        WITH hist AS (
          SELECT ts::DATE AS day, {_emd_b} AS bucket,
                 count(*)::BIGINT AS cnt
          FROM events GROUP BY 1, 2),
        base AS (
          SELECT {_emd_b} AS bucket, count(*)::BIGINT AS cnt
          FROM events GROUP BY 1),
        bins AS (SELECT unnest(generate_series(1, 25)) AS bucket),
        base_f AS (
          SELECT b.bucket, COALESCE(base.cnt, 0) AS cnt
          FROM bins b LEFT JOIN base USING (bucket)),
        nb AS (SELECT sum(cnt)::BIGINT AS nb FROM base_f),
        cb AS (
          SELECT bucket,
                 sum(cnt) OVER (ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_b
          FROM base_f),
        grid AS (SELECT day, bucket
                 FROM (SELECT DISTINCT day FROM hist) CROSS JOIN bins),
        cur_f AS (
          SELECT g.day, g.bucket, COALESCE(h.cnt, 0) AS cnt
          FROM grid g LEFT JOIN hist h USING (day, bucket)),
        cc AS (
          SELECT day, bucket,
                 sum(cnt) OVER (PARTITION BY day ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_a,
                 sum(cnt) OVER (PARTITION BY day)::BIGINT AS na
          FROM cur_f)
        SELECT cc.day, max(cc.na)::BIGINT AS n,
               ((sum(CASE WHEN cc.bucket < 25
                          THEN abs(cc.cum_a * nb.nb - cb.cum_b * cc.na)
                          ELSE 0 END) * 1000000)
                // (max(cc.na) * max(nb.nb) * 24))::BIGINT AS emd_ppm
        FROM cc JOIN cb USING (bucket) CROSS JOIN nb
        GROUP BY cc.day"""

    o["incremental_dedup_documents"] = """
        WITH all_docs AS (
          SELECT doc_id, text, n_chars FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text, n_chars FROM documents
          WHERE doc_id < 50),
        keep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
                 FROM all_docs GROUP BY 1)
        SELECT a.doc_id, a.n_chars FROM all_docs a
        JOIN keep k ON a.doc_id = k.doc_id"""

    # the Bloom prefilter never changes the answer (a Bloom "no" has no
    # false negatives; every "maybe" is re-checked exactly) — same oracle
    o["bloom_incremental_dedup_documents"] = o["incremental_dedup_documents"]

    o["fd_violations_events"] = """
        WITH r AS (
          SELECT user_id, event_id, event_type AS value,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS prev_value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id) AS rn
          FROM events)
        SELECT user_id, event_id, prev_value, value
        FROM r WHERE rn > 1 AND prev_value IS DISTINCT FROM value"""

    _scd2_full_sql = """
        WITH l AS (
          SELECT user_id, event_id, event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS prev,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id) AS rn
          FROM events),
        cp AS (
          SELECT user_id, event_type, event_id AS valid_from FROM l
          WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER (
                 PARTITION BY user_id ORDER BY valid_from) AS valid_to,
               lead(valid_from) OVER (
                 PARTITION BY user_id ORDER BY valid_from) IS NULL
                 AS is_current
        FROM cp"""
    o["scd2_user_state_events"] = _scd2_full_sql
    # incremental merge must equal the one-shot full derivation — the
    # whole point of the operator — so it shares the oracle
    o["scd2_merge_events"] = _scd2_full_sql

    o["disorder_profile_events"] = """
        WITH l AS (
          SELECT greatest(0, epoch_us(max(ts) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
                 - epoch_us(ts)) / 1000000.0 AS late_s
          FROM events),
        c AS (SELECT coalesce(late_s, 0.0) AS late_s FROM l)
        SELECT count(*) AS n_events,
               sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS n_late,
               round(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)
                     / count(*), 6) AS late_frac,
               round(quantile_cont(late_s, 0.5), 6) AS p50_late_s,
               round(quantile_cont(late_s, 0.9), 6) AS p90_late_s,
               round(quantile_cont(late_s, 0.99), 6) AS p99_late_s,
               round(max(late_s), 6) AS max_late_s
        FROM c"""

    o["budget_tail_events"] = """
        WITH r AS (
          SELECT event_id, user_id, value,
                 sum(value::DECIMAL(18,2)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS running
          FROM events)
        SELECT event_id, user_id, value FROM r WHERE running <= 300"""

    o["table_diff_events"] = """
        WITH b AS (
          SELECT event_id, event_type,
                 CASE WHEN event_id % 97 = 0 THEN round(value + 1.0, 2)
                      ELSE value END AS value
          FROM events WHERE event_id % 89 <> 0
          UNION ALL
          SELECT event_id + 1000000, event_type, value
          FROM events WHERE event_id < 20),
        d AS (
          SELECT coalesce(a.event_id, b.event_id) AS event_id,
                 CASE WHEN a.event_id IS NULL THEN 'added'
                      WHEN b.event_id IS NULL THEN 'removed'
                      WHEN a.event_type IS DISTINCT FROM b.event_type
                        OR a.value IS DISTINCT FROM b.value THEN 'changed'
                 END AS change
          FROM events a FULL OUTER JOIN b ON a.event_id = b.event_id)
        SELECT event_id, change FROM d WHERE change IS NOT NULL"""

    o["incremental_rollup_events"] = """
        SELECT user_id,
               count(*)::BIGINT AS n_events,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               round(sum(value::DECIMAL(24,6))::DOUBLE, 4) AS sum_value,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
                 AS n_purchases
        FROM events GROUP BY user_id"""

    o["dedup_keep_min_documents"] = """
        WITH all_docs AS (
          SELECT doc_id, text, n_chars FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text, n_chars FROM documents WHERE doc_id < 50),
        keep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
                 FROM all_docs GROUP BY 1)
        SELECT a.doc_id, a.n_chars FROM all_docs a
        JOIN keep k ON a.doc_id = k.doc_id"""

    o["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 6) AS sum_qty,
               round(sum(l_extendedprice), 6) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*)::BIGINT AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""

    o["top_customers_revenue"] = """
        SELECT c_custkey, c_name, round(sum(o_totalprice), 4) AS revenue,
               count(*)::BIGINT AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 10"""

    o["nation_region_rollup"] = """
        SELECT r_name AS region, count(*)::BIGINT AS n_customers,
               round(sum(c_acctbal), 4) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name"""

    o["lineitem_top_line_per_order"] = """
        WITH ranked AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber) AS rn
          FROM lineitem)
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 6) AS l_extendedprice
        FROM ranked WHERE rn = 1"""

    o["sessionize_events"] = """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM flagged)
        SELECT user_id, session_idx::BIGINT AS session_idx,
               count(*)::BIGINT AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY user_id, session_idx"""

    o["conv_text_equality_events"] = """
        SELECT user_id AS conv_id,
               md5(string_agg(coalesce(props, ''), '|' ORDER BY ts, event_id))
                 AS text_hash,
               count(*)::BIGINT AS n_turns
        FROM events GROUP BY user_id"""

    o["conv_dedup_events"] = """
        WITH unioned AS (
          SELECT user_id, ts, event_id, props FROM events
          UNION ALL
          SELECT user_id + 1000000, ts, event_id, props FROM events),
        fp AS (
          SELECT user_id,
                 md5(string_agg(md5(coalesce(props, '')), '|'
                                ORDER BY ts, event_id)) AS f
          FROM unioned GROUP BY user_id),
        keep AS (
          SELECT user_id FROM (
            SELECT user_id,
                   row_number() OVER (PARTITION BY f ORDER BY user_id) AS rn
            FROM fp) WHERE rn = 1)
        SELECT b.user_id::BIGINT AS conv_id, b.event_id, b.props
        FROM unioned b JOIN keep k USING (user_id)"""

    o["template_turns_events"] = """
        SELECT md5(coalesce(props, '')) AS text_hash,
               min(props) AS text,
               count(DISTINCT user_id)::BIGINT AS n_convs,
               count(*)::BIGINT AS n_turns
        FROM events
        GROUP BY md5(coalesce(props, ''))
        HAVING count(DISTINCT user_id) >= 5"""

    o["prefix_pairs_events"] = """
        WITH ev AS (SELECT user_id, ts, event_id, props FROM events),
        trunc AS (
          SELECT user_id + 1000000 AS user_id, ts, event_id, props FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM ev) WHERE rn <= 3),
        unioned AS (SELECT * FROM ev UNION ALL SELECT * FROM trunc),
        g AS (SELECT user_id,
                     list(md5(coalesce(props, '')) ORDER BY ts, event_id)
                       AS hashes,
                     count(*)::BIGINT AS n
              FROM unioned GROUP BY user_id),
        shorts AS (SELECT user_id AS short_conv,
                          md5(array_to_string(hashes, '|')) AS h,
                          n AS n_short
                   FROM g WHERE n <= 8),
        longs AS (SELECT user_id AS long_conv, k AS n_short,
                         md5(array_to_string(hashes[1:k], '|')) AS h
                  FROM g, unnest(generate_series(1, least(n - 1, 8))) AS t(k)
                  WHERE n >= 2)
        SELECT short_conv::BIGINT AS short_conv,
               long_conv::BIGINT AS long_conv,
               n_short::BIGINT AS n_short
        FROM shorts JOIN longs USING (h, n_short)"""

    o["json_extract_events"] = """
        SELECT event_type,
               round(avg((props->>'k')::INT), 6) AS avg_k,
               sum((props->>'k')::INT)::BIGINT AS sum_k,
               count(*)::BIGINT AS n
        FROM events WHERE props IS NOT NULL GROUP BY event_type"""

    o["percentiles_value_events"] = """
        SELECT round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.75), 6) AS p75,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events"""

    o["setop_users_without_high_value"] = """
        SELECT DISTINCT user_id FROM events
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE value > 450"""

    o["intersect_clickers_and_buyers"] = """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'"""

    o["quantile_sketch_events"] = """
        SELECT round(quantile_cont(value, 0.5), 6) AS exact_p50,
               true AS sketch_within_1pct
        FROM events"""

    o["semi_join_big_spenders"] = """
        SELECT c_custkey, c_name, round(c_acctbal, 4) AS c_acctbal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)"""

    o["q3_shipping_priority"] = """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""

    o["q18_large_volume_customer"] = """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

    o["rollup_region_nation"] = """
        SELECT r_name AS region, n_name AS nation,
               count(*)::BIGINT AS n_customers,
               round(sum(c_acctbal), 4) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)"""

    pivot_cols = ",\n               ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
        for t in EVENT_DOMAIN + ["error"]
    )
    o["pivot_user_event_counts"] = f"""
        SELECT user_id,
               {pivot_cols}
        FROM events GROUP BY user_id"""

    o["sql_api_revenue_by_priority"] = """
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
               round(sum(o_totalprice), 4) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY o_orderpriority"""

    o["cube_status_priority_orders"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*)::BIGINT AS n_orders,
               round(sum(o_totalprice), 4) AS revenue
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

    o["orders_above_customer_avg"] = """
        WITH wa AS (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
          FROM orders)
        SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice,
               round(cust_avg, 2) AS cust_avg
        FROM wa WHERE o_totalprice > 2 * cust_avg"""

    o["window_funcs_events"] = """
        SELECT user_id, event_id,
               epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_to_next_us,
               ntile(4) OVER w AS quartile,
               round(cume_dist() OVER w, 6) AS cume,
               first_value(event_id) OVER wf AS first_event_id,
               last_value(event_id) OVER wf AS last_event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)"""

    o["unpivot_customer_balances"] = """
        WITH wide AS (
          SELECT c_nationkey, round(sum(c_acctbal), 4) AS sum_bal,
                 round(avg(c_acctbal), 4) AS avg_bal
          FROM customer GROUP BY c_nationkey)
        SELECT c_nationkey, 'sum_bal' AS metric, sum_bal AS val FROM wide
        UNION ALL
        SELECT c_nationkey, 'avg_bal' AS metric, avg_bal AS val FROM wide"""

    o["pandas_udaf_median_value_events"] = """
        SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value,
               count(*)::BIGINT AS n
        FROM events GROUP BY event_type"""

    o["udtf_sentences_documents"] = """
        WITH s AS (
          SELECT doc_id,
                 unnest(range(len(string_split(text, '. '))))::INT AS pos,
                 unnest(string_split(text, '. ')) AS sentence
          FROM documents WHERE doc_id < 200)
        SELECT doc_id, pos, length(sentence)::INT AS sentence_len FROM s"""

    o["dedup_exact_documents"] = """
        SELECT md5(text) AS text_hash, count(*)::BIGINT AS n_docs
        FROM documents GROUP BY 1 HAVING count(*) > 1"""

    # --- portable-hash dedup oracles ---------------------------------------
    wsh_mh = word_shingles_sql("t", 3)
    x = encw_sql("s")
    minhash_cols = ",\n               ".join(
        f"min({uhash_sql('x', j)})::BIGINT AS h{j}" for j in range(len(MINHASH_COEFFS))
    )
    minhash_cte = f"""
        WITH sh AS (
          SELECT doc_id, {x} AS x FROM (
            SELECT doc_id, unnest({wsh_mh}) AS s FROM
              (SELECT doc_id, string_split(text, ' ') AS t FROM documents))),
        mh AS (
          SELECT doc_id,
               {minhash_cols}
          FROM sh GROUP BY doc_id)"""

    o["minhash_signatures_documents"] = minhash_cte + "\n        SELECT * FROM mh"

    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"concat_ws('-', h{b * 4}, h{b * 4 + 1}, h{b * 4 + 2}, h{b * 4 + 3}) AS sig "
        f"FROM mh"
        for b in range(4)
    )
    o["minhash_lsh_pairs_documents"] = minhash_cte + f""",
        bands AS ({band_selects})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id"""

    wsh3 = word_shingles_sql("t", 3)
    o["lsh_verified_near_dups_documents"] = minhash_cte + f""",
        bands AS ({band_selects}),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
        shl AS (
          SELECT doc_id, list_distinct({wsh3}) AS sh FROM
            (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
        SELECT id_a, id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
                 AS jaccard
        FROM cand JOIN shl a ON id_a = a.doc_id JOIN shl b ON id_b = b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5"""

    # connected components over the LSH-verified pairs: transitive
    # closure via WITH RECURSIVE, cluster id = min reachable node
    o["dedup_clusters_documents"] = ("WITH RECURSIVE " + minhash_cte.replace(
        "\n        WITH ", "", 1
    ) + f""",
        bands2 AS ({band_selects}),
        cand2 AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands2 a JOIN bands2 b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
        shl2 AS (
          SELECT doc_id, list_distinct({wsh3}) AS sh FROM
            (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        pairs AS (
          SELECT id_a, id_b
          FROM cand2 JOIN shl2 a ON id_a = a.doc_id JOIN shl2 b ON id_b = b.doc_id
          WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        tc(node, r) AS (
          SELECT a, a FROM edges
          UNION
          SELECT tc.node, e.b FROM tc JOIN edges e ON tc.r = e.a),
        lab AS (SELECT node, min(r) AS cluster_id FROM tc GROUP BY node)
        SELECT node AS doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               (node = cluster_id) AS is_representative
        FROM lab""")

    wsh = word_shingles_sql("t", 3)
    o["ngram_jaccard_pairs_documents"] = f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct({wsh})) AS s FROM d),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(i::DOUBLE / (na.n_sh + nb.n_sh - i), 6) AS jaccard
        FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
        WHERE i::DOUBLE / (na.n_sh + nb.n_sh - i) >= 0.5"""

    # simhash: portable token hash -> 24 bit votes
    tok_pad = "(tok || '________')"
    code = (f"(({enc4_sql(tok_pad)} * 65599 + "
            f"{enc4_sql(f'substr({tok_pad}, 5, 4)')}) % {P})")
    h = uhash_sql(code, 0)
    vote_cols = ",\n               ".join(
        f"sum(CASE WHEN (h // {2 ** j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(dd.SIMHASH_BITS)
    )
    sim_terms = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(dd.SIMHASH_BITS)
    )
    simhash_cte = f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        th AS (
          SELECT doc_id, {h} AS h FROM toks WHERE length(tok) > 0),
        votes AS (
          SELECT doc_id,
               {vote_cols}
          FROM th GROUP BY doc_id),
        sh AS (SELECT doc_id, ({sim_terms})::BIGINT AS simhash FROM votes)"""
    o["simhash_documents"] = simhash_cte + "\n        SELECT * FROM sh"
    o["simhash_pairs_documents"] = simhash_cte + """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""

    o["simhash_banded_pairs_documents"] = o["simhash_pairs_documents"]

    o["embedding_near_dup_pairs"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4"""

    # deterministic seeded hyperplanes: if the LSH recalls every >=0.4 pair
    # at a given SF (verified at sf0.001/sf0.01), it always will
    o["embedding_lsh_near_dup_pairs"] = o["embedding_near_dup_pairs"]

    o["embedding_cosine_topk"] = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cosine
        FROM embeddings, q WHERE vec_id != 0
        ORDER BY cosine DESC, vec_id LIMIT 20"""

    o["cosine_topk_batch_embeddings"] = """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                   AS cosine
          FROM embeddings e, q WHERE e.vec_id >= 3),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank::INT AS rank
        FROM ranked WHERE rank <= 5"""

    # text profile: formulas mirror functions/text.py exactly; the
    # apostrophe inside the punct class must be doubled for SQL literals
    bpe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    punct = "[^.,;:!?''\"()\\[\\]{}-]"
    en = "(?i)\\b(" + "|".join(tx.LANG_MARKERS["en"]) + ")\\b"
    scores = {
        lang: f"len(regexp_extract_all(text, '(?i)\\b(" + "|".join(words) + ")\\b'))"
        for lang, words in tx.LANG_MARKERS.items()
    }
    lang_case = f"""CASE
          WHEN {scores['en']} > 0 AND {scores['en']} >= {scores['de']}
               AND {scores['en']} >= {scores['fr']} AND {scores['en']} >= {scores['es']} THEN 'en'
          WHEN {scores['de']} > 0 AND {scores['de']} >= {scores['fr']}
               AND {scores['de']} >= {scores['es']} THEN 'de'
          WHEN {scores['fr']} > 0 AND {scores['fr']} >= {scores['es']} THEN 'fr'
          WHEN {scores['es']} > 0 THEN 'es'
          ELSE 'und' END"""
    fp_x = enc4_sql("s")
    o["text_profile_documents"] = f"""
        WITH base AS (
          SELECT doc_id, text, length(text) AS n_chars,
                 CASE WHEN trim(text) = '' OR text IS NULL THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END::INT AS n_tokens,
                 len(regexp_extract_all(text, '{bpe}'))::INT AS n_bpe_tokens,
                 CASE WHEN length(text) > 0 THEN
                   round(length(regexp_replace(text, '{punct}', '', 'g'))::DOUBLE
                         / length(text), 6) ELSE 0.0 END AS punct_ratio
          FROM documents),
        fp AS (
          SELECT doc_id, min({uhash_sql(fp_x, 0)})::BIGINT AS fingerprint FROM (
            SELECT doc_id, unnest({char_shingles_sql('text', 4)}) AS s
            FROM documents) GROUP BY doc_id)
        SELECT b.doc_id, n_chars, n_tokens, n_bpe_tokens, punct_ratio,
               CASE WHEN n_tokens > 0 THEN
                 round(len(regexp_extract_all(text, '{en}'))::DOUBLE / n_tokens, 6)
               ELSE 0.0 END AS stopword_ratio,
               round((
                 (CASE WHEN n_chars BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.0 END)
                 + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)
                 + (CASE WHEN n_tokens > 0
                         AND n_chars::DOUBLE / n_tokens BETWEEN 2.5 AND 12.0
                         THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality,
               {lang_case} AS lang_guess,
               fp.fingerprint
        FROM base b LEFT JOIN fp ON b.doc_id = fp.doc_id"""

    o["langid_documents"] = f"""
        SELECT lang, {lang_case} AS lang_guess, count(*)::BIGINT AS n
        FROM documents GROUP BY 1, 2"""

    # per-segment variant of the same marker vote (CCNet paragraph LID)
    scores_l = {
        lang: "len(regexp_extract_all(_l, '(?i)\\b(" + "|".join(words)
        + ")\\b'))"
        for lang, words in tx.LANG_MARKERS.items()
    }
    lang_case_l = f"""CASE
          WHEN {scores_l['en']} > 0 AND {scores_l['en']} >= {scores_l['de']}
               AND {scores_l['en']} >= {scores_l['fr']}
               AND {scores_l['en']} >= {scores_l['es']} THEN 'en'
          WHEN {scores_l['de']} > 0 AND {scores_l['de']} >= {scores_l['fr']}
               AND {scores_l['de']} >= {scores_l['es']} THEN 'de'
          WHEN {scores_l['fr']} > 0 AND {scores_l['fr']} >= {scores_l['es']}
               THEN 'fr'
          WHEN {scores_l['es']} > 0 THEN 'es'
          ELSE 'und' END"""
    o["oov_rate_documents"] = """
        WITH vocab AS (
          SELECT DISTINCT unnest(regexp_split_to_array(
                   trim(COALESCE(text, '')), '\\s+')) AS w
          FROM documents WHERE source = 'web'),
        vocab_nz AS (SELECT w FROM vocab WHERE length(w) > 0),
        words AS (
          SELECT doc_id, unnest(CASE
                   WHEN length(trim(COALESCE(text, ''))) = 0
                     THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
          FROM documents WHERE source <> 'web')
        SELECT doc_id, count(*)::INT AS n_words,
               SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::INT AS n_oov,
               round(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS oov_rate
        FROM words LEFT JOIN vocab_nz v USING (w)
        GROUP BY doc_id"""

    o["lang_mix_documents"] = f"""
        WITH seg0 AS (
          SELECT doc_id, unnest(string_split(text, '. ')) AS _l
          FROM documents),
        seg AS (
          SELECT doc_id, {lang_case_l} AS _lang
          FROM seg0 WHERE length(trim(_l)) > 0),
        c AS (SELECT doc_id, _lang, count(*)::BIGINT AS _c
              FROM seg GROUP BY 1, 2),
        r AS (SELECT doc_id, _lang, _c, row_number() OVER (
                PARTITION BY doc_id ORDER BY _c DESC, _lang ASC) AS rn
              FROM c)
        SELECT doc_id, SUM(_c)::INT AS n_segments,
               count(*)::INT AS n_langs,
               max(CASE WHEN rn = 1 THEN _lang END) AS majority_lang,
               round(max(CASE WHEN rn = 1 THEN _c END)::DOUBLE / SUM(_c), 6)
                   AS majority_frac,
               count(*) > 1 AS mixed
        FROM r GROUP BY doc_id"""

    o["text_repetition_documents"] = """
        WITH s AS (
          SELECT doc_id, string_split(text, '. ') AS sents FROM documents),
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        tc AS (
          SELECT doc_id, t, count(*) AS c FROM tok
          WHERE length(t) > 0 GROUP BY 1, 2),
        tt AS (
          SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM tc GROUP BY doc_id)
        SELECT s.doc_id, len(sents)::INT AS n_sentences,
               round(1 - len(list_distinct(sents))::DOUBLE / len(sents), 6)
                 AS dup_sentence_ratio,
               round(mx::DOUBLE / tot, 6) AS top_token_ratio
        FROM s JOIN tt ON s.doc_id = tt.doc_id"""

    wsh2, wsh3, wsh4 = (word_shingles_sql("t", n) for n in (2, 3, 4))
    _ng_case = "\n               ".join(
        f"round(coalesce(max(CASE WHEN n = {n} THEN c * length(gm) END)::DOUBLE"
        f" / max(nc), 0.0), 6) AS top{n}gram_char_frac,"
        for n in (2, 3, 4)
    ).rstrip(",")
    from mlcast_sourcedata_validator_spark.functions.text import (
        gopher_quality_sql)
    o["gopher_quality_documents"] = gopher_quality_sql(
        "documents", "doc_id", "text")

    o["gopher_repetition_documents"] = f"""
        WITH d AS (
          SELECT doc_id, length(text) AS nc,
                 string_split(text, '. ') AS lines,
                 string_split(text, ' ') AS t
          FROM documents),
        lc AS (
          SELECT doc_id, line, count(*) AS c
          FROM (SELECT doc_id, unnest(lines) AS line FROM d) GROUP BY 1, 2),
        la AS (
          SELECT doc_id,
                 round((sum(c) - count(*))::DOUBLE / sum(c), 6)
                   AS dup_line_frac,
                 round(CASE WHEN sum(length(line) * c) > 0 THEN
                       sum(length(line) * (c - 1))::DOUBLE
                       / sum(length(line) * c) END, 6)
                   AS dup_line_char_frac
          FROM lc GROUP BY doc_id),
        g AS (
          SELECT doc_id, nc, 2 AS n, unnest({wsh2}) AS gm FROM d
          UNION ALL SELECT doc_id, nc, 3, unnest({wsh3}) FROM d
          UNION ALL SELECT doc_id, nc, 4, unnest({wsh4}) FROM d),
        gc AS (SELECT doc_id, nc, n, gm, count(*) AS c FROM g GROUP BY 1,2,3,4),
        ga AS (
          SELECT doc_id,
               {_ng_case}
          FROM gc GROUP BY doc_id)
        SELECT la.doc_id, dup_line_frac, dup_line_char_frac,
               top2gram_char_frac, top3gram_char_frac, top4gram_char_frac
        FROM la JOIN ga ON la.doc_id = ga.doc_id"""

    o["vocab_topk_documents"] = """
        SELECT t AS token, count(*)::BIGINT AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        WHERE length(t) > 0
        GROUP BY t ORDER BY n DESC, token ASC LIMIT 50"""

    o["heavy_hitters_documents"] = """
        SELECT key, count(*)::BIGINT AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS key
              FROM documents)
        WHERE length(key) > 0
        GROUP BY key ORDER BY n DESC, key ASC LIMIT 20"""

    o["hot_users_events"] = """
        SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n
        FROM events WHERE user_id IS NOT NULL
        GROUP BY key ORDER BY n DESC, key ASC LIMIT 15"""

    o["streaming_hot_types_events"] = """
        SELECT w_start, key, n FROM (
          -- day-grain date_trunc returns DATE in DuckDB; the Spark
          -- window start is a TIMESTAMP
          SELECT date_trunc('day', ts)::TIMESTAMP AS w_start,
                 event_type AS key, count(*)::BIGINT AS n,
                 row_number() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY count(*) DESC,
                                             event_type ASC) AS rk
          FROM events WHERE event_type IS NOT NULL
          GROUP BY date_trunc('day', ts), event_type
        ) WHERE rk <= 5"""

    o["corr_profile_events"] = """
        WITH s AS (SELECT
          corr(event_id, user_id) AS r01, covar_samp(event_id, user_id) AS c01,
          count(CASE WHEN event_id IS NOT NULL AND user_id IS NOT NULL
                THEN 1 END) AS n01,
          corr(event_id, value) AS r02, covar_samp(event_id, value) AS c02,
          count(CASE WHEN event_id IS NOT NULL AND value IS NOT NULL
                THEN 1 END) AS n02,
          corr(user_id, value) AS r12, covar_samp(user_id, value) AS c12,
          count(CASE WHEN user_id IS NOT NULL AND value IS NOT NULL
                THEN 1 END) AS n12
        FROM events)
        SELECT 'event_id' AS col_a, 'user_id' AS col_b,
               round(r01, 6) AS corr, round(c01, 6) AS covar,
               n01::BIGINT AS n FROM s
        UNION ALL
        SELECT 'event_id', 'value', round(r02, 6), round(c02, 6),
               n02::BIGINT FROM s
        UNION ALL
        SELECT 'user_id', 'value', round(r12, 6), round(c12, 6),
               n12::BIGINT FROM s"""

    # mirrors functions/search.py arithmetic exactly: left-assoc term sum
    # starting at 0.0, norm = k1*((1-b) + (b*dl)/avgdl), idf over exact
    # integer (n, df). Rank on the rounded score (see the query docstring).
    o["bm25_topk_documents"] = """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(coalesce(text, '')), ' '),
                             t -> t <> '') AS tk
          FROM documents),
        meas AS (
          SELECT doc_id, len(tk)::DOUBLE AS dl,
                 len(list_filter(tk, t -> t = 'spark'))::DOUBLE AS tf0,
                 len(list_filter(tk, t -> t = 'merge'))::DOUBLE AS tf1,
                 len(list_filter(tk, t -> t = 'window'))::DOUBLE AS tf2
          FROM toks),
        st AS (
          SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
                 sum((tf0 > 0)::INT)::DOUBLE AS df0,
                 sum((tf1 > 0)::INT)::DOUBLE AS df1,
                 sum((tf2 > 0)::INT)::DOUBLE AS df2
          FROM meas),
        scored AS (
          SELECT m.doc_id,
                 0.0
                 + (ln(1.0 + (st.n - st.df0 + 0.5) / (st.df0 + 0.5)) * m.tf0
                    * 2.2) / (m.tf0 + 1.2 * (0.25 + (0.75 * m.dl) / st.avgdl))
                 + (ln(1.0 + (st.n - st.df1 + 0.5) / (st.df1 + 0.5)) * m.tf1
                    * 2.2) / (m.tf1 + 1.2 * (0.25 + (0.75 * m.dl) / st.avgdl))
                 + (ln(1.0 + (st.n - st.df2 + 0.5) / (st.df2 + 0.5)) * m.tf2
                    * 2.2) / (m.tf2 + 1.2 * (0.25 + (0.75 * m.dl) / st.avgdl))
                 AS score
          FROM meas m CROSS JOIN st)
        SELECT doc_id, round(score, 6) AS score FROM scored
        WHERE round(score, 6) > 0
        ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 15"""

    o["semantic_dedup_embeddings"] = """
        SELECT e.vec_id, e.label FROM embeddings e
        WHERE NOT EXISTS (
          SELECT 1 FROM embeddings a
          WHERE a.vec_id < e.vec_id
            AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[]), 6)
                >= 0.4)"""

    o["embedding_drift_embeddings"] = """
        WITH e AS (
          -- two unnests in one SELECT zip in lockstep (DuckDB has no
          -- WITH ORDINALITY): positions from generate_series, values
          -- from the list
          SELECT vec_id % 2 AS grp,
                 unnest(generate_series(1, len(embedding))) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS val,
                 sqrt(list_sum(list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   AS nrm
          FROM embeddings),
        agg AS (
          SELECT grp, pos, sum(val) AS s, count(*) AS n, sum(nrm) AS ns
          FROM e GROUP BY grp, pos),
        j AS (
          SELECT c.s / c.n AS mc, b.s / b.n AS mb, c.n AS n_c,
                 c.ns AS ns_c, b.n AS n_b, b.ns AS ns_b
          FROM (SELECT * FROM agg WHERE grp = 0) c
          JOIN (SELECT * FROM agg WHERE grp = 1) b USING (pos)),
        f AS (
          SELECT sum(mc * mb) AS dt, sum(mc * mc) AS cc,
                 sum(mb * mb) AS bb,
                 sum((mc - mb) * (mc - mb)) AS gap2,
                 max(n_c) AS n_cur, max(ns_c) AS nsc,
                 max(n_b) AS n_base, max(ns_b) AS nsb
          FROM j)
        SELECT round(dt / (sqrt(cc) * sqrt(bb)), 6) AS mean_cosine,
               round(sqrt(gap2), 6) AS mean_l2_gap,
               round(nsc / n_cur, 6) AS avg_norm_cur,
               round(nsb / n_base, 6) AS avg_norm_base,
               round((nsc / n_cur - nsb / n_base) / (nsb / n_base), 6)
                 AS norm_shift,
               n_cur, n_base
        FROM f"""

    # PII patterns are restricted to syntax valid in BOTH java.util.regex
    # and RE2 (no lookaround), so the oracle runs them verbatim
    from mlcast_sourcedata_validator_spark.functions.text import PII_PATTERNS

    pii_counts = ", ".join(
        f"len(regexp_extract_all(text, '{p}'))::INT AS n_{name}"
        for name, p in PII_PATTERNS.items()
    )
    pii_any = " OR ".join(f"n_{name} > 0" for name in PII_PATTERNS)
    pii_red = "text"
    for name, p in PII_PATTERNS.items():
        pii_red = f"regexp_replace({pii_red}, '{p}', '[{name.upper()}]', 'g')"
    o["pii_profile_documents"] = f"""
        WITH prof AS (
          SELECT doc_id, {pii_counts}, md5({pii_red}) = md5(text)
                 AS redact_noop
          FROM documents)
        SELECT doc_id, {', '.join('n_' + n for n in PII_PATTERNS)},
               ({pii_any}) AS has_pii, redact_noop
        FROM prof"""

    wsh_dc = word_shingles_sql("t", 3)
    x_dc = encw_sql("s")
    o["decontaminate_documents"] = f"""
        WITH ev AS (SELECT * FROM documents WHERE doc_id % 50 = 0),
        tr AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
        evh AS (SELECT DISTINCT md5(text) AS h FROM ev),
        evx AS (SELECT DISTINCT {x_dc} AS x FROM (
          SELECT unnest(list_distinct({wsh_dc})) AS s FROM
            (SELECT string_split(text, ' ') AS t FROM ev))),
        trx AS (SELECT DISTINCT doc_id, {x_dc} AS x FROM (
          SELECT doc_id, unnest(list_distinct({wsh_dc})) AS s FROM
            (SELECT doc_id, string_split(text, ' ') AS t FROM tr))),
        hits AS (
          SELECT doc_id, count(*)::INT AS ngram_hits
          FROM trx JOIN evx USING (x) GROUP BY doc_id),
        ex AS (
          SELECT doc_id, TRUE AS exact_hit FROM tr
          WHERE md5(text) IN (SELECT h FROM evh))
        SELECT coalesce(hits.doc_id, ex.doc_id) AS doc_id,
               coalesce(exact_hit, FALSE) AS exact_hit,
               coalesce(ngram_hits, 0) AS ngram_hits
        FROM hits FULL JOIN ex ON hits.doc_id = ex.doc_id
        WHERE coalesce(exact_hit, FALSE) OR coalesce(ngram_hits, 0) >= 3"""

    from mlcast_sourcedata_validator_spark.functions.sampling import (
        hash_uniform_sql,
        weighted_take_sql,
    )

    o["weighted_sample_documents"] = (
        "SELECT doc_id, n_chars, race_key FROM ("
        + weighted_take_sql("documents", "doc_id", "n_chars", 200, seed=7)
        + ")")

    u_doc = hash_uniform_sql("doc_id", seed=7)
    o["sample_mixture_documents"] = f"""
        SELECT doc_id, lang FROM documents
        WHERE {u_doc} < (CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.4
                         WHEN 'fr' THEN 0.1 ELSE 0.02 END)"""

    o["stratified_cap_documents"] = f"""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY {u_doc} ASC, doc_id ASC) AS rk
          FROM documents)
        WHERE rk <= 20"""

    o["upsample_mixture_documents"] = f"""
        WITH w AS (
          SELECT doc_id, lang,
                 CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.0
                 ELSE 0.5 END AS wt,
                 {u_doc} AS u
          FROM documents),
        n AS (
          SELECT doc_id, lang,
                 (floor(wt)::INT
                  + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END) AS nc
          FROM w)
        SELECT doc_id, lang, unnest(range(0, nc))::INT AS copy_idx
        FROM n WHERE nc > 0"""

    o["token_count_stage_documents"] = """
        SELECT doc_id,
               (CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                     ELSE greatest(1, (length(text) + 3) // 4)
                END)::INT AS n_tokens
        FROM documents"""

    o["pack_sequences_documents"] = """
        WITH t AS (
          SELECT doc_id, source,
                 len(string_split(text, ' '))::BIGINT AS n_toks
          FROM documents),
        s AS (
          SELECT doc_id, source, n_toks,
                 coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::BIGINT AS start_offset
          FROM t)
        SELECT doc_id, source, n_toks AS n_tokens, start_offset,
               (start_offset // 512)::BIGINT AS pack_id,
               (start_offset % 512)::BIGINT AS pack_offset,
               ((start_offset + greatest(n_toks, 1) - 1) // 512
                > start_offset // 512) AS straddles_boundary
        FROM s"""

    o["prioritized_dedup_documents"] = """
        SELECT doc_id, rank FROM (
          SELECT doc_id, (doc_id % 3)::INT AS rank,
                 row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY (doc_id % 3) ASC, doc_id ASC) AS rk
          FROM documents)
        WHERE rk = 1"""

    _u5 = hash_uniform_sql("doc_id", seed=5)
    o["deterministic_take_documents"] = f"""
        SELECT doc_id, lang, source FROM documents
        ORDER BY {_u5} ASC, doc_id ASC LIMIT 100"""

    o["normalized_dedup_documents"] = """
        SELECT doc_id, source FROM (
          SELECT doc_id, source, min(doc_id) OVER (
            PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
          ) AS keep_id
          FROM documents)
        WHERE doc_id = keep_id"""

    from mlcast_sourcedata_validator_spark.functions.dedup import (
        duplicate_spans_sql)
    o["duplicate_spans_documents"] = f"""
        WITH spans AS ({duplicate_spans_sql("documents", "doc_id", "text",
                                            min_len=60)})
        SELECT doc_id, count(*)::BIGINT AS n_dup_windows,
               max(n_occ) AS max_occ
        FROM spans GROUP BY doc_id"""

    from mlcast_sourcedata_validator_spark.functions.lm import lm_sql
    o["lm_ppl_documents"] = lm_sql(
        "documents", "doc_id", "text", "lang = 'en'", n_ctx=256,
        n_pair=4096, seed=7)

    from mlcast_sourcedata_validator_spark.functions.classify import nb_sql
    o["nb_classify_documents"] = nb_sql(
        "documents", "doc_id", "text", "lang = 'en'", n_feat=2048, seed=7)

    # cosine quantized to an exact integer (floor(x*1e6 + 0.5)) before
    # max/threshold — the same integer contract as the Spark side, so
    # the compare cannot flip on a last-ulp engine difference
    o["semantic_decontaminate_embeddings"] = """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        q AS (SELECT a.vec_id,
                     max(floor(list_cosine_similarity(a.v, b.v) * 1000000
                               + 0.5)::BIGINT) AS cq
              FROM e a JOIN e b ON b.label = 0 AND a.label <> 0
              GROUP BY a.vec_id)
        SELECT vec_id, cq / 1000000 AS max_eval_cosine,
               cq >= 450000 AS contaminated
        FROM q"""

    from mlcast_sourcedata_validator_spark.functions.bpe import (
        bpe_learn_sql, bpe_tokenize_sql)
    o["bpe_vocab_documents"] = bpe_learn_sql("documents", "text", 12)
    o["bpe_tokenize_documents"] = bpe_tokenize_sql(
        "documents", "doc_id", "text", 12)

    from mlcast_sourcedata_validator_spark.functions.sampling import dsir_sql
    o["dsir_weights_documents"] = dsir_sql(
        "documents", "doc_id", "text", "lang = 'en'", n_buckets=256, seed=7)
    o["dsir_resample_documents"] = dsir_sql(
        "documents", "doc_id", "text", "lang = 'en'", n_buckets=256,
        temperature=1.0, seed=7, k=100)

    o["quantized_embeddings"] = """
        WITH s AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 list_max(list_transform(embedding::DOUBLE[],
                                         x -> abs(x))) AS sc
          FROM embeddings),
        q AS (
          SELECT vec_id, v, sc,
                 CASE WHEN sc > 0 THEN
                   list_transform(v, x -> cast(floor(x / sc * 127.0 + 0.5)
                                               AS INT))
                 ELSE list_transform(v, x -> 0) END AS qvec
          FROM s)
        SELECT vec_id, round(sc, 6) AS scale, qvec,
               CASE WHEN sc > 0 THEN
                 round(list_max([abs(qvec[i] * sc / 127.0 - v[i])
                                 for i in generate_series(1, len(v))]), 6)
               ELSE 0.0 END AS max_abs_err
        FROM q"""

    from mlcast_sourcedata_validator_spark.functions.sampling import (
        shuffle_into_shards_sql)
    _shard, _okey, _rn = shuffle_into_shards_sql("doc_id", 8, seed=11)
    o["shuffle_shards_documents"] = f"""
        WITH h AS (
          SELECT doc_id, {_shard} AS shard_id, {_okey} AS _okey
          FROM documents)
        SELECT doc_id, shard_id, {_rn} AS shard_pos FROM h"""

    from mlcast_sourcedata_validator_spark.functions.boilerplate import (
        frequent_spans_sql, remove_frequent_lines_sql)
    o["frequent_spans_documents"] = frequent_spans_sql(
        "documents", "doc_id", "text", n=3, min_df=5)
    o["boilerplate_removed_documents"] = remove_frequent_lines_sql(
        "documents", "doc_id", "text",
        min_df="SELECT (count(*) * 6) // 10 FROM documents",
        delimiter=" ")

    o["pipeline_clean_documents"] = f"""
        WITH prof AS (SELECT * FROM ({o['text_profile_documents']})),
        keep AS (SELECT doc_id FROM prof
                 WHERE quality >= 0.66 AND lang_guess = 'en'),
        kd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        rep AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
                FROM kd GROUP BY 1)
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars
        FROM kd JOIN rep ON kd.doc_id = rep.doc_id GROUP BY lang"""

    from mlcast_sourcedata_validator_spark.functions.hashing import (
        encw_sql as _encw_sql)
    _sf_h = _encw_sql(
        "substr(md5(concat_ws(chr(31), epoch_us(ts)::VARCHAR, "
        "event_id::VARCHAR, event_type, coalesce(props, ''))), 1, 12)")
    o["stream_fingerprint_events"] = f"""
        WITH h AS (SELECT user_id, {_sf_h} AS hh FROM events)
        SELECT user_id, count(*)::BIGINT AS n_rows,
               bit_xor(hh)::BIGINT AS fp_xor,
               (sum(hh) % 2147483647)::BIGINT AS fp_sum
        FROM h GROUP BY user_id"""

    o["duplicate_streams_events"] = f"""
        WITH uni AS (
          SELECT * FROM events
          UNION ALL
          SELECT event_id, ts, user_id + 1000000 AS user_id,
                 event_type, value, props
          FROM events WHERE user_id % 10 = 3),
        h AS (SELECT user_id, {_sf_h} AS hh FROM uni),
        fp AS (SELECT user_id, count(*)::BIGINT AS n_rows,
                      bit_xor(hh)::BIGINT AS fp_xor,
                      (sum(hh) % 2147483647)::BIGINT AS fp_sum
               FROM h GROUP BY user_id)
        SELECT n_rows, fp_xor, fp_sum, count(*)::BIGINT AS n_keys,
               array_to_string(list_sort(list(user_id)), ',') AS keys
        FROM fp GROUP BY n_rows, fp_xor, fp_sum HAVING count(*) > 1"""

    o["asof_last_purchase_events"] = """
        WITH purch AS (
          SELECT user_id, ts AS pts,
                 max(event_id) AS last_purchase_id,
                 arg_max(value, event_id) AS pv
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT e.event_id, e.user_id, e.ts, p.last_purchase_id,
               round(p.pv, 6) AS last_purchase_value
        FROM events e ASOF LEFT JOIN purch p
          ON e.user_id = p.user_id AND e.ts >= p.pts"""

    o["range_count_purchase_window_events"] = """
        SELECT p.event_id AS purchase_id, count(*)::BIGINT AS n_events
        FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
        JOIN events e
          ON e.ts >= p.ts AND e.ts < p.ts + INTERVAL 10 MINUTE
        GROUP BY p.event_id"""

    o["q5_local_supplier_volume"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY n_name"""

    o["q14_promo_revenue"] = """
        SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6)
                 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'"""

    o["running_revenue_customers"] = """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS order_seq,
               round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING), 4) AS running_rev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

    o["dim_stats_embeddings"] = """
        WITH ex AS (
          SELECT unnest(range(len(embedding)))::INT AS dim,
                 unnest(embedding)::DOUBLE AS v
          FROM embeddings)
        SELECT dim, round(avg(v), 6) AS avg_v,
               round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
        FROM ex GROUP BY dim"""

    o["cardinality_sketch_events"] = """
        SELECT count(DISTINCT user_id)::BIGINT AS exact_users,
               true AS approx_within_5pct
        FROM events"""

    o["streaming_dedup_events"] = """
        SELECT event_type, count(*)::BIGINT AS n_events,
               round(sum(CAST(value AS DECIMAL(24,6)))::DOUBLE, 4)
                 AS sum_value
        FROM events GROUP BY event_type"""

    o["streaming_hourly_counts_events"] = """
        SELECT date_trunc('hour', ts) AS hour_start,
               count(*)::BIGINT AS n_events,
               round(sum(CAST(value AS DECIMAL(24,6)))::DOUBLE, 4)
                 AS sum_value
        FROM events GROUP BY 1"""

    o["frame_sample_documents"] = """
        WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        f AS (
          SELECT doc_id, text,
                 unnest(range(0, greatest((n - 1) // 64, 0) + 1)) AS i
          FROM d)
        SELECT doc_id, i::INT AS frame_no,
               length(substr(text, (i * 64 + 1)::INT, 64))::INT AS frame_len
        FROM f"""

    o["multimodal_meta_documents"] = """
        SELECT doc_id,
               octet_length(encode(text))::INT AS byte_len,
               (octet_length(encode(text)) % 1024)::INT AS width,
               ((octet_length(encode(text)) // 1024) % 1024)::INT AS height,
               'fake/v1' AS format
        FROM documents"""

    # Both ANN queries run in their exact parameterization (LSH probe-all /
    # IVF nprobe=n_lists), which equals brute-force top-k by construction —
    # so the brute-force window-rank SQL is an exact oracle. The sublinear
    # settings' recall is pinned in tests/test_functions.py instead.
    ann_brute_top10 = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS cosine
        FROM embeddings, q WHERE vec_id != 0
        ORDER BY cosine DESC, vec_id LIMIT 10"""
    o["ann_lsh_topk_embeddings"] = ann_brute_top10
    o["ann_ivf_topk_embeddings"] = ann_brute_top10
    # PQ / IVF-PQ in their exact parameterizations (rerank_factor=None,
    # and nprobe=n_lists for IVF-PQ) also equal brute-force top-k by
    # construction (tests/test_pq.py).
    o["pq_topk_embeddings"] = ann_brute_top10
    o["ivfpq_topk_embeddings"] = ann_brute_top10

    # greedy earliest-completion chaining with strict (ts, event_id)
    # ordering — exactly the fold semantics of behavior.funnel_steps
    # (greedy is optimal for step-reachability, so the chained-min SQL
    # is an exact oracle)
    o["funnel_conversion_events"] = """
        WITH s1 AS (
          SELECT user_id, ts AS ts1, event_id AS id1 FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'view')
          WHERE rn = 1),
        s2 AS (
          SELECT user_id, ts AS ts2, event_id AS id2 FROM (
            SELECT e.user_id, e.ts, e.event_id,
                   row_number() OVER (PARTITION BY e.user_id
                     ORDER BY e.ts, e.event_id) AS rn
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click'
              AND (e.ts > s1.ts1
                   OR (e.ts = s1.ts1 AND e.event_id > s1.id1)))
          WHERE rn = 1),
        s3 AS (
          SELECT user_id FROM (
            SELECT e.user_id,
                   row_number() OVER (PARTITION BY e.user_id
                     ORDER BY e.ts, e.event_id) AS rn
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase'
              AND (e.ts > s2.ts2
                   OR (e.ts = s2.ts2 AND e.event_id > s2.id2)))
          WHERE rn = 1)
        SELECT 1::INTEGER AS step_idx, 'view' AS step_name,
               (SELECT count(*) FROM s1)::BIGINT AS n_users
        UNION ALL
        SELECT 2::INTEGER, 'click', (SELECT count(*) FROM s2)::BIGINT
        UNION ALL
        SELECT 3::INTEGER, 'purchase', (SELECT count(*) FROM s3)::BIGINT"""

    o["cohort_retention_events"] = """
        WITH per AS (
          SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS p
          FROM events),
        firsts AS (
          SELECT user_id, min(p) AS cohort FROM per GROUP BY user_id)
        SELECT cohort, ((p - cohort) / 7)::INTEGER AS "offset",
               count(*)::BIGINT AS n_users
        FROM per JOIN firsts USING (user_id)
        GROUP BY cohort, "offset" """

    o["loop_runs_events"] = """
        WITH l AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type IS DISTINCT FROM lag(event_type)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      THEN 1 ELSE 0 END AS chg
          FROM events),
        r AS (
          SELECT user_id,
                 sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
          FROM l),
        runs AS (
          SELECT user_id, run_id, count(*) AS run_len
          FROM r GROUP BY user_id, run_id)
        SELECT user_id, max(run_len)::BIGINT AS max_run,
               coalesce(sum(CASE WHEN run_len >= 3 THEN 1 END), 0)::BIGINT
                 AS n_runs,
               coalesce(sum(CASE WHEN run_len >= 3 THEN run_len - 1 END),
                        0)::BIGINT AS n_repeat_rows
        FROM runs GROUP BY user_id
        HAVING max(run_len) >= 3"""

    o["reconcile_orders_lineitem"] = """
        WITH agg AS (
          SELECT l_orderkey,
                 round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2)
                   AS actual
          FROM lineitem GROUP BY l_orderkey)
        SELECT coalesce(a.l_orderkey, o.o_orderkey) AS l_orderkey,
               a.actual AS lineitem_total, o.o_totalprice AS o_totalprice
        FROM agg a FULL OUTER JOIN orders o ON a.l_orderkey = o.o_orderkey
        WHERE a.l_orderkey IS NULL OR o.o_orderkey IS NULL
           OR (NOT (a.actual IS NULL AND o.o_totalprice IS NULL)
               AND (a.actual IS NULL OR o.o_totalprice IS NULL
                    OR abs(a.actual - o.o_totalprice) > 0.01))"""

    # stream-stream join == identical batch range join: the watermark
    # only bounds STATE, it never drops rows in a single availableNow
    # drain of an in-order file source
    o["streaming_join_events"] = """
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               c.event_id AS click_id
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts"""

    o["trailing_7d_spend_events"] = """
        SELECT user_id, event_id,
               round((sum(value::DECIMAL(24,6)) OVER w)::DOUBLE, 4)
                 AS trailing_7d_spend,
               (count(*) OVER w)::BIGINT AS trailing_7d_purchases
        FROM events WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                           AND CURRENT ROW)"""

    o["chunked_documents"] = """
        WITH expanded AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, ceil(greatest(length(text) - 500, 0) / 400.0)::BIGINT))
                   AS chunk_no
          FROM documents WHERE text IS NOT NULL AND length(text) > 0)
        SELECT doc_id, chunk_no::INTEGER AS chunk_no,
               md5(substr(text, chunk_no::INTEGER * 400 + 1, 500))
                 AS chunk_md5,
               length(substr(text, chunk_no::INTEGER * 400 + 1, 500))
                 ::INTEGER AS chunk_len
        FROM expanded"""

    # gap-and-islands twin of Spark's session_window merge: [start, end)
    # windows mean an event at exactly prev_ts + gap opens a NEW session,
    # hence >= (the batch sessionize_events oracle uses >); session end
    # is last event + gap, matching window.end
    o["streaming_sessions_events"] = """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         >= 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged)
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*)::BIGINT AS n_events
        FROM sess GROUP BY user_id, sid"""
    return o


# ---------------------------------------------------------------------------
# driver window: the correctness gate checks the FIRST 50 registered
# queries, so registration is an explicit ordered list of exactly 50
# distinct operators — every §2A/§2C capability has one representative
# inside the window. Redundant oracle-twin variants (a quadratic
# verification twin whose output is identical to an in-window scale-path
# query, or a strict sub-computation of an in-window query) live in
# extra_queries()/extra_oracle_sql(), verified against the same DuckDB
# oracles by tests/test_extra_oracles.py and tools/check_oracles.py.
# ---------------------------------------------------------------------------

_DRIVER_ORDER = [
    # north_rule validation core (column stats, uniqueness, domains,
    # refint, ordering, drift, skew, text-equality invariant)
    "stats_events", "temporal_coverage_events", "uniqueness_events",
    "domain_violations_events", "refint_events_registry",
    "timestep_analysis_events", "daily_drift_events", "salted_count_events",
    "conv_text_equality_events", "sessionize_events",
    "cardinality_sketch_events", "percentiles_value_events",
    # LLM training-data pipeline: dedup + similarity (round-5 rotation:
    # minhash_lsh_pairs — the strict candidates-stage sub-computation of
    # in-window lsh_verified_near_dups — and dedup_keep_min — the
    # keep-min twin of in-window dedup_exact — moved to extras; in their
    # place the two model-fit quality operators the gate did not see
    # yet: the hashed NB classifier and the CCNet-style bigram-LM
    # perplexity ranker)
    "dedup_exact_documents", "nb_classify_documents",
    "lm_ppl_documents", "lsh_verified_near_dups_documents",
    "ngram_jaccard_pairs_documents", "conv_dedup_events",
    "embedding_lsh_near_dup_pairs",
    # round-4 rotations: simhash_banded_pairs (a banded-signature twin
    # of in-window minhash_lsh_pairs) and embedding_cosine_topk (the
    # brute-force exactness twin of BOTH in-window ANN queries) moved to
    # extras; in their place the agent-loop run profile and the
    # embedding drift family the gate did not see yet
    "loop_runs_events", "embedding_drift_embeddings",
    "ann_lsh_topk_embeddings", "ann_ivf_topk_embeddings",
    # text / multimodal / composed pipeline
    "text_profile_documents", "pipeline_clean_documents",
    "multimodal_meta_documents",
    # round-3 pipeline operators rotated into the window (VERDICT r3 #3):
    # PII screening, benchmark decontamination, incremental content-index
    # dedup, incremental keyed rollup, deterministic mixture sampling,
    # sequence packing, keyed snapshot diff, categorical drift
    "pii_profile_documents", "decontaminate_documents",
    "incremental_dedup_documents", "incremental_rollup_events",
    "sample_mixture_documents", "pack_sequences_documents",
    "table_diff_events", "categorical_drift_events",
    # temporal joins + structured streaming (round-4 fifth-session
    # rotation: range_count_purchase_window_events moved to extras as the
    # interval-join twin of in-window asof_last_purchase_events; in its
    # place the Gopher/MassiveText rule filter)
    "asof_last_purchase_events", "gopher_quality_documents",
    "streaming_hourly_counts_events", "streaming_dedup_events",
    # relational breadth (TPC-H shapes, windows, set ops, pivot, UDF/UDTF;
    # q3_shipping_priority moved to extras as the join+agg+topk twin of
    # in-window q5 — in its place distributed BPE vocabulary induction)
    "q1_pricing_summary", "bpe_vocab_documents", "q5_local_supplier_volume",
    # behavioral analytics: ordered-funnel fold (one user-key shuffle;
    # running_revenue_customers rotated to extras as the cumulative-
    # window twin of in-window window_funcs_events)
    "funnel_conversion_events", "window_funcs_events",
    "semi_join_big_spenders",
    "setop_users_without_high_value", "rollup_region_nation",
    # BM25 keyword relevance search (stats-as-literals map-side scoring;
    # pivot_user_event_counts rotated to extras as a relational twin of
    # in-window rollup_region_nation)
    "bm25_topk_documents",
    "sql_api_revenue_by_priority", "pandas_udaf_median_value_events",
    "udtf_sentences_documents",
]

_EXTRA_ORDER = [
    # cumulative-window twin of in-window window_funcs_events (rotated
    # out for funnel_conversion_events in round 4)
    "running_revenue_customers",
    # conditional-aggregation twin of in-window rollup_region_nation
    # (rotated out for bm25_topk_documents in round 4)
    "pivot_user_event_counts",
    # behavioral analytics companions of in-window funnel_conversion:
    # single-shuffle weekly cohort retention matrix, and header-vs-
    # detail cross-table reconciliation (the engine behind the
    # declarative `reconciliation` check kind)
    "cohort_retention_events",
    "reconcile_orders_lineitem",
    # streaming twin of in-window batch sessionize_events: native
    # F.session_window state-store merge (boundary semantics differ by
    # design — [start,end) makes the gap test >=, see the oracle note)
    "streaming_sessions_events",
    # Efraimidis–Spirakis weighted sampling without replacement
    # (exponential-race companion of in-window sample_mixture_documents
    # and extras dsir_resample's Gumbel-top-k)
    "weighted_sample_documents",
    # stream-stream inner join with two-sided watermarks + time-range
    # state eviction (the remaining Structured Streaming join shape)
    "streaming_join_events",
    # event-time RANGE frame (peer-inclusive value window; the frame
    # primitive in-window window_funcs_events' ROWS frames can't express)
    "trailing_7d_spend_events",
    # context-window chunking (map-side sequence+explode+substring
    # companion of in-window pack_sequences_documents)
    "chunked_documents",
    # strict sub-computations of in-window queries
    "minhash_signatures_documents",   # ⊂ minhash_lsh_pairs_documents
    "hist_value_events",              # ⊂ drift_psi_events / daily_drift
    "dup_groups_events",              # same primitive as uniqueness_events
    "nation_region_rollup",           # ⊂ rollup_region_nation
    "drift_psi_events",               # PSI-only twin of daily_drift_events
    # per-key suffix under a decimal weight budget (context-window prep)
    "budget_tail_events",
    # quadratic oracle twins of in-window bucketed scale paths
    "simhash_pairs_documents",        # == simhash_banded_pairs_documents
    "embedding_near_dup_pairs",       # == embedding_lsh_near_dup_pairs
    # primitive twins of in-window queries
    "ordering_regressions_events",    # lag-window ~ timestep_analysis
    "role_grammar_violations_events",  # compile_role_transitions predicate
    "top_customers_revenue",          # broadcast-join top-k ~ q3
    "lineitem_top_line_per_order",    # window row_number ~ running_revenue
    "intersect_clickers_and_buyers",  # INTERSECT ~ setop EXCEPT
    "quantile_sketch_events",         # sketch bound ~ cardinality_sketch
    # iterative (non-SQL-expressible in Spark terms, but DuckDB's
    # WITH RECURSIVE closure serves as an exact oracle in pytest)
    "dedup_clusters_documents",
    # PART-table coverage; join+conditional-agg twin of in-window q3/q5
    "q14_promo_revenue",
    # repetition quality signals; string/agg twin of in-window
    # text_profile_documents
    "text_repetition_documents",
    # deterministic portable sampling twins of in-window
    # sample_mixture_documents
    "stratified_cap_documents",
    "upsample_mixture_documents",
    # cross-source preference dedup (window-arithmetic oracle)
    "prioritized_dedup_documents",
    # Arrow mapInPandas tokenizer stage (stub factory — the count
    # formula is mirrored exactly in SQL; a real tokenizer swaps only
    # the executor-side closure)
    "token_count_stage_documents",
    # primitive twins demoted in the round-4 window rotation (each is a
    # strict primitive/sub-shape of an in-window query; still verified by
    # tests/test_extra_oracles.py with the driver's exact compare)
    "langid_documents",               # text twin of text_profile_documents
    "frame_sample_documents",         # multimodal twin of multimodal_meta
    "dim_stats_embeddings",           # agg twin of stats_events
    "cosine_topk_batch_embeddings",   # batch twin of embedding_cosine_topk
    "orders_above_customer_avg",      # scalar-subquery twin of semi_join
    "cube_status_priority_orders",    # grouping-set twin of rollup_region
    "unpivot_customer_balances",      # stack() twin of pivot_user_event
    "json_extract_events",            # json-path projection primitive
    # deterministic global shuffle (shard + in-shard order as a pure
    # function of the ids; integer-only arithmetic => exact oracle)
    "shuffle_shards_documents",
    # corpus boilerplate: frequent-span profiler + frequent-line removal
    # (order-preserving reassembly mirrored exactly in DuckDB)
    "frequent_spans_documents",
    "boilerplate_removed_documents",
    # Gopher repetition-filter family (dup-line fractions + top n-gram
    # char coverage) — string/agg twin of text_repetition_documents
    "gopher_repetition_documents",
    # corpus vocabulary top-k (deterministic tie-break)
    "vocab_topk_documents",
    # pairwise corr/covariance profile (one-scan co-moment aggregates,
    # driver-free long-form explode)
    "corr_profile_events",
    # SemDeDup: n_lists=1 == global brute-force keep rule (exact oracle);
    # the clustered scale path is superset-pinned in tests
    "semantic_dedup_embeddings",
    # banded-signature twin of in-window minhash_lsh_pairs_documents
    # (rotated out for loop_runs_events in round 4)
    "simhash_banded_pairs_documents",
    # brute-force exactness twin of the two in-window ANN queries
    # (rotated out for embedding_drift_embeddings in round 4)
    "embedding_cosine_topk",
    # exact-k deterministic global sample (TakeOrdered on the id-uniform)
    "deterministic_take_documents",
    # near-exact dedup over the normalization key (case/whitespace)
    "normalized_dedup_documents",
    # DSIR importance resampling (hashed-ngram bucket models; integer
    # quantized weights => exact oracle; Gumbel-top-k selection)
    "dsir_weights_documents",
    "dsir_resample_documents",
    # round-5 window rotation: the LSH candidates stage (strict
    # sub-computation of in-window lsh_verified_near_dups_documents) and
    # the keep-min twin of in-window dedup_exact_documents demoted here
    # (both still exact-compared), making room for the promoted
    # lm_ppl_documents / nb_classify_documents model-fit pair
    "minhash_lsh_pairs_documents",
    "dedup_keep_min_documents",
    # corpus BPE segmentation via the learned-vocab broadcast join (the
    # learning twin bpe_vocab_documents sits in the driver window)
    "bpe_tokenize_documents",
    # embedding-space benchmark decontamination (fuzzy complement of
    # the exact/shingle decontaminate_documents in the window)
    "semantic_decontaminate_embeddings",
    # CCNet-style per-segment language mix (code-switch detection)
    "lang_mix_documents",
    # release-over-release vocabulary coverage (broadcast word vocab)
    "oov_rate_documents",
    # round-4 fifth-session window rotation: the TPC-H join+agg+topk twin
    # and the interval-join twin demoted here (both still exact-compared)
    "q3_shipping_priority",
    # round 5: the HAVING-probe semi-join TPC-H shape (Q18)
    "q18_large_volume_customer",
    "range_count_purchase_window_events",
    # hot-key profiler (salted two-phase counting; feeds the salting
    # decision the north_rule calls for)
    "skew_profile_events",
    # exact duplicate-substring spans (per-doc rollup; winnowed
    # fingerprint mode is the test-pinned scale path)
    "duplicate_spans_documents",
    # symmetric int8 embedding quantization + reconstruction error
    "quantized_embeddings",
    # commutative multiset stream fingerprint (count/bit_xor/sum-mod-P
    # algebraic partials) + re-ingested-stream collision detection
    "stream_fingerprint_events",
    "duplicate_streams_events",
    # Bloom semi-join prefilter on the incremental dedup index (exact by
    # construction — zero false negatives, probable hits re-verified)
    "bloom_incremental_dedup_documents",
    # functional-dependency change points (fd_constant check predicate
    # against a plain lag() SQL oracle)
    "fd_violations_events",
    # SCD2 dimension history: one-shot derivation + incremental merge
    # (late-arrival interleave) — merge shares the full-derivation oracle
    "scd2_user_state_events",
    "scd2_merge_events",
    # event-time disorder profile (watermark-delay sizing from measured
    # lateness; exact quantiles vs quantile_cont)
    "disorder_profile_events",
    # product-quantization ANN (compressed codes + ADC + exact re-rank);
    # exact-mode twin of in-window ann_ivf_topk_embeddings
    "pq_topk_embeddings",
    # composed IVF-PQ persisted index (partition pruning + coded
    # residuals + ADC + exact re-rank); exact-mode twin of the same
    "ivfpq_topk_embeddings",
    # Z-order (Morton) clustering value — the multi-column file-skipping
    # layout key (integer shift/mask arithmetic => exact oracle; the
    # equi-depth variant and measured skipping are pinned in tests)
    "zorder_values_events",
    # conversation-granular dedup family (conv_dedup_events itself is
    # IN the driver window as the transcript-payload dedup
    # representative): template-turn detection + prefix-containment
    "template_turns_events",
    "prefix_pairs_events",
    # signature sub-computation of in-window simhash_banded_pairs
    # (rotated out of the window for conv_dedup_events in round 4)
    "simhash_documents",
    # round 5: Misra-Gries bounded-state heavy hitters (candidates +
    # exact broadcast recount; fail-loud certificate) — the sketch-path
    # twins of vocab_topk_documents and skew_profile's hot-key scan
    "heavy_hitters_documents",
    "hot_users_events",
    # round 5: streaming composition of the MG sketch — per-day top-5
    # event types via bounded-state applyInPandasWithState
    "streaming_hot_types_events",
    # round 5: raw-data point-anomaly checks (operators/anomaly.py) —
    # integer-exact trailing-window volume monitor and Benford
    # first-digit conformance (both all-integer verdicts => exact
    # oracles; the float metric-HISTORY detectors live in
    # functions/anomaly.py against the metrics store)
    "volume_anomaly_events",
    "benford_value_events",
    # round 5: integer-exact per-day Wasserstein-1 drift (the
    # displacement-weighted complement of in-window daily_drift_events'
    # KS/PSI, same histograms, zero Python)
    "emd_drift_events",
    # round 5: Count-Min mergeable point-frequency sketch — "how
    # frequent is THIS key" from O(depth x width) state, the complement
    # of heavy_hitters' "which keys are frequent"; portable-hash cells
    # give the oracle the identical sketch
    "cm_freq_events",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = _all_queries()
    assert len(_DRIVER_ORDER) == 50
    return {k: all_q[k] for k in _DRIVER_ORDER}


def oracle_sql() -> dict[str, str]:
    all_o = _all_oracles()
    return {k: all_o[k] for k in _DRIVER_ORDER if k in all_o}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-twin / sub-computation variants kept out of the driver's
    50-entry window; tests/test_extra_oracles.py verifies them against
    extra_oracle_sql() with the driver's own compare semantics."""
    all_q = _all_queries()
    return {k: all_q[k] for k in _EXTRA_ORDER}


def extra_oracle_sql() -> dict[str, str]:
    all_o = _all_oracles()
    return {k: all_o[k] for k in _EXTRA_ORDER if k in all_o}
