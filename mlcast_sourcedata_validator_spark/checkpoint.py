"""Per-partition lineage + resumable validation runs (north_rule).

The reference validates one dataset per process invocation; resumability is
"re-run the CLI". At 10^12 turns a validation run must survive interruption,
so the engine processes the table one date-partition at a time and commits
per-partition lineage to a results store:

    <results_path>/results/partition_id=<p>/     verdict rows
    <results_path>/violations/partition_id=<p>/  violation rows
    <results_path>/lineage/                      commit markers (append)

Exactly-once semantics under retry: results + violations are written with
per-partition OVERWRITE (idempotent), and the lineage commit marker is
appended LAST — a crash between data write and marker leaves a partition
uncommitted, so the next run simply redoes it and overwrites the partial
output. Resume = anti-join of planned partitions against committed lineage
(here a driver-side set difference on the partition list — the list is
O(days), not O(rows)).

On Iceberg this maps to one transaction per partition batch + a lineage
table; the Parquet fallback implements the same contract with directory
overwrite + append-only marker files.
"""

from __future__ import annotations

import hashlib
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler import SuiteRunResult, run_suite
from .report import RESULTS_SCHEMA
from .sources import fs
from .sources.tables import list_date_partitions
from .suite import CheckSuite, RunContext

LINEAGE_SCHEMA = (
    "suite_id string, run_id string, partition_id string, status string, "
    "n_input_rows long, n_violations long, n_fails long, n_warnings long, "
    "n_passes long, wall_sec double, committed_at double, "
    "fingerprint string"
)

METRICS_SCHEMA = (
    "suite_id string, run_id string, metric string, value double, "
    "value_str string"
)


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """Platform gate: is an Iceberg runtime on the session's JVM
    classpath? (Class probe only — no catalog configuration check.)
    This sandbox has no iceberg-spark-runtime jar and no network to
    fetch one (attempts documented in BENCH/BASELINE.md), so here this
    is always False and :class:`CatalogResultsStore` runs its
    parquet-session-table branch; on a cluster image with the jar the
    SAME store code commits through Iceberg."""
    cls = "org.apache.iceberg.catalog.Catalog"
    jvm = spark._jvm
    try:
        # the context classloader sees jars added via --packages /
        # spark.jars (Spark's MutableURLClassLoader); a bare
        # Class.forName reflects through py4j's root loader and would
        # miss them, silently degrading to the parquet store on exactly
        # the clusters where Iceberg IS available
        jvm.java.lang.Thread.currentThread().getContextClassLoader() \
            .loadClass(cls)
        return True
    except Exception:
        pass
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


class CatalogResultsStore:
    """Results/violations/lineage/metrics as CATALOG TABLES — the
    north_star's "checkpoints per-partition lineage and metrics to an
    Iceberg results table", expressed so the same code is exercisable
    without the Iceberg jar:

    - table format = ``iceberg`` when :func:`iceberg_runtime_available`
      (every write below is then an Iceberg snapshot commit), else the
      session catalog's ``parquet`` tables — identical statements,
      identical tests, weaker (directory-level) atomicity,
    - per-partition idempotency = dynamic partition overwrite of the
      ``partition_id`` partition (Iceberg: ``overwritePartitions`` on
      the v2 writer — one atomic snapshot replacing just that
      partition),
    - the lineage "marker" = an append to the lineage table, committed
      AFTER the partition's data tables (same crash contract as the
      path store: data-without-lineage is re-done and overwritten).

    ``prefix`` is a catalog identifier (optionally db-qualified); the
    four tables are ``<prefix>_results``, ``<prefix>_violations``,
    ``<prefix>_lineage``, ``<prefix>_metrics``.
    """

    def __init__(self, spark: SparkSession, prefix: str,
                 table_format: Optional[str] = None):
        self.spark = spark
        self.prefix = prefix
        self.format = table_format or (
            "iceberg" if iceberg_runtime_available(spark) else "parquet")

    def _tbl(self, kind: str) -> str:
        return f"{self.prefix}_{kind}"

    def _create_table(self, df: DataFrame, tbl: str,
                      partitioned: bool) -> None:
        writer = df.write.format(self.format)
        if partitioned:
            writer = writer.partitionBy("partition_id")
        _save_table_drop_orphan(self.spark, writer, tbl)

    def _write_partition(self, kind: str, df: DataFrame,
                         partition_id: str) -> None:
        tbl = self._tbl(kind)
        full = df.withColumn("partition_id", F.lit(partition_id))
        if not self.spark.catalog.tableExists(tbl):
            self._create_table(full, tbl, partitioned=True)
            return
        # overwrite ONLY this partition (retry-idempotent)
        full = full.select(*self.spark.table(tbl).columns)
        if self.format == "iceberg":
            full.writeTo(tbl).overwritePartitions()
        else:
            # the per-writer option is not reliably honored by
            # insertInto — set the session conf for the statement
            conf = "spark.sql.sources.partitionOverwriteMode"
            prev = self.spark.conf.get(conf, "STATIC")
            self.spark.conf.set(conf, "dynamic")
            try:
                full.write.insertInto(tbl, overwrite=True)
            finally:
                self.spark.conf.set(conf, prev)

    def write_partition_results(self, res: SuiteRunResult, suite_id: str,
                                run_id: str, partition_id: str) -> None:
        self._write_partition(
            "violations", res.violations.drop("partition_id"), partition_id)
        self._write_partition(
            "results",
            res.report.to_df(self.spark, suite_id, run_id, partition_id)
            .drop("partition_id"),
            partition_id,
        )
        mrows = _metrics_rows(suite_id, run_id, res.metrics)
        if mrows:
            self._write_partition(
                "metrics",
                self.spark.createDataFrame(mrows, schema=METRICS_SCHEMA),
                partition_id,
            )

    def append_lineage(self, marker: DataFrame) -> None:
        tbl = self._tbl("lineage")
        if not self.spark.catalog.tableExists(tbl):
            self._create_table(marker, tbl, partitioned=False)
        else:
            marker.select(*self.spark.table(tbl).columns) \
                .write.mode("append").insertInto(tbl)

    def committed(self, suite_id: str) -> set[str]:
        tbl = self._tbl("lineage")
        if not self.spark.catalog.tableExists(tbl):
            return set()
        rows = (
            self.spark.table(tbl)
            .where((F.col("suite_id") == suite_id)
                   & (F.col("status") == "COMMITTED"))
            .select("partition_id").distinct().collect()
        )
        return {r["partition_id"] for r in rows}

    def committed_fingerprints(
            self, suite_id: str) -> dict[str, Optional[str]]:
        """partition_id -> latest committed fingerprint (None when the
        lineage table predates the column — change-aware resume then
        revalidates, the safe direction)."""
        tbl = self._tbl("lineage")
        if not self.spark.catalog.tableExists(tbl):
            return {}
        from pyspark.sql import Window

        df = self.spark.table(tbl)
        if "fingerprint" not in df.columns:
            df = df.withColumn("fingerprint", F.lit(None).cast("string"))
        w = Window.partitionBy("partition_id") \
            .orderBy(F.col("committed_at").desc(), F.col("run_id"))
        rows = (
            df.where((F.col("suite_id") == suite_id)
                     & (F.col("status") == "COMMITTED"))
            .withColumn("_k", F.row_number().over(w))
            .where(F.col("_k") == 1)
            .select("partition_id", "fingerprint")
            .collect()
        )
        return {r["partition_id"]: r["fingerprint"] for r in rows}

    def read(self, kind: str) -> DataFrame:
        return self.spark.table(self._tbl(kind))


def _metrics_rows(suite_id: str, run_id: str, metrics: dict) -> list[tuple]:
    """Flatten a run's scalar metrics for the metrics store. Numeric
    scalars land in ``value``; short non-numeric strings (verdict labels)
    in ``value_str``; list-valued entries (drift bin arrays,
    injected baselines) are SKIPPED — they are inputs/raw histograms, not
    trendable measurements, and the histogram store is the baseline table."""
    rows = []
    for k, v in metrics.items():
        if isinstance(v, bool):
            rows.append((suite_id, run_id, k, float(v), None))
        elif isinstance(v, (int, float)):
            f = float(v)
            rows.append((suite_id, run_id, k, f if f == f else None, None))
        elif isinstance(v, str) and len(v) <= 256:
            rows.append((suite_id, run_id, k, None, v))
    return rows


def write_partitioned_transcripts(
    df: DataFrame, table_path: str, files_per_partition: int = 1
) -> None:
    """Write transcripts hive-partitioned by date(ts) — the layout the
    storage_partitioning check asserts (analog of chunk-per-timestep).

    ``files_per_partition > 1`` splits each date dir into multiple files
    (hashed by conv_id) so scan parallelism isn't capped at one task per
    date — the local-mode analog of sizing row groups to
    spark.sql.files.maxPartitionBytes.
    """
    out = df.withColumn("date", F.to_date("ts"))
    if files_per_partition > 1:
        out = out.repartition(
            F.col("date"), F.pmod(F.xxhash64(F.col("conv_id")), F.lit(files_per_partition))
        )
    else:
        out = out.repartition("date")
    out.write.mode("overwrite").partitionBy("date").parquet(table_path)


def _save_table_drop_orphan(spark: SparkSession, writer, tbl: str) -> None:
    """``writer.saveAsTable(tbl)`` that survives an orphaned managed
    location: a previous run (or process — the session catalog is
    per-process, the warehouse dir is not) died between writing the
    location and committing the catalog entry. The catalog says the
    table does not exist, so the location holds no committed data —
    remove it and retry once. Iceberg's catalog commit is atomic, so
    only the parquet path can hit this."""
    try:
        writer.saveAsTable(tbl)
    except Exception as exc:
        if "LOCATION_ALREADY_EXISTS" not in str(exc):
            raise
        wh = spark.conf.get("spark.sql.warehouse.dir")
        parts = tbl.lower().split(".")
        loc = (f"{wh}/{parts[0]}" if len(parts) == 1
               else f"{wh}/{parts[-2]}.db/{parts[-1]}")
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(loc)
        jpath.getFileSystem(
            spark._jsc.hadoopConfiguration()
        ).delete(jpath, True)
        writer.saveAsTable(tbl)


def suggest_bucket_count(
    total_bytes: int,
    total_cores: int,
    target_bucket_bytes: int = 256 << 20,
    min_bucket_bytes: int = 16 << 20,
) -> int:
    """Bucket-count sizing rule for :func:`write_bucketed_table`,
    calibrated by the round-5 bucket-count-vs-cores study
    (BENCH/bucket_study_r05.json, ~39.5M turns / 1.4 GB compressed,
    local[8] vs local[32]):

    - 64 buckets (~22 MB each): 1.84M turns/s at 32 cores, 0.79
      normalized 8->32 scaling;
    - 128 buckets (~11 MB): 1.26M turns/s, 0.48;
    - 256 buckets (~5.5 MB): 0.86M turns/s, 0.33.

    i.e. the round-4 "buckets >= 2-4x cores" hypothesis was BACKWARDS:
    once buckets drop below ~16 MB, per-task fixed cost (scheduling,
    footer reads, codegen setup) eats the hi-core wall while the
    low-core wall — overlap-bound, not overhead-bound — barely moves,
    so BOTH absolute throughput and the scaling ratio collapse. Bucket
    count must therefore be sized by BYTES first:

    1. ``total_bytes / target_bucket_bytes`` buckets (~256 MB
       compressed each at cluster scale — inside the 128 MB-1 GB band
       where scan tasks amortize their fixed cost),
    2. floored at ``2 x total_cores`` so every core gets work with one
       wave of slack for task-length variance,
    3. but NEVER below ``min_bucket_bytes`` per bucket — on inputs too
       small to feed every core at that size, fewer-bigger buckets win
       (measured above); a splittable unbucketed layout serves the
       spare cores better than confetti buckets,
    4. rounded to the nearest power of two (co-bucketed joins need
       EQUAL counts on both tables; a fixed convention keeps
       independently-written tables join-compatible).

    For the study's input this returns 64 — the measured optimum.
    """
    if total_bytes <= 0 or total_cores <= 0:
        raise ValueError("total_bytes and total_cores must be positive")
    by_size = max(1, round(total_bytes / target_bucket_bytes))
    n = max(2 * total_cores, by_size)
    cap = max(1, total_bytes // min_bucket_bytes)
    n = min(n, cap)
    p = 1
    while p * 2 <= n:
        p *= 2
    return p * 2 if (n - p) > (p * 2 - n) else p


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key: str = "conv_id",
    n_buckets: int = 64,
    sort_cols: Optional[list] = None,
    path: Optional[str] = None,
) -> None:
    """Catalog-table layout bucketed by ``key`` — the zero-shuffle input
    layout for repeated validation runs.

    The fused suite plan's ONLY shuffle is the conv_id hash Exchange
    feeding the per-conversation window (compiler.py ``build_suite_plan``).
    A table bucketed by conv_id already satisfies that clustering straight
    off the scan, so the Exchange is elided — and when the registry is
    bucketed with the SAME bucket count, the refint sort-merge join goes
    shuffle-free on both sides too (pinned:
    tests/test_plan_shape.py::test_suite_plan_zero_exchange_on_bucketed_table).
    At 10^12 turns this turns the suite's per-run shuffle (the dominant
    network cost; ~40 B/row x 10^12 = tens of TB of shuffle I/O) into a
    ONE-TIME layout decision paid at ingest.

    ``repartition(n_buckets, key)`` before the write uses the same
    murmur3 hash as the bucketing spec, so every bucket's rows land in
    exactly one task -> exactly one file per bucket — the precondition
    for the scan reporting its ``sort_cols`` order. Spark >=3.0 only
    propagates that order under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (measured here: elides the refint sort-merge join's BIG-side sort;
    the window's sort survives either way because SMJ guarantees key
    order only). The remaining sorts are per-bucket and in-memory —
    the exchange is the cost that matters at 10^12 rows.

    Iceberg analog: ``bucket(N, conv_id)`` partition transform + a
    sorted write — same contract, engine-enforced at commit time.

    ``path`` makes the table EXTERNAL (files survive the session). The
    bucket id is encoded in each file name, so a later session — or a
    session-scoped in-memory catalog — re-attaches the layout with
    :func:`register_bucketed_table`; the data is never rewritten.

    Size ``n_buckets`` with :func:`suggest_bucket_count` — buckets
    below ~16 MB measurably collapse hi-core throughput AND 8->32
    scaling (BENCH/bucket_study_r05.json).
    """
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    # mode("overwrite") replaces a CATALOGED table, but an orphaned
    # managed location (process killed between location write and
    # catalog commit) still aborts the save — same degrade-and-retry
    # as the results store
    _save_table_drop_orphan(df.sparkSession, writer.mode("overwrite"),
                            table_name)


def register_bucketed_table(
    spark: SparkSession,
    table_name: str,
    path: str,
    schema,
    key: str = "conv_id",
    n_buckets: int = 64,
    sort_cols: Optional[list] = None,
) -> None:
    """(Re-)attach an existing bucketed parquet directory as a catalog
    table. Bucketing lives in table METADATA, not the files — a plain
    ``spark.read.parquet(path)`` forgets the layout and the suite plan
    grows its Exchange back. ``schema`` is a StructType (pass
    ``df.schema`` from the writing side or read one file's footer)."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    sort_clause = (
        f"SORTED BY ({', '.join(sort_cols)}) " if sort_cols else ""
    )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    spark.sql(
        f"CREATE TABLE {table_name} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) {sort_clause}INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def committed_partitions(
    spark: SparkSession, results_path: str, suite_id: str,
    storage_options: Optional[dict] = None,
) -> set[str]:
    lineage_dir = fs.join(results_path, "lineage")
    # bounded probe: one parquet file is enough to know lineage exists —
    # never walk the full lineage dir on the driver. If the remote
    # backend is unavailable the probe degrades to "no lineage": the run
    # reprocesses, which is safe (per-partition writes are idempotent
    # overwrites) where guessing committed-ness would not be.
    try:
        if not fs.isdir(lineage_dir, storage_options) or \
                not fs.list_parquet_files(lineage_dir, limit=1,
                                          storage_options=storage_options):
            return set()
    except fs.FsUnavailable:
        return set()
    df = spark.read.parquet(lineage_dir)
    rows = (
        df.where((F.col("suite_id") == suite_id) & (F.col("status") == "COMMITTED"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def partition_fingerprint(
    table_path: str, partition_id: str, *, partition_key: str = "date",
    storage_options: Optional[dict] = None,
) -> str:
    """Content fingerprint of ONE date-partition directory: md5 over the
    sorted ``(relative-path, size)`` listing of its visible files. A
    LISTING, never a data read — O(files-per-partition) driver time.

    Why name+size is enough: Spark (and every Hadoop-committer writer)
    never modifies a data file in place — any overwrite, append, or
    compaction lands NEW uniquely-named part files — so an unchanged
    listing means unchanged content for Spark-written tables. Files the
    readers ignore (``_SUCCESS``, ``.crc`` sidecars, staging dirs) are
    excluded so a committer's bookkeeping can't fake a data change."""
    pdir = fs.join(table_path, f"{partition_key}={partition_id}")
    lines = []
    base = pdir.rstrip("/") + "/"
    for fpath, size in fs.stat_files(pdir, storage_options):
        rel = fpath[len(base):] if fpath.startswith(base) else fpath
        name = rel.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")) or "/_" in rel or "/." in rel:
            continue
        lines.append(f"{rel}:{size}")
    lines.sort()
    return hashlib.md5("\n".join(lines).encode("utf-8")).hexdigest()


def committed_fingerprints(
    spark: SparkSession, results_path: str, suite_id: str,
    storage_options: Optional[dict] = None,
) -> dict[str, Optional[str]]:
    """partition_id -> fingerprint of its LATEST committed marker.
    ``None`` when that marker predates fingerprint stamping (pre-round-4
    lineage files lack the column; the explicit read schema fills it
    with null) — change-aware resume treats None as "unknown, so
    revalidate", the safe direction."""
    lineage_dir = fs.join(results_path, "lineage")
    try:
        if not fs.isdir(lineage_dir, storage_options) or \
                not fs.list_parquet_files(lineage_dir, limit=1,
                                          storage_options=storage_options):
            return {}
    except fs.FsUnavailable:
        return {}
    from pyspark.sql import Window

    df = spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_dir)
    w = Window.partitionBy("partition_id") \
        .orderBy(F.col("committed_at").desc(), F.col("run_id"))
    rows = (
        df.where((F.col("suite_id") == suite_id)
                 & (F.col("status") == "COMMITTED"))
        .withColumn("_k", F.row_number().over(w))
        .where(F.col("_k") == 1)
        .select("partition_id", "fingerprint")
        .collect()
    )
    return {r["partition_id"]: r["fingerprint"] for r in rows}


@dataclass
class PartitionedRunSummary:
    run_id: str
    processed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    n_fails: int = 0
    n_violations: int = 0
    results: dict[str, SuiteRunResult] = field(default_factory=dict)

    def exit_code(self) -> int:
        return 1 if self.n_fails else 0


def _latest_check_rates(metrics_df: DataFrame, lineage_df: DataFrame,
                        suite_id: str) -> DataFrame:
    """(partition_id, check_id, run_id, n_viol, rate) from the LATEST
    committed run of each partition: per-check violation counters
    (``__viol_<check_id>`` metrics rows, compiler._count_exprs) joined
    to lineage for the row volume, rate = count / n_input_rows."""
    from pyspark.sql import Window

    lin = (
        lineage_df.where((F.col("suite_id") == suite_id)
                         & (F.col("status") == "COMMITTED"))
        .select("run_id", "partition_id", "n_input_rows", "committed_at")
    )
    w = Window.partitionBy("partition_id") \
        .orderBy(F.col("committed_at").desc(), F.col("run_id"))
    lin = lin.withColumn("_k", F.row_number().over(w)) \
        .where(F.col("_k") == 1).drop("_k", "committed_at")
    met = (
        metrics_df.where((F.col("suite_id") == suite_id)
                         & F.col("metric").startswith("__viol_"))
        .select(
            "run_id", "partition_id",
            F.expr("substring(metric, 8)").alias("check_id"),
            F.col("value").alias("n_viol"),
        )
    )
    return met.join(lin, ["run_id", "partition_id"]).withColumn(
        "rate", F.col("n_viol") / F.greatest(F.col("n_input_rows"), F.lit(1))
    )


def violation_trend_audit(
    prev_metrics: DataFrame,
    prev_lineage: DataFrame,
    cur_metrics: DataFrame,
    cur_lineage: DataFrame,
    suite_id: str,
    min_ratio: float = 2.0,
    min_count: int = 10,
) -> DataFrame:
    """Flag checks whose violation RATE jumped between two results
    stores (previous corpus release vs current) on the same partition —
    drift detection on the CHECK OUTCOMES themselves, riding the
    per-check counters the suite writes to the metrics store.

    A check that fires 2x more often between two releases usually means
    the upstream producer changed, even when every run still "passes"
    its absolute thresholds. Rates (count / lineage ``n_input_rows``)
    make releases with different row volumes comparable; ``min_count``
    suppresses small-number noise, and a previous rate of zero flags on
    any >= min_count recurrence. Cross-store comparison matches the
    engine's other drift machinery (baseline snapshot vs current): each
    store's per-partition overwrite idempotency is untouched, and on
    Iceberg the "previous store" can be a snapshot time-travel read of
    the same table.

    All four inputs are store tables — O(partitions x checks) rows,
    never O(data) — so the audit is two small joins + one tiny window
    regardless of table size. Pass ``read_metrics(...)`` /
    ``spark.read.parquet(<results>/lineage)`` (path store) or
    ``store.read("metrics"/"lineage")`` (catalog store).

    Returns (partition_id, check_id, prev_run_id, cur_run_id, prev_rate,
    cur_rate, prev_n, cur_n, ratio), one row per flagged (partition,
    check), ratio NULL when prev_rate was zero.
    """
    prev = _latest_check_rates(prev_metrics, prev_lineage, suite_id).select(
        "partition_id", "check_id",
        F.col("run_id").alias("prev_run_id"),
        F.col("rate").alias("prev_rate"),
        F.col("n_viol").alias("prev_n"),
    )
    cur = _latest_check_rates(cur_metrics, cur_lineage, suite_id).select(
        "partition_id", "check_id",
        F.col("run_id").alias("cur_run_id"),
        F.col("rate").alias("cur_rate"),
        F.col("n_viol").alias("cur_n"),
    )
    both = cur.join(prev, ["partition_id", "check_id"])
    return (
        both.where(
            (F.col("cur_n") >= min_count)
            & (
                (F.col("prev_rate") == 0)
                | (F.col("cur_rate") >= min_ratio * F.col("prev_rate"))
            )
            & (F.col("cur_rate") > F.col("prev_rate"))
        )
        .select(
            "partition_id", "check_id", "prev_run_id", "cur_run_id",
            F.round("prev_rate", 8).alias("prev_rate"),
            F.round("cur_rate", 8).alias("cur_rate"),
            F.col("prev_n").cast("long").alias("prev_n"),
            F.col("cur_n").cast("long").alias("cur_n"),
            F.when(F.col("prev_rate") > 0,
                   F.round(F.col("cur_rate") / F.col("prev_rate"), 3))
            .alias("ratio"),
        )
    )


def _concurrent_map(spark: SparkSession, todo: list[str], fn,
                    max_concurrent: int, prefix: str) -> list[str]:
    """Run ``fn(p)`` for each item: serially when ``max_concurrent <= 1``,
    else from a bounded driver thread pool. Returns the completed subset
    of ``todo`` IN TODO ORDER.

    Every invocation (serial included) is tagged with a per-item
    ``spark.scheduler.pool`` (fair-share isolation when FAIR scheduling
    is on) and an interrupt-on-cancel job group; the caller's pool
    assignment is saved and RESTORED, never clobbered. On the first
    error (or Ctrl-C): queued items are dropped and the in-flight
    items' Spark job groups are CANCELLED so the pool drains promptly —
    their partitions stay uncommitted and are redone on resume, which
    is exactly the overwrite-then-marker crash contract.
    """
    sc = spark.sparkContext

    def _tagged(p: str) -> None:
        prev = sc.getLocalProperty("spark.scheduler.pool")
        sc.setLocalProperty("spark.scheduler.pool", f"{prefix}_{p}")
        sc.setJobGroup(f"{prefix}_{p}", f"{prefix} partition {p}",
                       interruptOnCancel=True)
        try:
            fn(p)
        finally:
            sc.setJobGroup(None, None)
            sc.setLocalProperty("spark.scheduler.pool", prev)

    done: set[str] = set()
    if max_concurrent <= 1:
        for p in todo:
            _tagged(p)
            done.add(p)
        return [p for p in todo if p in done]

    from concurrent.futures import ThreadPoolExecutor, as_completed

    pool = ThreadPoolExecutor(max_workers=max_concurrent,
                              thread_name_prefix=prefix)
    futs: dict = {}
    try:
        futs = {pool.submit(_tagged, p): p for p in todo}
        for f in as_completed(futs):
            f.result()  # re-raises the first error
            done.add(futs[f])
    except BaseException:
        for f, p in futs.items():
            if not f.done():
                sc.cancelJobGroup(f"{prefix}_{p}")
        raise
    finally:
        pool.shutdown(wait=True, cancel_futures=True)
    return [p for p in todo if p in done]


def run_partitioned(
    spark: SparkSession,
    suite: CheckSuite,
    table_path: str,
    results_path: str,
    registry_df: Optional[DataFrame] = None,
    baseline_df: Optional[DataFrame] = None,
    resume: bool = True,
    partition_key: str = "date",
    run_id: Optional[str] = None,
    max_partitions: Optional[int] = None,
    fail_injector=None,  # test hook: fn(partition_id) called pre-commit
    storage_options: Optional[dict] = None,
    violations_limit: Optional[int] = None,
    max_concurrent: int = 1,
    sample_fraction: Optional[float] = None,
    sample_seed: int = 0,
    detect_changes: bool = False,
) -> PartitionedRunSummary:
    """Validate every uncommitted date-partition of ``table_path``.

    ``detect_changes`` makes resume CONTENT-aware: a committed partition
    is skipped only while its current :func:`partition_fingerprint`
    (file-name+size listing) still equals the one stamped into its
    latest commit marker — a backfill or compaction that rewrites an
    already-validated partition re-enters the todo list instead of being
    masked forever by its old marker. Markers missing a fingerprint
    (pre-round-4 lineage, explicit-schema read fills null) revalidate —
    the safe direction. Cost: one directory LISTING per committed
    partition at plan time (O(days) listings, no data reads); on Iceberg
    the same decision reads snapshot ids from table metadata instead.
    Every marker stamps the fingerprint observed BEFORE the partition
    was read, so a write racing the validation makes the next
    change-aware run redo the partition rather than trust a verdict
    computed over a moving input.

    ``sample_fraction`` validates each partition batch on a
    deterministic conversation-level hash sample (sampled.py semantics:
    a FAIL found is a true FAIL; a PASS certifies nothing beyond the
    sample). The ``__sample_fraction`` metric is stamped into every
    sampled run's metrics store rows so history audits can tell sampled
    counts from full counts. Commit markers are keyed by suite_id alone
    — point sampled sweeps at their OWN results_path (or a suite cloned
    with a distinct suite_id) so a 1% sampled commit never masks a
    partition for the full nightly run.

    ``max_concurrent > 1`` pipelines that many partition validations
    through the shared SparkSession from driver threads. A single
    partition's plan tapers (wide stages -> small collects), leaving a
    large cluster idle at every stage tail; concurrent independent
    jobs fill those gaps (Spark's scheduler interleaves at stage
    granularity under FIFO and fairly under FAIR — each thread tags a
    ``spark.scheduler.pool``). Compute AND the path store's data writes
    run in parallel (their overwrite targets are distinct
    ``partition_id=<p>`` directories, each staging under its own
    ``_temporary``); only the commit section serializes under one
    driver lock, because the lineage sink is a shared append target
    (two concurrent append jobs would race on its staging dir) and the
    catalog store's dynamic-overwrite flips a session conf. Crash
    semantics are unchanged: a partition is committed iff its marker
    was appended; on error or Ctrl-C the in-flight partitions' job
    groups are cancelled and resume redoes them (see
    :func:`_concurrent_map`).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    summary = PartitionedRunSummary(run_id=run_id)
    partitions = list_date_partitions(table_path, key=partition_key,
                                      storage_options=storage_options)
    if not partitions:
        raise ValueError(f"no '{partition_key}=' partitions under {table_path}")
    # results destination: a filesystem path (parquet dirs + marker
    # files) or a catalog identifier (catalog tables; Iceberg snapshot
    # commits when the runtime is present)
    store = _maybe_store(spark, results_path)
    if not resume:
        done: set[str] = set()
    elif store is not None:
        done = store.committed(suite.suite_id)
    else:
        done = committed_partitions(
            spark, results_path, suite.suite_id, storage_options)

    fps: dict[str, Optional[str]] = {}
    if detect_changes and done:
        if store is not None:
            fps = store.committed_fingerprints(suite.suite_id)
        else:
            fps = committed_fingerprints(
                spark, results_path, suite.suite_id, storage_options)

    todo: list[str] = []
    for p in partitions:
        if p in done:
            if detect_changes:
                cur = partition_fingerprint(
                    table_path, p, partition_key=partition_key,
                    storage_options=storage_options)
                if fps.get(p) is None or fps[p] != cur:
                    todo.append(p)  # rewritten (or unknown) — revalidate
                    continue
            summary.skipped.append(p)
        else:
            todo.append(p)
    if max_partitions is not None:
        todo = todo[:max_partitions]

    commit_lock = threading.Lock()
    outcomes: dict[str, tuple[SuiteRunResult, dict]] = {}

    def _process(p: str) -> None:
        # fingerprint BEFORE the read: if a writer races the validation,
        # the stamped value is stale and the next change-aware run redoes
        # the partition (safe) instead of trusting a moving input
        fp = partition_fingerprint(
            table_path, p, partition_key=partition_key,
            storage_options=storage_options)
        batch = spark.read.option("basePath", table_path).parquet(
            fs.join(table_path, f"{partition_key}={p}")
        ).drop(partition_key)
        if sample_fraction is not None:
            from .functions.sampling import hash_uniform

            if not 0.0 < sample_fraction <= 1.0:
                raise ValueError(
                    f"sample_fraction must be in (0, 1], got {sample_fraction}")
            batch = batch.where(
                hash_uniform(F.col(suite.conv_col), sample_seed)
                < F.lit(sample_fraction))
        ctx = RunContext(
            spark=spark, df=batch, suite=suite, run_id=run_id,
            partition_id=p, registry_df=registry_df,
            baseline_df=baseline_df, table_path=table_path,
            storage_options=storage_options,
            violations_limit=violations_limit,
        )
        res = run_suite(ctx)
        if sample_fraction is not None:
            # stamp the fraction into the trendable metrics so history
            # audits can separate sampled counts from full counts
            res.metrics["__sample_fraction"] = float(sample_fraction)

        # idempotent per-partition data writes: the path store's targets
        # are DISTINCT partition_id=<p> directories (each write job
        # stages under its own target's _temporary), so they run
        # concurrently; only the catalog store (session-conf flip,
        # shared tables) and the shared lineage append serialize
        if store is None:
            res.violations.drop("partition_id").write.mode(
                "overwrite"
            ).parquet(
                fs.join(results_path, "violations", f"partition_id={p}")
            )
            res.report.to_df(spark, suite.suite_id, run_id, p).drop(
                "partition_id"
            ).write.mode("overwrite").parquet(
                fs.join(results_path, "results", f"partition_id={p}")
            )
            mrows = _metrics_rows(suite.suite_id, run_id, res.metrics)
            if mrows:
                spark.createDataFrame(mrows, schema=METRICS_SCHEMA) \
                    .write.mode("overwrite").parquet(
                        fs.join(results_path, "metrics",
                                f"partition_id={p}")
                    )
        with commit_lock:
            if store is not None:
                store.write_partition_results(res, suite.suite_id, run_id, p)
            if fail_injector is not None:
                fail_injector(p)
            s = res.report.summarize()
            # counts were collected during the run — no second pass
            marker = spark.createDataFrame(
                [(suite.suite_id, run_id, p, "COMMITTED", res.n_input_rows,
                  res.n_violations, s["FAIL"], s["WARNING"], s["PASS"],
                  res.wall_sec, time.time(), fp)],
                schema=LINEAGE_SCHEMA,
            )
            if store is not None:
                store.append_lineage(marker)
            else:
                marker.write.mode("append").parquet(
                    fs.join(results_path, "lineage"))
        outcomes[p] = (res, s)

    completed = _concurrent_map(spark, todo, _process, max_concurrent,
                                "validate")
    # summary in deterministic partition order, regardless of completion
    for p in completed:
        res, s = outcomes[p]
        summary.processed.append(p)
        summary.results[p] = res
        summary.n_fails += s["FAIL"]
        summary.n_violations += res.n_violations

    return summary


def _maybe_store(spark: SparkSession,
                 results_path: str) -> Optional[CatalogResultsStore]:
    """Route a results destination: catalog store for a bare table
    identifier, path store (``None``) for anything path-like.

    An ALREADY-CREATED catalog store is sticky: ``is_table_identifier``
    lets an existing local path win over the catalog (right for input
    tables), but for the results store that rule would let an unrelated
    file appearing in the driver's CWD silently flip a live store's
    routing between runs — resume would then see zero committed
    partitions and write to a second store. If the catalog holds this
    name's lineage table, it IS the store, regardless of local paths."""
    from .sources.catalog import _IDENT_RE, is_table_identifier

    if is_table_identifier(results_path):
        return CatalogResultsStore(spark, results_path)
    if (results_path and "://" not in results_path
            and "/" not in results_path and "\\" not in results_path
            and _IDENT_RE.fullmatch(results_path)):
        store = CatalogResultsStore(spark, results_path)
        if spark.catalog.tableExists(store._tbl("lineage")):
            return store
    return None


def read_results(spark: SparkSession, results_path: str) -> DataFrame:
    store = _maybe_store(spark, results_path)
    if store is not None:
        return store.read("results")
    return spark.read.schema(RESULTS_SCHEMA).parquet(
        fs.join(results_path, "results")
    )


def read_violations(spark: SparkSession, results_path: str) -> DataFrame:
    store = _maybe_store(spark, results_path)
    if store is not None:
        return store.read("violations")
    return spark.read.parquet(fs.join(results_path, "violations"))


def read_lineage(spark: SparkSession, results_path: str) -> DataFrame:
    store = _maybe_store(spark, results_path)
    if store is not None:
        return store.read("lineage")
    # explicit schema: a lineage dir can mix pre- and post-fingerprint
    # marker files; schema inference from one footer would make the
    # column's presence depend on which file it sampled
    return spark.read.schema(LINEAGE_SCHEMA).parquet(
        fs.join(results_path, "lineage"))


def maintain_rollup(
    spark: SparkSession,
    table_path: str,
    rollup_path: str,
    keys: list[str],
    specs,
    *,
    rollup_id: str = "conv_rollup",
    partition_key: str = "date",
    resume: bool = True,
    max_partitions: Optional[int] = None,
    derive: Optional[dict] = None,
    storage_options: Optional[dict] = None,
    max_concurrent: int = 1,
    detect_changes: bool = False,
) -> list[str]:
    """Incrementally maintain a keyed rollup over a date-partitioned
    table: each uncommitted partition is rolled up ALONE (one
    partition-pruned scan of just the new data) into
    ``<rollup_path>/deltas/<rollup_id>/partition_id=<p>/`` (deltas are
    namespaced per rollup_id so several rollups — e.g. the per-conv and
    the keys=[] table-level one — can share a store), committed with the same
    idempotent overwrite-then-marker protocol as the validation store.
    The full-history recompute never happens after day one — at 10^12
    turns the daily maintenance cost is one scan of the new day.

    ``max_concurrent > 1`` pipelines that many partition rollups through
    driver threads, same rationale as ``run_partitioned``: delta writes
    target DISTINCT directories (each job stages under its own target's
    ``_temporary``), so only the shared lineage append serializes.

    ``detect_changes`` extends resume to CONTENT (same fingerprints as
    ``run_partitioned``): a COMMITTED source partition whose files were
    rewritten gets its delta recomputed and recommitted (delta overwrite
    + latest-marker-wins make that safe — the read path takes one delta
    per active partition). A COMPACTED partition whose source changed is
    a hard error: its old mass is folded into the compacted base and the
    specs are merge-only (no retraction — HLL can't subtract), so the
    store must be rebuilt at a fresh rollup_path; silently skipping
    would serve a stale rollup forever. Pre-fingerprint COMPACTED
    markers (fingerprint unknown) keep the old skip semantics.

    Returns the partitions processed this call. Reuses the validation
    lineage contract with ``suite_id = "__rollup__:<rollup_id>"`` so a
    crash between delta write and marker is redone safely.
    """
    from .functions.rollup import keyed_rollup

    pseudo_suite = f"__rollup__:{rollup_id}"
    partitions = list_date_partitions(table_path, key=partition_key,
                                      storage_options=storage_options)
    if not partitions:
        raise ValueError(f"no '{partition_key}=' partitions under {table_path}")
    statuses, com_fps = _latest_rollup_markers(spark, rollup_path, rollup_id,
                                               storage_options)
    if resume:
        # every marker-bearing partition was committed at some point
        done = set(statuses)
    else:
        # a compacted-away partition's mass lives in the base delta:
        # re-committing it (even under resume=False) would resurrect it
        # next to the base and double-count. Rebuilding from raw requires
        # a fresh rollup_path — the contract of any materialized aggregate.
        done = {p for p, s in statuses.items() if s == "COMPACTED"}

    if detect_changes:
        changed = []
        for p in partitions:
            if p not in statuses:
                continue  # new partition: already in the todo path
            cur = partition_fingerprint(
                table_path, p, partition_key=partition_key,
                storage_options=storage_options)
            stored = com_fps.get(p)
            if stored is not None and stored == cur:
                continue  # unchanged since its last committed delta
            if statuses[p] == "COMPACTED":
                if stored is None:
                    continue  # pre-fingerprint store: can't tell — keep
                raise ValueError(
                    f"source partition '{p}' changed after its delta was "
                    f"compacted into the base (rollup '{rollup_id}'): "
                    "merge-only specs cannot retract the old mass — "
                    "rebuild the rollup at a fresh rollup_path")
            changed.append(p)
        done -= set(changed)

    todo = [p for p in partitions if p not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]
    commit_lock = threading.Lock()

    def _one(p: str) -> None:
        t0 = time.time()
        # fingerprint BEFORE the read (run_partitioned rationale: a
        # racing writer makes the stamp stale, so the next change-aware
        # maintenance redoes the delta instead of trusting it)
        fp = partition_fingerprint(
            table_path, p, partition_key=partition_key,
            storage_options=storage_options)
        batch = spark.read.option("basePath", table_path).parquet(
            fs.join(table_path, f"{partition_key}={p}")
        ).drop(partition_key)
        # derive: name -> Column computed before the rollup, so keys may
        # be expressions over the raw schema (e.g. a content hash)
        for name, col in (derive or {}).items():
            batch = batch.withColumn(name, col)
        delta = keyed_rollup(batch, keys, specs)
        delta.write.mode("overwrite").parquet(
            fs.join(rollup_path, "deltas", rollup_id, f"partition_id={p}")
        )
        marker = spark.createDataFrame(
            [(pseudo_suite, rollup_id, p, "COMMITTED", 0, 0, 0, 0, 0,
              time.time() - t0, time.time(), fp)],
            schema=LINEAGE_SCHEMA,
        )
        with commit_lock:
            marker.write.mode("append").parquet(
                fs.join(rollup_path, "lineage"))

    return _concurrent_map(spark, todo, _one, max_concurrent, "rollup")


def _latest_rollup_markers(
    spark: SparkSession, rollup_path: str, rollup_id: str,
    storage_options: Optional[dict],
) -> tuple[dict[str, str], dict[str, Optional[str]]]:
    """``(statuses, committed_fps)`` for a rollup store: partition ->
    latest lineage status, and partition -> fingerprint of its latest
    COMMITTED marker (None when that marker predates fingerprinting) —
    the second map drives change-aware maintenance. Resolution
    is per-partition latest-marker-wins on ``committed_at``, with
    COMPACTED preferred at exact timestamp ties (compaction logically
    follows the commit it supersedes; ties otherwise depend on collect
    order). All markers for a store are written by the single
    maintenance/compaction coordinator, so committed_at is monotone in
    practice — cross-host clock skew would need a shared store driven
    from multiple uncoordinated drivers, which the overwrite-then-marker
    protocol already forbids. O(#markers) rows collected once."""
    pseudo_suite = f"__rollup__:{rollup_id}"
    lineage_dir = fs.join(rollup_path, "lineage")
    try:
        if not fs.isdir(lineage_dir, storage_options) or \
                not fs.list_parquet_files(lineage_dir, limit=1,
                                          storage_options=storage_options):
            return {}, {}
    except fs.FsUnavailable:
        return {}, {}
    rows = (
        spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_dir)
        .where(F.col("suite_id") == pseudo_suite)
        .select("partition_id", "status", "committed_at", "fingerprint")
        .collect()
    )
    latest: dict[str, tuple[float, int, str]] = {}
    com_fp: dict[str, tuple[float, Optional[str]]] = {}
    for r in rows:
        key = str(r["partition_id"])
        rank = (r["committed_at"], 1 if r["status"] == "COMPACTED" else 0)
        if key not in latest or rank > latest[key][:2]:
            latest[key] = (*rank, r["status"])
        if r["status"] == "COMMITTED" and (
                key not in com_fp or r["committed_at"] > com_fp[key][0]):
            com_fp[key] = (r["committed_at"], r["fingerprint"])
    return ({p: s for p, (_, _, s) in latest.items()},
            {p: fp for p, (_, fp) in com_fp.items()})


def _latest_rollup_statuses(
    spark: SparkSession, rollup_path: str, rollup_id: str,
    storage_options: Optional[dict],
) -> dict[str, str]:
    """Statuses-only view of :func:`_latest_rollup_markers`."""
    return _latest_rollup_markers(spark, rollup_path, rollup_id,
                                  storage_options)[0]


def _active_rollup_partitions(
    spark: SparkSession, rollup_path: str, rollup_id: str,
    storage_options: Optional[dict],
) -> set[str]:
    """Delta partitions whose LATEST lineage row is COMMITTED (not
    COMPACTED-away)."""
    statuses = _latest_rollup_statuses(spark, rollup_path, rollup_id,
                                       storage_options)
    return {p for p, s in statuses.items() if s == "COMMITTED"}


def _active_delta_df(
    spark: SparkSession, rollup_path: str, rollup_id: str,
    storage_options: Optional[dict],
) -> DataFrame:
    active = _active_rollup_partitions(spark, rollup_path, rollup_id,
                                       storage_options)
    if not active:
        raise ValueError(f"no committed rollup deltas under {rollup_path}")
    dirs = [fs.join(rollup_path, "deltas", rollup_id, f"partition_id={p}")
            for p in sorted(active)]
    return spark.read.option(
        "basePath", fs.join(rollup_path, "deltas", rollup_id)
    ).parquet(*dirs).withColumn(
        "partition_id", F.col("partition_id").cast("string")
    )


def read_rollup(
    spark: SparkSession,
    rollup_path: str,
    keys: list[str],
    specs,
    *,
    rollup_id: str = "conv_rollup",
    storage_options: Optional[dict] = None,
) -> DataFrame:
    """Merge the ACTIVE rollup deltas into the current rollup state.

    Only delta dirs whose latest commit marker is COMMITTED are read: a
    crashed partial write has no marker and is invisible; a compacted
    delta's latest marker is COMPACTED and its mass lives in the base
    delta instead (:func:`compact_rollup`). The merge shuffles rollup
    rows — O(#keys x #active-deltas), independent of raw table size.
    """
    from .functions.rollup import merge_rollups

    deltas = _active_delta_df(spark, rollup_path, rollup_id,
                              storage_options).drop("partition_id")
    return merge_rollups([deltas], keys, specs)


def read_rollup_deltas(
    spark: SparkSession,
    rollup_path: str,
    *,
    rollup_id: str = "conv_rollup",
    storage_options: Optional[dict] = None,
) -> DataFrame:
    """Active rollup deltas WITH their partition_id — the input to the
    boundary audits (functions/rollup.py `boundary_audit`), which need
    the per-partition breakdown the merged view intentionally loses.

    Note: a compaction base delta (partition_id ``__base-...``) pools
    many source partitions — boundaries inside it were auditable before
    the compaction that folded them; `boundary_audit` orders the base
    FIRST so it serves as the historical frontier that each newer delta
    is still checked against."""
    return _active_delta_df(spark, rollup_path, rollup_id, storage_options)


def compact_rollup(
    spark: SparkSession,
    rollup_path: str,
    keys: list[str],
    specs,
    *,
    rollup_id: str = "conv_rollup",
    storage_options: Optional[dict] = None,
) -> Optional[str]:
    """Rewrite the ACTIVE deltas as one base delta, trimming read-side
    merge fan-in from O(#partitions-ever) to O(1) + new deltas since.

    At 10^12 turns the store accrues a delta per day per table; after
    years that is thousands of dirs in every read. Compaction is the
    rewrite-data-files analog: (1) merge active deltas, (2) write the
    result to ``deltas/<id>/partition_id=__base-<uuid>__``, (3) append
    ONE marker batch that COMMITs the base and marks every source
    COMPACTED. Crash before (3) leaves an unreferenced base dir (never
    read — no marker) and the old state intact; resume-safety for
    :func:`maintain_rollup` is untouched because a source partition's
    COMMITTED row still exists in the lineage history (compaction flips
    its LATEST status, and maintenance dedups on ever-committed).

    Returns the base partition name, or None when fewer than two active
    deltas exist (nothing to trim).
    """
    from .functions.rollup import merge_rollups

    pseudo_suite = f"__rollup__:{rollup_id}"
    active = _active_rollup_partitions(spark, rollup_path, rollup_id,
                                       storage_options)
    if len(active) < 2:
        return None
    deltas = _active_delta_df(spark, rollup_path, rollup_id,
                              storage_options).drop("partition_id")
    base = f"__base-{uuid.uuid4().hex[:12]}__"
    t0 = time.time()
    merge_rollups([deltas], keys, specs).write.mode("overwrite").parquet(
        fs.join(rollup_path, "deltas", rollup_id, f"partition_id={base}")
    )
    now = time.time()
    markers = [(pseudo_suite, rollup_id, base, "COMMITTED", 0, 0, 0, 0, 0,
                now - t0, now, None)]
    markers += [(pseudo_suite, rollup_id, p, "COMPACTED", 0, 0, 0, 0, 0,
                 0.0, now, None) for p in sorted(active)]
    spark.createDataFrame(markers, schema=LINEAGE_SCHEMA) \
        .coalesce(1).write.mode("append") \
        .parquet(fs.join(rollup_path, "lineage"))
    return base


def vacuum_rollup(
    spark: SparkSession,
    rollup_path: str,
    *,
    rollup_id: str = "conv_rollup",
    delete_orphan_bases: bool = True,
    storage_options: Optional[dict] = None,
) -> dict:
    """Physically delete rollup delta directories no read will ever
    touch. :func:`compact_rollup` trims the read-side FAN-IN but leaves
    the superseded delta dirs on disk (readers skip them via lineage);
    after months of maintain+compact cycles the dead bytes dominate the
    store. Vacuum removes:

    - partitions whose LATEST lineage status is COMPACTED (their state
      lives in the compaction base), and
    - ``__base-*__`` dirs with NO lineage marker at all (a crash between
      the base write and its COMMITTED marker — never referenced).

    Safe by construction: reads select only lineage-ACTIVE partitions,
    so deleting COMPACTED/orphan dirs cannot change any result, and
    ``fs.rmtree`` is idempotent so a crashed vacuum simply leaves work
    for the next one. One operational caveat at scale: a reader that
    PLANNED its scan before the compaction committed may still hold file
    references into dirs vacuum deletes (the standard
    compaction-vs-in-flight-reader race every table format schedules
    around) — run vacuum after in-flight readers of the pre-compaction
    state have drained, e.g. as the last step of the same maintenance
    job that compacted. Like compaction, vacuum must run from the single
    maintenance coordinator the marker protocol already requires —
    ``delete_orphan_bases=False`` for the paranoid case of a base
    being written concurrently. Ordinary (non-base) partitions WITHOUT
    any marker are kept: the overwrite-then-marker protocol will
    reprocess and overwrite them, so they are pending work, not garbage.

    Returns ``{"deleted": [...], "kept_active": [...], "kept_pending":
    [...]}`` (partition names, sorted).
    """
    statuses = _latest_rollup_statuses(spark, rollup_path, rollup_id,
                                       storage_options)
    deltas_dir = fs.join(rollup_path, "deltas", rollup_id)
    try:
        names = fs.listdir(deltas_dir, storage_options) \
            if fs.isdir(deltas_dir, storage_options) else []
    except fs.FsUnavailable:
        names = []
    deleted, active, pending = [], [], []
    for name in names:
        if not name.startswith("partition_id="):
            continue
        p = name[len("partition_id="):]
        status = statuses.get(p)
        if status == "COMPACTED" or (
            status is None and p.startswith("__base-")
            and delete_orphan_bases
        ):
            fs.rmtree(fs.join(deltas_dir, name), storage_options)
            deleted.append(p)
        elif status == "COMMITTED":
            active.append(p)
        else:
            pending.append(p)
    return {"deleted": sorted(deleted), "kept_active": sorted(active),
            "kept_pending": sorted(pending)}


def read_metrics(spark: SparkSession, results_path: str) -> DataFrame:
    """Per-partition scalar metrics (suite_id, run_id, metric, value,
    value_str, partition_id) — the queryable metrics history the
    north_star mandates alongside lineage."""
    store = _maybe_store(spark, results_path)
    if store is not None:
        return store.read("metrics")
    return spark.read.parquet(fs.join(results_path, "metrics"))


def metric_outlier_partitions(
    metrics_df: DataFrame,
    metric: str,
    *,
    mad_factor: float = 5.0,
    min_partitions: int = 4,
) -> DataFrame:
    """Partitions whose ``metric`` deviates from the cross-partition
    median by more than ``mad_factor`` x MAD (median absolute deviation).

    The robust complement of the per-partition verdicts: a day whose
    null_rate is 10x every other day's passes its own absolute threshold
    yet is exactly the partition a corpus owner wants flagged. Median/MAD
    (not mean/stddev) so one bad day cannot mask itself by inflating the
    spread. The per-metric series is O(#partitions) scalars, collected
    once; median/MAD are driver math (one Spark job, not four).

    Returns (partition_id, value, median, mad, deviation) for flagged
    partitions; empty if fewer than ``min_partitions`` partitions carry
    the metric (median of 2-3 points is noise) or if MAD is 0 and every
    value equals the median.
    """
    import statistics

    spark = metrics_df.sparkSession
    # ONE scan: the per-metric values are O(#partitions) scalars (the
    # docstring's premise), so collect once and do median/MAD on the
    # driver instead of four jobs (count + median + MAD self-cross-join
    # + filter) re-reading the metrics source
    rows = metrics_df.where(
        (F.col("metric") == metric) & F.col("value").isNotNull()
    ).select(F.col("partition_id").cast("string"), "value").collect()
    out_schema = ("partition_id string, value double, median double, "
                  "mad double, deviation double")
    if len(rows) < min_partitions:
        return spark.createDataFrame([], out_schema)
    med = statistics.median(r["value"] for r in rows)
    mad = statistics.median(abs(r["value"] - med) for r in rows)
    # MAD==0 (perfectly stable metric): any nonzero deviation flags
    flagged = [
        (r["partition_id"], r["value"], med, mad, abs(r["value"] - med))
        for r in rows if abs(r["value"] - med) > mad * mad_factor
    ]
    return spark.createDataFrame(flagged, out_schema)
