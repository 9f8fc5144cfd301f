"""Z-order layout (functions/layout.py): Morton codes, equi-depth
rescaling, multi-dimensional file skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlcast_sourcedata_validator_spark.functions import layout as L


def test_morton_codes_exact(spark):
    """4x4 grid at 2 bits/dim: the canonical Morton sequence (dimension
    0 in the even bit positions)."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x: int, y: int")
    got = {(r.x, r.y): r.z for r in df.withColumn(
        "z", L.zorder_expr({"x": (0, 3), "y": (0, 3)}, bits=2)).collect()}
    # interleave(x=b1b0, y=c1c0) -> c1 b1 c0 b0
    expected = {(x, y): (
        ((x >> 0) & 1) << 0 | ((y >> 0) & 1) << 1
        | ((x >> 1) & 1) << 2 | ((y >> 1) & 1) << 3
    ) for x in range(4) for y in range(4)}
    assert got == expected


def test_zorder_expr_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        L.zorder_expr({})
    with pytest.raises(ValueError, match="bigint"):
        L.zorder_expr({"a": (0, 1), "b": (0, 1), "c": (0, 1)}, bits=21)
    with pytest.raises(ValueError, match="unknown mode"):
        L.zorder_write(spark.range(1), "/tmp/x", ["id"], mode="nope")


def test_zorder_write_preserves_rows_and_skips_files(spark, tmp_path):
    """The layout contract: (a) a z-order rewrite is a pure relayout
    (same multiset of rows); (b) a range predicate on the SECONDARY
    clustering column touches far fewer files than under a layout
    sorted on the primary column alone (measured 7/16 vs 16/16 at
    sf0.01; pinned with margin at sf0.001's 8 files)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    zq = str(tmp_path / "zq")
    lp = str(tmp_path / "linear")
    L.zorder_write(ev, zq, ["user_id", "value"], n_files=8, mode="quantile")
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(lp))

    assert (spark.read.parquet(zq).orderBy("event_id").collect()
            == ev.orderBy("event_id").collect())

    p = ev.agg(F.expr("percentile(value, array(0.4, 0.5))").alias("v")).first()
    pv = f"value BETWEEN {p['v'][0]} AND {p['v'][1]}"
    z_files = L.files_read(spark, zq, pv)
    lin_files = L.files_read(spark, lp, pv)
    assert lin_files >= 7          # value range lives in ~every file
    assert z_files <= lin_files - 2  # z-order clusters it


def test_quantile_rescale_uses_full_grid(spark):
    """A low-cardinality column (fewer distinct values than 2^bits grid
    cells) must still spread over the FULL bucket grid after rescale —
    otherwise its high interleave bits are constant zero and the
    z-geometry collapses toward a single-column sort."""
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("lowcard"),
        F.col("id").alias("highcard"),
    )
    bins = L.profile_quantile_bins(df, ["lowcard"], bits=8)
    assert len(bins["lowcard"]) + 1 < 256
    z = df.withColumn("z", L.zorder_expr_binned(
        {"lowcard": bins["lowcard"]}, bits=8))
    hi = z.agg(F.max("z")).first()[0]
    assert hi >= 128  # top bit of the 8-bit grid is in use


def test_minmax_constant_column_is_safe(spark):
    """A constant clustering column degrades to cell 0 (hi <= lo guard)
    instead of dividing by zero."""
    df = spark.range(10).select(F.lit(5).alias("c"), F.col("id"))
    z = df.select(L.zorder_expr({"c": (5, 5), "id": (0, 9)}, bits=4)
                  .alias("z")).collect()
    # c sits in the even interleave positions (j=0): all must be zero
    even_mask = sum(1 << (2 * i) for i in range(4))
    assert all(r.z & even_mask == 0 for r in z)
    assert any(r.z > 0 for r in z)  # id's odd positions still populate


@pytest.mark.slow
def test_reclustering_deltas_with_saved_grid(spark, tmp_path):
    """The returned grid spec re-clusters a later delta consistently:
    the SAME row gets the SAME z-value through a saved-bins encode as
    through the original write's grid (required so incremental batches
    land in the same z-geometry as the base table)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = ev.where("event_id % 2 = 0")
    delta = ev.where("event_id % 2 = 1")
    grid = L.zorder_write(base, str(tmp_path / "b"), ["user_id", "value"],
                          n_files=4, mode="quantile")
    z1 = delta.select("event_id", L.zorder_expr_binned(grid, 8).alias("z"))
    z2 = delta.select("event_id", L.zorder_expr_binned(
        {k: list(v) for k, v in grid.items()}, 8).alias("z"))
    assert z1.collect() == z2.collect()


def test_clustering_check_verdicts(spark, tmp_path):
    """Declarative `clustering` check (operators/storage.py
    compile_clustering): PASS on a z-ordered layout, WARNING (or FAIL
    when gated) on a layout that scatters the declared keys across
    every file, WARNING degrade on a non-file-backed input."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    def suite(params):
        return CheckSuite("layout_t", [CheckSpec(
            "clustering", "clustering", "7.2 layout",
            "Files MUST be clustered on the declared key columns.",
            params)])

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    good = str(tmp_path / "good")
    L.zorder_write(ev, good, ["user_id", "value"], n_files=8,
                   mode="quantile")
    bad = str(tmp_path / "bad")
    # round-robin repartition scatters every z-run across all files
    ev.repartition(8).write.mode("overwrite").parquet(bad)

    params = {"columns": ["user_id", "value"], "max_avg_span": 0.6}
    res = run_suite(RunContext(
        spark=spark, df=spark.read.parquet(good), suite=suite(params),
        run_id="g"))
    assert [r.status for r in res.report.results] == ["PASS"], \
        res.report.results

    res2 = run_suite(RunContext(
        spark=spark, df=spark.read.parquet(bad), suite=suite(params),
        run_id="b"))
    assert [r.status for r in res2.report.results] == ["WARNING"]
    assert "zorder_write" in res2.report.results[0].detail
    assert res2.exit_code() == 0

    gated = dict(params, severity="FAIL")
    res3 = run_suite(RunContext(
        spark=spark, df=spark.read.parquet(bad), suite=suite(gated),
        run_id="b2"))
    assert res3.exit_code() == 1

    # non-file-backed input degrades, never lies
    mem = spark.range(100).select(
        F.col("id").alias("user_id"), (F.col("id") * 2.0).alias("value"))
    res4 = run_suite(RunContext(spark=spark, df=mem, suite=suite(params),
                                run_id="m"))
    assert [r.status for r in res4.report.results] == ["WARNING"]
    assert "not file-backed" in res4.report.results[0].detail

    with pytest.raises(ValueError, match="columns"):
        run_suite(RunContext(spark=spark, df=mem,
                             suite=suite({}), run_id="x"))


def test_suggest_bucket_count_rule():
    """The bytes-first sizing rule matches the round-5 measured study
    (BENCH/bucket_study_r05.json): bytes/256MB target, 2x-cores floor,
    16MB-per-bucket cap, power-of-two rounding."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        suggest_bucket_count,
    )

    # the study's input (~1.4 GB compressed, 32 cores) -> the measured
    # optimum, 64 — NOT 128/256, which the study showed collapse both
    # throughput and scaling
    assert suggest_bucket_count(1_400_000_000, 32) == 64
    # big cluster, big table: bytes-driven (1 PB at ~256 MB targets)
    n = suggest_bucket_count(10**15, 8000)
    assert n & (n - 1) == 0 and 2_000_000 <= n <= 8_000_000
    # small table on a wide cluster: the 16 MB cap wins over the cores
    # floor (confetti buckets measured slower than idle cores)
    assert suggest_bucket_count(100_000_000, 32) <= 8
    # degenerate inputs raise
    import pytest as _pytest
    with _pytest.raises(ValueError):
        suggest_bucket_count(0, 32)
