"""Misra-Gries heavy hitters (functions/sketch.py): bounded-state
candidates + exact recount."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import mlcast_sourcedata_validator_spark.functions.sketch as sk


def _exact_topk(keys, k):
    return (
        keys.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key")).limit(k)
    )


def test_heavy_hitters_equals_exact_topk_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keys = sk.token_keys(docs, "text")
    got = sk.heavy_hitters(keys, k=20, capacity=4096).collect()
    want = _exact_topk(keys, 20).collect()
    assert [(r["key"], r["n"]) for r in got] == \
           [(r["key"], r["n"]) for r in want]


def test_mg_candidates_superset_guarantee(spark):
    """Every key with global count > N/(capacity+1) must appear in the
    candidate union — the pigeonhole form of the MG bound, under a
    deliberately tiny capacity and forced multi-partition input."""
    # zipf-ish: key_i has count 600 // (i + 1)
    rows = [(f"k{i:03d}",) for i in range(60) for _ in range(600 // (i + 1))]
    df = spark.createDataFrame(rows, "key string").repartition(8)
    n = len(rows)
    capacity = 8
    cand = {r["key"] for r in sk.mg_candidates(df, capacity=capacity)
            .where(F.col("key").isNotNull()).collect()}
    from collections import Counter
    true = Counter(r[0] for r in rows)
    must_have = {k for k, v in true.items() if v > n / (capacity + 1)}
    assert must_have, "fixture must exercise the bound"
    assert must_have <= cand, must_have - cand


def test_mg_sentinels_carry_total_and_shrink(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)],
                               "key string").repartition(4)
    summ = sk.mg_candidates(df, capacity=1000)
    sent = summ.where(F.col("key").isNull())
    agg = sent.agg(F.sum("est").alias("n"), F.max("shrunk").alias("s")).first()
    assert agg["n"] == 100 and agg["s"] is False


def test_heavy_hitters_inconclusive_raises_and_warns(spark):
    """One genuinely hot key over a sea of uniques, capacity far too
    small: the hot key clears the MG bound and is recounted exactly,
    but the uniques all cancel out of the saturated sketches, so the
    top-5 SET cannot be certified -> fail mode raises, warn mode
    returns the (exact) surviving rows flagged guaranteed=False."""
    rows = [(f"u{i:04d}",) for i in range(400)] + [("hot",)] * 30
    df = spark.createDataFrame(rows, "key string").repartition(4)
    with pytest.raises(ValueError, match="inconclusive"):
        sk.heavy_hitters(df, k=5, capacity=16)
    out = sk.heavy_hitters(df, k=5, capacity=16,
                           on_inconclusive="warn_column").collect()
    assert out and (out[0]["key"], out[0]["n"]) == ("hot", 30)
    assert all(r["guaranteed"] is False for r in out)


def test_heavy_hitters_small_keyspace_exact_below_k(spark):
    """Fewer distinct keys than k with no sketch saturation: all keys
    returned exactly, no raise — the candidates ARE the key space."""
    rows = [("a",)] * 7 + [("b",)] * 5 + [("c",)] * 2 + [(None,)] * 3
    df = spark.createDataFrame(rows, "key string").repartition(3)
    got = [(r["key"], r["n"])
           for r in sk.heavy_hitters(df, k=20, capacity=64).collect()]
    assert got == [("a", 7), ("b", 5), ("c", 2)]  # nulls never hitters


def test_recount_plan_is_broadcast_join_and_takeordered(spark, sf_dir):
    """The pass-2 shape heavy_hitters builds: candidate side broadcast
    (bounded at partitions x capacity), top-k as TakeOrderedAndProject —
    never a shuffled join or a global Sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keys = sk.token_keys(docs, "text")
    cand = (sk.mg_candidates(keys, capacity=4096)
            .where(F.col("key").isNotNull()).select("key").distinct())
    top = (keys.join(F.broadcast(cand), "key", "inner")
           .groupBy("key").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), F.asc("key")).limit(20))
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cli_profile_skew_flag(spark, tmp_path, capsys):
    """--profile-skew measures hot conv_id keys on --table, prints the
    top offenders + a suggested n_salts, and exits 0 without running the
    suite. Missing --table and a conv-column-less table are usage
    errors (exit 2)."""
    from mlcast_sourcedata_validator_spark.cli import main
    from mlcast_sourcedata_validator_spark.synth import generate_transcripts

    tdf = generate_transcripts(spark, n_convs=80, seed=11)
    tbl = str(tmp_path / "tbl")
    tdf.write.parquet(tbl)
    rc = main(["--table", tbl, "--profile-skew", "--skew-top", "3",
               "--cores", "8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "top 3 hot conv_id keys" in out
    assert "suggested n_salts" in out

    assert main(["--profile-skew", "--cores", "8"]) == 2
    assert "--profile-skew requires --table" in capsys.readouterr().err

    nocol = str(tmp_path / "nocol")
    spark.range(5).write.parquet(nocol)
    assert main(["--table", nocol, "--profile-skew", "--cores", "8"]) == 2
    assert "not in table columns" in capsys.readouterr().err


def test_hot_keys_check_sketch_method(spark):
    """hot_keys check with method='sketch': same verdicts as the salted
    profile on balanced vs planted-hot fixtures, detail labelled, bad
    method rejected."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.suite import (
        CheckSpec, CheckSuite, RunContext)

    def suite(params):
        return CheckSuite("skew_s", [CheckSpec(
            "hot_keys", "hot_keys", "7.1 skew",
            "No conv_id may dominate the key distribution.", params)])

    balanced = spark.range(0, 3000).select(
        (F.col("id") % 100).cast("string").alias("conv_id"),
        (F.col("id") / 100).cast("int").alias("turn_idx"))
    res = run_suite(RunContext(spark=spark, df=balanced,
                               suite=suite({"max_x_mean": 50.0,
                                            "method": "sketch"}),
                               run_id="s1"))
    assert [r.status for r in res.report.results] == ["PASS"]
    assert "sketch profile" in res.report.results[0].detail

    hot = balanced.unionByName(spark.range(0, 20000).select(
        F.lit("hotconv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx")))
    res2 = run_suite(RunContext(spark=spark, df=hot,
                                suite=suite({"max_x_mean": 50.0,
                                             "method": "sketch"}),
                                run_id="s2"))
    r2 = res2.report.results
    assert [r.status for r in r2] == ["WARNING"]
    assert "hotconv=20000" in r2[0].detail

    with pytest.raises(ValueError, match="method"):
        run_suite(RunContext(spark=spark, df=balanced,
                             suite=suite({"method": "nope"}), run_id="s3"))


def test_mg_merge_error_bound_property():
    """Pure-python property: the per-batch merge form of Misra-Gries
    (Counter.update + one decrement step, exactly what mg_candidates and
    streaming hot_keys run per Arrow batch) keeps the mergeable-summaries
    bound: for every item, freq(x) - N/(capacity+1) <= est(x) <= freq(x),
    and every item with freq(x) > N/(capacity+1) survives."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from mlcast_sourcedata_validator_spark.functions.sketch import (
        _mg_shrink,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=0, max_value=30), max_size=60),
            max_size=8),
        st.integers(min_value=1, max_value=12),
    )
    def check(batches, capacity):
        mg: Counter = Counter()
        for batch in batches:
            mg.update(batch)
            _mg_shrink(mg, capacity)
        true = Counter(x for b in batches for x in b)
        n = sum(true.values())
        bound = n / (capacity + 1)
        assert len(mg) <= capacity
        for x, f in true.items():
            est = mg.get(x, 0)
            assert est <= f, (x, est, f)
            assert est >= f - bound - 1e-9, (x, est, f, bound)
            if f > bound:
                assert x in mg, (x, f, bound)

    check()


# --- Count-Min ---------------------------------------------------------------


def _keys_df(spark, items):
    return spark.createDataFrame([(k,) for k in items], "key string")


def test_cm_estimate_never_undercounts_and_is_exact_when_wide(spark):
    from mlcast_sourcedata_validator_spark.functions.sketch import (
        cm_estimate, cm_sketch)

    items = (["hot"] * 50 + ["warm"] * 20
             + [f"k{i}" for i in range(200) for _ in (0, 1)])
    df = _keys_df(spark, items)
    probes = df.distinct()
    exact = {k: items.count(k) for k in set(items)}

    # narrow sketch: collisions certain (202 keys into 64 columns) —
    # the CM guarantee est >= true must still hold everywhere
    sk = cm_sketch(df, "key", depth=4, width=64)
    est = {r["key"]: r["est"]
           for r in cm_estimate(sk, probes, "key",
                                depth=4, width=64).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert sum(est.values()) > sum(exact.values())  # collisions happened

    # wide sketch: width >> keys, depth 4 — overcount requires all 4
    # rows to collide, overwhelmingly unlikely at this size; equality
    # is the practical check that the cells are computed right
    sk2 = cm_sketch(df, "key", depth=4, width=8192)
    est2 = {r["key"]: r["est"]
            for r in cm_estimate(sk2, probes, "key",
                                 depth=4, width=8192).collect()}
    assert est2 == exact


def test_cm_merge_equals_sketch_of_union(spark):
    from mlcast_sourcedata_validator_spark.functions.sketch import (
        cm_merge, cm_sketch)

    a = ["x"] * 10 + [f"a{i}" for i in range(50)]
    b = ["x"] * 5 + [f"b{i}" for i in range(30)]
    sa = cm_sketch(_keys_df(spark, a), "key", depth=3, width=128)
    sb = cm_sketch(_keys_df(spark, b), "key", depth=3, width=128)
    merged = {(r["row"], r["col"]): r["cnt"]
              for r in cm_merge(sa, sb).collect()}
    union = {(r["row"], r["col"]): r["cnt"]
             for r in cm_sketch(_keys_df(spark, a + b), "key",
                                depth=3, width=128).collect()}
    assert merged == union


def test_cm_sketch_bounds_and_null_handling(spark):
    import pytest as _pytest

    from mlcast_sourcedata_validator_spark.functions.sketch import (
        cm_sketch)

    df = spark.createDataFrame([("a",), (None,), ("a",)], "key string")
    sk = cm_sketch(df, "key", depth=2, width=16)
    # nulls skipped: every populated cell counts exactly the two 'a's
    assert sorted(r["cnt"] for r in sk.collect()) == [2, 2]
    with _pytest.raises(ValueError):
        cm_sketch(df, "key", depth=0)
    with _pytest.raises(ValueError):
        cm_sketch(df, "key", width=1)
