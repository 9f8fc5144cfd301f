"""Driver-contract smoke: entry() runs and queries/oracle keys line up."""

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402


def test_entry_returns_results(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "suite_id", "run_id", "partition_id", "section", "requirement",
        "status", "detail", "module", "function",
    }
    # events contain 'error' rows -> the role-domain check must FAIL
    fails = [r for r in rows if r.status == "FAIL"]
    assert any("role" in r.detail for r in fails)


def test_every_oracle_key_has_a_query():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every driver-window query now has an exact oracle (the two ANN
    # queries run probe-all / nprobe=n_lists so brute-force SQL is exact)
    assert set(q) == set(o)


def test_two_fast_query_oracle_pairs_match(spark, sf_dir):
    """Tiny inline replica of the driver gate on sf0.001 for two cheap
    queries (the full sweep lives in tools/check_oracles.py)."""
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    for name in ("stats_events", "refint_events_registry",
                 "conv_text_equality_events", "table_diff_events"):
        sdf = q[name](spark, sf_dir)
        srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
        orows = sorted(tuple(str(v) for v in r) for r in con.sql(o[name]).fetchall())
        assert srows == orows, name
