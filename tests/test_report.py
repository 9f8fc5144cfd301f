"""Report model parity with the reference's specs/base.py semantics."""

import pytest

from mlcast_sourcedata_validator_spark.report import (
    FAIL,
    PASS,
    WARNING,
    Result,
    ValidationReport,
)


def test_status_domain_enforced():
    # ref specs/base.py:22-27 — the docstring's "INFO" is rejected there too
    with pytest.raises(ValueError):
        Result("s", "r", "INFO")
    for ok in (FAIL, WARNING, PASS):
        Result("s", "r", ok)


def test_merge_is_order_preserving_union_all():
    a = ValidationReport()
    a.add("s1", "r1", PASS)
    b = ValidationReport()
    b.add("s2", "r2", FAIL, "boom")
    b.add("s2", "r2", FAIL, "boom")  # duplicates preserved (union-all)
    merged = a + b
    assert [r.section for r in merged.results] == ["s1", "s2", "s2"]
    a += b
    assert len(a.results) == 3


def test_summarize_and_has_fails():
    r = ValidationReport()
    r.add("s", "r", PASS)
    r.add("s", "r", WARNING)
    assert r.summarize() == {FAIL: 0, WARNING: 1, PASS: 1}
    assert not r.has_fails()
    r.add("s", "r", FAIL)
    assert r.has_fails()
    # ref quirk: ok flag is never flipped by add() (base.py:30-33)
    assert r.ok is True


def test_to_df_schema(spark):
    r = ValidationReport()
    r.add("s", "req", PASS, "d", "mod", "fn")
    df = r.to_df(spark, suite_id="t", run_id="r1", partition_id="p0")
    row = df.collect()[0]
    assert row.suite_id == "t" and row.status == PASS and row.partition_id == "p0"


def test_console_print_strips_prefix(capsys):
    r = ValidationReport()
    r.add("s", "req", PASS, "d",
          "mlcast_sourcedata_validator_spark.operators.stats", "fn")
    out = r.console_print()
    assert "stats.fn" in out and "operators.stats.fn" not in out
