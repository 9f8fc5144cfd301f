"""Edge cases found by runtime probing: empty batches, wrong schema,
missing registry."""

import pytest

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.report import FAIL
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_conversations_registry,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def clean(spark):
    return generate_transcripts(spark, n_convs=100, seed=42).localCheckpoint()


@pytest.fixture(scope="module")
def reg(clean):
    return generate_conversations_registry(clean).localCheckpoint()


def test_empty_batch_reports_instead_of_crashing(spark, clean, reg):
    res = run_suite(RunContext(spark=spark, df=clean.limit(0),
                               suite=get_suite("transcripts_v1"),
                               run_id="e", registry_df=reg))
    assert res.exit_code() == 1
    details = [r.detail for r in res.report.results if r.status == FAIL]
    assert any("row count 0" in d for d in details)
    assert any("no timestamps" in d for d in details)


def test_missing_column_gates_scan_checks(spark, clean, reg):
    """A failed schema check must gate scan checks into FAIL rows, not an
    unresolved-column AnalysisException (reference pattern: cheap checks
    gate expensive ones; per-check exceptions become report rows)."""
    res = run_suite(RunContext(spark=spark, df=clean.drop("tool"),
                               suite=get_suite("transcripts_v1"),
                               run_id="g", registry_df=reg))
    assert res.exit_code() == 1
    details = [r.detail for r in res.report.results]
    assert any("required column 'tool' is missing" in d for d in details)
    assert any("skipped: schema validation failed" in d for d in details)
    assert res.violations.count() == 0


def test_refint_without_registry_raises_clear_error(spark, clean):
    with pytest.raises(ValueError, match="registry_df"):
        run_suite(RunContext(spark=spark, df=clean,
                             suite=get_suite("transcripts_v1"), run_id="n"))
