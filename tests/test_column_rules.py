"""Rule-engine parity: OR-of-AND matching with case normalization and the
composite missing-categories row (ref checks/coords/names.py)."""

from pyspark.sql import types as T

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.operators.column_rules import find_columns
from mlcast_sourcedata_validator_spark.report import FAIL, PASS
from mlcast_sourcedata_validator_spark.suite import CheckSpec, CheckSuite, RunContext


def _schema():
    return T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("when", T.TimestampType(),
                      metadata={"standard_name": " Time ", "axis": "t"}),
        T.StructField("payload", T.StringType(), metadata={"role": "Payload"}),
    ])


def test_all_conditions_must_match_and_any_rule_suffices():
    schema = _schema()
    # metadata values are case/space-normalized (lower/strip; axis upper)
    assert find_columns(schema, [{"metadata": {"standard_name": "time"}}]) == ["when"]
    assert find_columns(schema, [{"metadata": {"axis": "T"}}]) == ["when"]
    # ALL conditions in one rule: name matches but type doesn't -> no match
    assert find_columns(schema, [{"name": "when", "type": "string"}]) == []
    # ANY rule: second rule matches
    assert find_columns(
        schema,
        [{"name": "nope"}, {"name": "CONV_ID", "type": "string"}],
    ) == ["conv_id"]
    assert find_columns(schema, [{"name_prefix": "pay"}]) == ["payload"]


def test_category_verdicts_and_composite_row(spark):
    df = spark.createDataFrame([], _schema())
    suite = CheckSuite("cr", [CheckSpec(
        "roles", "column_rules", "3.1", "roles",
        {"categories": {
            "time": {"rules": [{"metadata": {"standard_name": "time"}}]},
            "geo": {"rules": [{"metadata": {"standard_name": "latitude"}}]},
            "opt": {"rules": [{"name": "zzz"}], "required": False},
        }},
    )])
    res = run_suite(RunContext(spark=spark, df=df, suite=suite, run_id="t"))
    by_detail = {r.detail: r.status for r in res.report.results}
    assert by_detail["category 'time': matched column(s) ['when']"] == PASS
    assert by_detail["category 'geo': no column matches any rule"] == FAIL
    assert by_detail["category 'opt': optional, not present"] == PASS
    assert by_detail["required column categories missing: ['geo']"] == FAIL
