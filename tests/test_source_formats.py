"""Format-aware table reading (parquet/orc/jsonl/csv): the validation
engine must ingest the formats a training-data pipeline actually ships
(JSONL shards above all), with scale-safe schema handling — explicit
schema as the path of record, inference bounded to the FIRST data file
(Spark's JSON inference otherwise reads every record of every file)."""

from __future__ import annotations

import json
import os

import pytest

from mlcast_sourcedata_validator_spark.compiler import run_suite
from mlcast_sourcedata_validator_spark.report import FAIL
from mlcast_sourcedata_validator_spark.sources.tables import (
    infer_schema_bounded,
    read_table,
)
from mlcast_sourcedata_validator_spark.suite import RunContext, get_suite


@pytest.fixture(scope="module")
def docs_pq(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()


def _data_verdicts(res):
    """(section, status) rows for data checks (storage/license need a
    table dir and degrade differently per format — excluded)."""
    return sorted(
        (r.section, r.status) for r in res.report.results
        if not r.section.startswith(("5.1", "6."))
    )


def test_jsonl_and_csv_suite_match_parquet(spark, docs_pq, tmp_path):
    base = run_suite(RunContext(spark=spark, df=docs_pq,
                                suite=get_suite("documents_v1"), run_id="pq"))
    jl = str(tmp_path / "docs_jsonl")
    docs_pq.coalesce(2).write.mode("overwrite").json(jl)
    cs = str(tmp_path / "docs_csv")
    docs_pq.coalesce(2).write.mode("overwrite") \
        .option("header", "true").csv(cs)

    for ref, fmt in ((jl, "json"), (cs, "csv")):
        df = read_table(spark, ref, fmt=fmt, schema=docs_pq.schema)
        assert df.schema == docs_pq.schema  # explicit schema: exact dtypes+order
        res = run_suite(RunContext(spark=spark, df=df,
                                   suite=get_suite("documents_v1"),
                                   run_id=f"fmt_{fmt}"))
        assert _data_verdicts(res) == _data_verdicts(base), fmt
        assert res.n_input_rows == docs_pq.count()


def test_format_detection_from_extension(spark, docs_pq, tmp_path):
    one = str(tmp_path / "docs.jsonl")
    with open(one, "w") as f:
        for r in docs_pq.limit(5).toJSON().collect():
            f.write(r + "\n")
    df = read_table(spark, one)  # .jsonl -> json, bounded inference
    assert df.count() == 5 and "doc_id" in df.columns


def test_bounded_inference_reads_first_file_only(spark, tmp_path):
    """The second shard carries an EXTRA field; a full-corpus inference
    would surface it. The bounded inference (first file only) must not —
    proving no pass over later shards."""
    d = str(tmp_path / "shards")
    os.makedirs(d)
    with open(os.path.join(d, "part-000.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "a"}) + "\n")
    with open(os.path.join(d, "part-001.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "b", "extra": "X"}) + "\n")
    schema = infer_schema_bounded(spark, d, "json")
    assert set(schema.fieldNames()) == {"doc_id", "text"}
    df = read_table(spark, d, fmt="json")
    assert df.count() == 2 and "extra" not in df.columns

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="pass schema"):
        infer_schema_bounded(spark, empty, "json")


def test_cli_format_and_schema_flags(spark, docs_pq, tmp_path, capsys):
    from mlcast_sourcedata_validator_spark import cli

    jl = str(tmp_path / "cli_docs_jsonl")
    docs_pq.coalesce(1).write.mode("overwrite").json(jl)

    # WITHOUT an explicit schema the engine is RIGHT to fail the
    # column-order gate: JSON objects are unordered and Spark sorts
    # inferred fields — the finding is real, and the gate then skips the
    # data checks
    rc0 = cli.main(["--suite", "documents_v1", "--table", jl,
                    "--format", "json"])
    out0 = capsys.readouterr().out
    assert rc0 == 1 and "column order" in out0

    # WITH --schema (the scale path: zero inference) the table validates
    # end-to-end; only the absent license sidecar fails -> still exit 1,
    # but every data check ran over all 500 rows
    ddl = ("doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")
    rc = cli.main(["--suite", "documents_v1", "--table", jl,
                   "--format", "json", "--schema", ddl])
    out = capsys.readouterr().out
    assert rc == 1
    assert "row count 500 >= 1" in out
    assert "table property 'license' is missing" in out
    assert "skipped: schema validation failed" not in out


def test_orc_roundtrip_and_detection(spark, docs_pq, tmp_path):
    """ORC: self-describing (schema from file metadata, no inference) —
    suite data verdicts identical to parquet."""
    oc = str(tmp_path / "docs.orc")
    docs_pq.coalesce(1).write.mode("overwrite").orc(oc)
    df = read_table(spark, oc)  # .orc extension -> orc reader
    assert df.schema == docs_pq.schema
    base = run_suite(RunContext(spark=spark, df=docs_pq,
                                suite=get_suite("documents_v1"), run_id="o0"))
    res = run_suite(RunContext(spark=spark, df=df,
                               suite=get_suite("documents_v1"), run_id="o1"))
    assert _data_verdicts(res) == _data_verdicts(base)
