"""Declarative suite serialization (suite.py suite_to_json /
suite_from_json / load_suite_file + CLI --suite-file): suites are DATA —
they round-trip through JSON, load-time-validate their kinds, and run
identically to their registry twins."""

from __future__ import annotations

import json

import pytest

from mlcast_sourcedata_validator_spark.suite import (
    RunContext,
    get_suite,
    list_suites,
    load_suite_file,
    suite_from_json,
    suite_to_dict,
    suite_to_json,
)


def test_every_registered_suite_round_trips():
    """dataclass equality through JSON for EVERY registered suite — any
    future check whose params stop being JSON literals breaks here, at
    the suite it broke, not in a user's deployment."""
    for name in list_suites():
        s = get_suite(name)
        rt = suite_from_json(suite_to_json(s))
        assert rt == s, name


def test_json_loaded_suite_runs_identically(spark, tmp_path):
    """A suite loaded from a JSON FILE must produce byte-identical
    report rows to its registry twin on a dirty fixture (same checks,
    same verdicts, same messages)."""
    from mlcast_sourcedata_validator_spark.compiler import run_suite
    from mlcast_sourcedata_validator_spark.synth import (
        generate_conversations_registry,
        generate_transcripts,
        inject_violations,
    )

    p = tmp_path / "transcripts_v1.json"
    p.write_text(suite_to_json(get_suite("transcripts_v1")))
    loaded = load_suite_file(str(p))

    clean = generate_transcripts(spark, n_convs=40, seed=11).localCheckpoint()
    dirty, _ = inject_violations(clean, k=3, seed=11)
    reg = generate_conversations_registry(dirty)

    def rows(suite):
        res = run_suite(RunContext(spark=spark, df=dirty, suite=suite,
                                   run_id="io", registry_df=reg))
        return sorted(
            (r.section, r.requirement, r.status, r.detail)
            for r in res.report.results
        )

    assert rows(loaded) == rows(get_suite("transcripts_v1"))


def test_load_time_validation():
    base = suite_to_dict(get_suite("transcripts_v1"))

    bad_kind = json.loads(json.dumps(base))
    bad_kind["checks"][0]["kind"] = "nope_kind"
    with pytest.raises(ValueError, match="unknown kind 'nope_kind'"):
        suite_from_json(json.dumps(bad_kind))

    dup = json.loads(json.dumps(base))
    dup["checks"].append(dict(dup["checks"][0]))
    with pytest.raises(ValueError, match="duplicate check_id"):
        suite_from_json(json.dumps(dup))

    ver = json.loads(json.dumps(base))
    ver["version"] = 99
    with pytest.raises(ValueError, match="version"):
        suite_from_json(json.dumps(ver))

    with pytest.raises(ValueError, match="suite_id"):
        suite_from_json("{}")

    missing = json.loads(json.dumps(base))
    del missing["checks"][0]["kind"]
    with pytest.raises(ValueError, match="missing fields"):
        suite_from_json(json.dumps(missing))


def test_cli_suite_file(spark, sf_dir, tmp_path, capsys):
    """--suite-file drives the run end-to-end: same exit-code contract
    as the registry path, and a broken file exits 2 with a load error
    (not a mid-run crash)."""
    from mlcast_sourcedata_validator_spark import cli
    from mlcast_sourcedata_validator_spark.sources.properties import (
        write_table_properties,
    )

    sf = tmp_path / "documents_v1.json"
    sf.write_text(suite_to_json(get_suite("documents_v1")))

    tbl = str(tmp_path / "docs_tbl")
    spark.read.parquet(f"{sf_dir}/documents.parquet").coalesce(1) \
        .write.mode("overwrite").parquet(tbl)
    write_table_properties(tbl, {"license": "CC-BY-4.0"})
    assert cli.main(["--suite-file", str(sf), "--table", tbl]) == 0
    # dirty table (no license sidecar) -> exit 1 through the same file
    assert cli.main(["--suite-file", str(sf),
                     "--table", f"{sf_dir}/documents.parquet"]) == 1

    bad = tmp_path / "bad.json"
    bad.write_text('{"suite_id": "x", "checks": [{"check_id": "a", '
                   '"kind": "nope", "section": "s", "requirement": "r"}]}')
    capsys.readouterr()
    assert cli.main(["--suite-file", str(bad), "--table", tbl]) == 2
    assert "unknown kind" in capsys.readouterr().err


def test_shipped_suite_files_are_fresh():
    """suites/*.json are the COMMITTED declarative form of every
    registered suite (what a no-Python deployment feeds --suite-file).
    They must stay byte-fresh: editing a plans/ module without
    regenerating them fails here. Regenerate with:
    python -c "from mlcast_sourcedata_validator_spark.suite import *;
    [open(f'suites/{n}.json','w').write(suite_to_json(get_suite(n))+'\\n')
     for n in list_suites()]"
    """
    import os

    here = os.path.join(os.path.dirname(__file__), "..", "suites")
    on_disk = {f[:-5] for f in os.listdir(here) if f.endswith(".json")}
    assert on_disk == set(list_suites())
    for name in sorted(on_disk):
        with open(os.path.join(here, f"{name}.json")) as f:
            assert f.read() == suite_to_json(get_suite(name)) + "\n", name


def test_cli_report_json(spark, sf_dir, tmp_path):
    """--report-json writes the machine-readable report beside the
    console print: whole-table runs get one document whose exit_code
    matches the process exit; partitioned runs get a per-partition
    breakdown."""
    import json

    from mlcast_sourcedata_validator_spark import cli

    out = tmp_path / "report.json"
    rc = cli.main(["--suite", "documents_v1",
                   "--table", f"{sf_dir}/documents.parquet",
                   "--report-json", str(out)])
    doc = json.loads(out.read_text())
    assert doc["exit_code"] == rc == 1  # no license sidecar
    assert doc["suite_id"] == "documents_v1"
    statuses = {r["status"] for r in doc["results"]}
    assert "FAIL" in statuses and len(doc["results"]) >= 5
    assert doc["summary"]["fails"] >= 1
