"""The --py-files archive must be complete and importable from sys.path
(how Spark ships it to executors) — the north_rule's `spark-submit
--py-files` deployment contract."""

from __future__ import annotations

import pytest
import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    out = str(tmp_path / "pkg.zip")
    from tools.make_pyfiles_zip import build

    build(out)
    # a FRESH interpreter with only the zip on sys.path must import the
    # full engine surface (catches any non-.py asset or path mistake)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import mlcast_sourcedata_validator_spark.cli as c\n"
        "import mlcast_sourcedata_validator_spark.compiler\n"
        "import mlcast_sourcedata_validator_spark.checkpoint\n"
        "import mlcast_sourcedata_validator_spark.functions.dedup\n"
        "import mlcast_sourcedata_validator_spark.functions.similarity\n"
        "import mlcast_sourcedata_validator_spark.streaming.conversation_state\n"
        "from mlcast_sourcedata_validator_spark.suite import list_suites\n"
        "assert 'transcripts_v1' in list_suites()\n"
        "assert 'documents_v1' in list_suites()\n"
        "print('zip-import-ok')\n"
    )
    res = subprocess.run([sys.executable, "-c", code, out],
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr
    assert "zip-import-ok" in res.stdout


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """The north_rule deployment contract, executed for real: the demo
    suite runs through the actual `spark-submit --py-files <zip>` path
    from a working dir outside the repo, and exits 1 on dirty data."""
    import os
    import shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest
        pytest.skip("spark-submit not on PATH")

    from tools.make_pyfiles_zip import build

    zip_path = str(tmp_path / "pkg.zip")
    build(zip_path)
    runner = tmp_path / "run_demo.py"
    runner.write_text(
        "import sys\n"
        "from mlcast_sourcedata_validator_spark.cli import main\n"
        "sys.exit(main(['--demo', '--cores', '8']))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    res = subprocess.run(
        [spark_submit, "--master", "local[8]",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", zip_path, str(runner)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env,
    )
    # demo data is dirty by construction -> exit code 1, with the report
    # rendered and violations counted
    assert res.returncode == 1, res.stderr[-2000:]
    assert "summary:" in res.stdout and "violation rows" in res.stdout
