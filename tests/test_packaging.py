"""The --py-files archive must be complete and importable from sys.path
(how Spark ships it to executors) — the north_rule's `spark-submit
--py-files` deployment contract."""

from __future__ import annotations

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
