"""Build the --py-files archive for cluster submission.

Usage (spark-submit takes a script, not a -m module — use a 3-line
runner that calls cli.main, as tests/test_packaging.py does)::

    python tools/make_pyfiles_zip.py [out.zip]
    printf 'import sys\\nfrom mlcast_sourcedata_validator_spark.cli '\\
        'import main\\nsys.exit(main(sys.argv[1:]))\\n' > run_cli.py
    spark-submit --master ... \
        --py-files mlcast_sourcedata_validator_spark.zip run_cli.py \
        --suite transcripts_v1 --table s3://bucket/transcripts \
        --registry s3://bucket/registry --results s3://bucket/results

The archive contains only the package sources (no tests, no caches); it
is importable directly from sys.path, which is exactly how Spark ships
--py-files to executors (tests/test_packaging.py pins that).
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "mlcast_sourcedata_validator_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    print(build(out))
