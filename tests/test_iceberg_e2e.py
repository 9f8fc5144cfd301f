"""Real-Iceberg end-to-end leg (VERDICT r3/r4 carried item): exercise
`CatalogResultsStore` on a GENUINE Iceberg catalog — snapshot-commit
`overwritePartitions` idempotency, crash/resume via the lineage
contract, `.files` metadata-table codec sampling, and `SHOW
TBLPROPERTIES` `format-version` — not the parquet-session-table
fallback the sandbox tests pin.

This sandbox ships no iceberg-spark-runtime jar and has no network to
fetch one (probes documented in BENCH/BASELINE.md), so HERE the test
skips with a declared reason. On any image that carries the jar
(set ``ICEBERG_SPARK_RUNTIME_JAR`` or drop it in ``$SPARK_HOME/jars``)
it runs for real: the session is built in a SUBPROCESS because the
suite's shared JVM starts without the jar and Spark cannot add catalog
jars to a live JVM.

Reference analog: the storage-health checks this store feeds mirror
checks/global_attributes/zarr_format.py:33-88 (consolidated metadata /
format-version on a real store, skip-with-reason when the optional
runtime is absent — the reference's GDAL/cartopy gate pattern).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_RUNTIME_JAR")
    if env and os.path.isfile(env):
        return env
    roots = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    roots += [os.path.expanduser("~/.ivy2/jars"),
              os.path.expanduser("~/.ivy2.5.2/jars")]
    for r in roots:
        hits = sorted(glob.glob(
            os.path.join(r, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[-1]
    return None


_E2E = r"""
import os, sys
sys.path.insert(0, os.environ["E2E_REPO"])
from pyspark.sql import SparkSession, functions as F

wh = os.environ["E2E_WAREHOUSE"]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("iceberg-e2e")
    .config("spark.jars", os.environ["E2E_JAR"])
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", wh)
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from mlcast_sourcedata_validator_spark.checkpoint import (
    CatalogResultsStore, iceberg_runtime_available, run_partitioned,
    write_partitioned_transcripts)
from mlcast_sourcedata_validator_spark.sources.catalog import (
    catalog_properties, sample_file_paths)
from mlcast_sourcedata_validator_spark.suite import get_suite
from mlcast_sourcedata_validator_spark.synth import (
    generate_transcripts, generate_conversations_registry)

assert iceberg_runtime_available(spark), "jar on classpath but probe False"

# a small partitioned source table (~4 date partitions, fast loop)
df = generate_transcripts(spark, n_convs=60, seed=7)
df = df.withColumn(
    "ts",
    F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    + F.make_interval(secs=F.pmod(F.xxhash64("conv_id"), F.lit(4)) * 86400
                      + F.col("turn_idx") * 10))
table_path = os.path.join(os.environ["E2E_WAREHOUSE"], "src_transcripts")
write_partitioned_transcripts(df, table_path)
registry = generate_conversations_registry(df)
spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")

# a real Iceberg data table: .files metadata + properties surfaces
df.writeTo("local.db.transcripts").using("iceberg") \
    .tableProperty("write.parquet.compression-codec", "zstd") \
    .createOrReplace()
props = catalog_properties(spark, "local.db.transcripts")
assert props.get("format-version") in {"1", "2", "3"}, props
files = sample_file_paths(spark, "local.db.transcripts", 5)
assert files and all(f.endswith(".parquet") for f in files), files

# the results store against the genuine catalog: iceberg format resolves
store = CatalogResultsStore(spark, "local.db.valstore")
assert store.format == "iceberg", store.format

suite = get_suite("transcripts_v1")

class Boom(Exception):
    pass

calls = []

def injector(p):
    calls.append(p)
    if len(calls) == 2:
        raise Boom()

try:
    run_partitioned(spark, suite, table_path, "local.db.valstore",
                    registry_df=registry, fail_injector=injector)
    raise SystemExit("expected injected crash")
except Boom:
    pass
# partition 2 wrote data but no lineage -> not committed
assert len(store.committed(suite.suite_id)) == 1

summary = run_partitioned(spark, suite, table_path,
                          "local.db.valstore", registry_df=registry)
assert len(summary.skipped) == 1, summary
done = store.committed(suite.suite_id)
assert done == set(summary.processed) | set(summary.skipped)

# overwritePartitions left exactly one copy per partition: re-running a
# partition REPLACED its rows (snapshot commit), never appended
res = spark.table("local.db.valstore_results")
dup = (res.groupBy("partition_id", "section", "requirement", "detail")
       .count().where("count > 1").count())
assert dup == 0, f"{dup} duplicated result rows after resume"

# the snapshot log recorded real Iceberg commits (crash run + resume)
snaps = spark.sql(
    "SELECT COUNT(*) FROM local.db.valstore_results.snapshots").first()[0]
assert snaps >= 2, snaps
print("ICEBERG_E2E_OK", len(done), snaps)
spark.stop()
"""


def test_catalog_results_store_on_real_iceberg(tmp_path):
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar on this image and no network "
            "to fetch one (see BENCH/BASELINE.md 'Environment-gap "
            "acquisition attempts'); set ICEBERG_SPARK_RUNTIME_JAR to "
            "run the real-catalog e2e")
    env = dict(os.environ)
    env.update({"E2E_REPO": REPO, "E2E_JAR": jar,
                "E2E_WAREHOUSE": str(tmp_path / "wh")})
    proc = subprocess.run([sys.executable, "-c", _E2E], env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG_E2E_OK" in proc.stdout
