"""SparkSession factory tuned for the validation workload.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-plan + skew-join handling), Arrow enabled for the pandas-UDF
drift stage, shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mlcast_sourcedata_validator_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is an int (-> ``local[N]``) or a full master string. Defaults
    to ``local[$SPARK_GRAFT_CPUS]`` (env), else ``local[*]``.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark")) else f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = min(64, max(8, n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # JVM unified logging defaults to STDOUT and the embedded JVM
        # inherits Python's fd 1 — under allocation pressure, [gc,alloc]
        # warnings would interleave with bench.py's single-JSON-line
        # stdout contract; route all JVM log output to stderr
        .config("spark.driver.extraJavaOptions",
                "-Xlog:disable -Xlog:all=warning:stderr")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
