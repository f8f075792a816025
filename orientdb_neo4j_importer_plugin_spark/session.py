"""SparkSession factory with scale-appropriate defaults.

Reference analogue: ``ONeo4jImporterInitializer.initConnections``
(``ONeo4jImporterInitializer.java:84-167``) — source/target connection
bootstrap. Here the "connection" is the SparkSession itself; the defaults
encode the execution-model decisions that matter at 100 TB:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing),
* Arrow on (vectorized pandas UDF transfer — the only sanctioned Python path),
* UTC session timezone (deterministic timestamp semantics across executors),
* shuffle partitions sized to cores locally; on a real cluster this should be
  ~2-3x total executor cores (or left to AQE's coalescing with a high initial).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "cdc-ingest-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{DEFAULT_CPUS}]"
    # local[N] -> N concurrent tasks; shuffle partitions at 2x for elasticity,
    # AQE coalesces the excess at runtime.
    if shuffle_partitions is None:
        n = DEFAULT_CPUS
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            n = DEFAULT_CPUS if inner == "*" else int(inner)
        shuffle_partitions = max(8, 2 * n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-mode niceties; harmless on a cluster
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
