"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (and harmless locally):
* AQE on (runtime coalescing + skew splitting),
* Arrow self-destruct + batch sizing for the pandas-UDF hot path,
* shuffle partitions sized to cores locally (cluster deploys override).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ragstudio-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        # multi-KB turn payloads: keep Arrow batches bounded so a batch of
        # long transcripts fits executor memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate synthesizes size(expr)>0 below explode()
        # and pushdown then inlines the generator's (interpreted, higher-
        # order) expression several times per row — measured 6× slowdown on
        # shingle explosion. The inferred filter is a minor skip-empty
        # heuristic; dropping it is strictly cheaper for lambda-built arrays.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
