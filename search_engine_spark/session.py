"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from search_engine_spark.config import EngineConfig


def get_spark(
    app_name: str = "search_engine_spark",
    master: str | None = None,
    config: EngineConfig | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults chosen for the 100 TB design point, harmless locally:
    - AQE on (runtime coalescing + skew splitting),
    - Arrow on (every custom stage is a pandas UDF / mapInPandas),
    - shuffle partitions from config (at cluster scale: ~2-3x total cores).
    """
    cfg = config or EngineConfig()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes",
                str(cfg.files_max_partition_bytes))
        .config("spark.sql.files.openCostInBytes",
                str(cfg.files_open_cost_bytes))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in cfg.extra_spark_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
