"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same conf set is what we would ship
to a 1000-executor cluster (AQE on, adaptive shuffle-partition coalescing,
broadcast threshold sized for dimension tables, Arrow enabled for the few
pandas-UDF operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mistocksync-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # and dynamic broadcast-join conversion — the scale levers.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for pandas_udf paths (fuzzy similarity scorer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp rendering for oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # The events table stores TIMESTAMP(NANOS) which Spark's vectorized
        # parquet reader rejects; read as long and convert explicitly
        # (sources.testdata.load_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode driver == executor: the heap holds every cached feed,
        # broadcast, and 32 concurrent task sorts.  8g on a 128 GiB box GC-
        # thrashed (identical warm queries varied 17s..126s); size the heap
        # to the machine.  On a real cluster this maps to executor memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # bucketed-table files for the catalog path (sources/catalog.py)
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
