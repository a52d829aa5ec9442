"""SparkSession builder tuned for this engine.

Scale stance: these defaults are chosen so the same logical plans survive a
1000-executor / 100 TB deployment — AQE handles runtime coalescing and skew
joins, broadcast thresholds let small-dim joins (region/nation/customer dims,
aggregate build sides of the reference views) avoid shuffles, and UTC session
time makes timestamp semantics storage-identical across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "streamlit-projet-spark-streaming-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic broadcast conversion (SURVEY.md §4 "Broadcast joins").
    - ``spark.sql.session.timeZone=UTC``: parquet timestamps compare
      bit-identically against the DuckDB oracle.
    - shuffle partitions default to the local core count; on a real
      cluster AQE coalesces the 2000-partition initial value downward.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size (64 MB) instead of padding
        # partition counts up to cluster parallelism: tiny post-agg shuffles
        # coalesce to 1 task instead of 32 (or 32,000 on a real cluster) —
        # the Spark-docs-recommended setting for both regimes.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ENGINE-WIDE stance on parquet TIMESTAMP(NANOS) (which Spark has
        # no native type for): read as nanosecond longs; the catalog's
        # load_table converts known nanos columns to microsecond
        # timestamps explicitly. Declared here (and defensively re-set in
        # load_table for driver-owned sessions) so the behavior is an
        # engine contract, not a hidden side effect of the first events
        # read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep driver results small: every engine query is an aggregate or
        # a LIMITed scan; nothing collects raw fact tables.
        .config("spark.driver.maxResultSize", "1g")
        # local mode: the driver JVM hosts all executor threads; the 1g
        # default heap OOMs on shuffle-heavy ops (only honored at JVM
        # launch, i.e. for the first session in the process)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
