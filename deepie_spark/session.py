"""SparkSession factory with scale-oriented defaults.

Local mode is a test harness only; every config below is chosen so the
same plans hold on a multi-executor cluster (AQE, skew-join handling,
Arrow batching, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deepie_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all local
    cores. ``shuffle_partitions`` defaults to the core count — on a real
    cluster you'd size this to ~2-3x total executor cores / target
    128-256 MB shuffle blocks; AQE coalescing then trims small partitions
    at runtime.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local testdata is one parquet file; cap split size so scans
        # parallelize like a real many-file table would (4 MB splits)
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_parallelism(df, target: int | None = None):
    """Repartition only when the input is under-partitioned.

    CPU-heavy per-row stages (shingling, hashing, Arrow UDFs) must run at
    cluster parallelism; a production table arrives in many splits so
    this is a no-op there, but a single small local parquet would
    otherwise pin the whole stage to one or two cores.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load driver-provided parquet tables and register temp views.

    Returns a dict name -> DataFrame. Column pruning + predicate pushdown
    reach the parquet scan because these are plain `spark.read.parquet`
    relations.
    """
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
