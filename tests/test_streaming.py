"""Structured Streaming demonstration (SURVEY.md §2.9).

The reference is pure batch; the engine's streaming surface is the
standard Spark path: file source → watermarked tumbling-window agg →
``Trigger.AvailableNow`` → sink.  The correctness oracle is the batch
twin of the same aggregation over the same input — streaming and batch
must agree exactly once all data is processed.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """File-source directory: split the events parquet into a few files
    (a stream of micro-batches at AvailableNow)."""
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = str(tmp_path_factory.mktemp("events_stream"))
    src.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_streaming_windowed_agg_matches_batch(spark, events_dir, tmp_path):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .parquet(events_dir)
        # event-time watermarks require TIMESTAMP, the file carries NTZ
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_events")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from hourly_events").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_incremental_processing(spark, events_dir, tmp_path):
    """AvailableNow with maxFilesPerTrigger actually ran >1 micro-batch
    (i.e. the agg was computed incrementally, not as one batch)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    counts = stream.groupBy("event_type").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("type_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progress = q.recentProgress
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 2
    got = {
        r["event_type"]: r["count"]
        for r in spark.sql("select * from type_counts").collect()
    }
    want = {
        r["event_type"]: r["count"]
        for r in spark.read.parquet(events_dir).groupBy("event_type").count().collect()
    }
    assert got == want
