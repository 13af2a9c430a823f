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


def test_stateful_running_totals_match_batch(spark, events_dir, tmp_path):
    """applyInPandasWithState running totals: the last update emitted per
    key must equal the batch aggregate over the whole input."""
    from deepie_spark.streaming.stateful import running_totals

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tot"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per key per touched batch; the final
    # state is the row with the max n per key
    rows = spark.sql(
        "select key, max_by(total, n) as total, max(n) as n"
        " from totals group by key"
    ).collect()
    got = {r["key"]: (r["n"], r["total"]) for r in rows}
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("total"),
        )
        .collect()
    }
    assert got == want


def test_stateful_first_seen_filter(spark, events_dir, tmp_path):
    """Streaming exact dedup: each user_id emitted exactly once."""
    from deepie_spark.streaming.stateful import first_seen_filter

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        first_seen_filter(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_fs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen").collect()
    keys = [r["key"] for r in rows]
    assert len(keys) == len(set(keys))  # exactly once per key
    want_keys = {
        r["user_id"]
        for r in spark.read.parquet(events_dir).select("user_id").distinct().collect()
    }
    assert set(keys) == want_keys


def test_streaming_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Continuous-ingest flagship path: pages as a multi-file stream
    through foreachBatch produce exactly the batch pipeline's triples,
    plus lineage manifest rows per micro-batch."""
    from deepie_spark.datagen.pages import pages_from_documents
    from deepie_spark.plans.pipeline import extract_triples
    from deepie_spark.streaming.pipeline_stream import stream_triples

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_from_documents(docs)
    pages_dir = str(tmp_path / "pages_stream")
    pages.repartition(4).write.parquet(pages_dir)

    out = str(tmp_path / "triples")
    manifest = str(tmp_path / "manifest")
    q = stream_triples(
        spark,
        pages_dir,
        out,
        manifest,
        str(tmp_path / "ckpt_pipe"),
        max_files_per_trigger=2,
    )
    q.awaitTermination(180)

    want = extract_triples(spark, pages).count()
    got = spark.read.parquet(out).count()
    assert got == want > 0
    m = spark.read.parquet(manifest)
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert len(stages) >= 2  # multiple micro-batches left lineage rows
    assert m.agg(F.sum("n_triples")).collect()[0][0] == want


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


def test_stream_stream_interval_join_matches_batch(spark, events_dir, tmp_path):
    """Watermarked stream-stream interval join (streaming/joins.py):
    each error joined to the same user's views in the prior 10 minutes.

    The fixture's files are UNORDERED in event time (repartition(4)
    round-robins a 30-day span across every file) and the stream is
    replayed one file per micro-batch — the maximally-disordered case
    — so per the operator's watermark contract, batch parity requires
    a watermark covering the whole replayed span.  With a small
    watermark this replay MUST lose matches (that is the documented
    eviction semantics, not a bug); a time-ordered source is what
    makes small watermarks sound in production."""
    from deepie_spark.streaming.joins import interval_join

    schema = spark.read.parquet(events_dir).schema

    def split(df):
        ts = df.withColumn("ts", F.col("ts").cast("timestamp"))
        errs = ts.filter(F.col("event_type") == "error").select(
            "user_id", F.col("ts").alias("err_ts"),
            F.col("event_id").alias("err_id"),
        )
        views = ts.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        return errs, views

    s_errs, s_views = split(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # strictest replay: 4 batches
        .parquet(events_dir)
    )
    joined = interval_join(
        s_errs, s_views, key="user_id",
        left_ts="err_ts", right_ts="view_ts",
        watermark="35 days",  # ≥ the unordered replay's full span
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("err_ctx")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["err_id"], r["view_id"])
        for r in spark.sql("select * from err_ctx").collect()
    }
    b_errs, b_views = split(spark.read.parquet(events_dir))
    want = {
        (r["err_id"], r["view_id"])
        for r in interval_join(
            b_errs, b_views, key="user_id",
            left_ts="err_ts", right_ts="view_ts",
            watermark="35 days",
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_window_batch_matches_lag_twin(spark, events_dir):
    """Native session_window (streaming/sessions.py) in BATCH equals
    the lag-based sessionization rule: a new session starts exactly
    when the gap to the previous event is >= 30 min (session_window
    intervals are end-exclusive), and session_end = last_ts + gap."""
    import datetime

    from deepie_spark.streaming.sessions import session_metrics

    batch = spark.read.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r["user_id"], r["first_ts"]): (
            r["n_events"], r["last_ts"], r["session_start"], r["session_end"]
        )
        for r in session_metrics(batch, gap="30 minutes").collect()
    }

    gap = datetime.timedelta(minutes=30)
    rows = sorted(
        ((r["user_id"], r["ts"]) for r in batch.select("user_id", "ts").collect()),
    )
    want = {}
    cur = None  # (user, first, last, n)
    for u, ts in rows:
        if cur is not None and cur[0] == u and ts - cur[2] < gap:
            cur = (u, cur[1], ts, cur[3] + 1)
        else:
            if cur is not None:
                want[(cur[0], cur[1])] = (cur[3], cur[2], cur[1], cur[2] + gap)
            cur = (u, ts, ts, 1)
    want[(cur[0], cur[1])] = (cur[3], cur[2], cur[1], cur[2] + gap)
    assert got == want


def test_session_window_stream_matches_batch(spark, events_dir, tmp_path):
    """Streaming session_window drains to EXACT batch parity when the
    replay ends with per-key FLUSH punctuation records (module
    docstring): the flush events push the watermark past every real
    session's close so append mode emits them all; the flush sessions
    themselves stay open in state and never emit.  The flush file is
    written last (FileStreamSource replays oldest-mtime first), so the
    watermark cannot jump ahead and drop real data."""
    import time as _time

    from deepie_spark.streaming.sessions import session_metrics

    src = spark.read.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = str(tmp_path / "sess_src")
    src.repartition(4).write.mode("overwrite").parquet(d)
    _time.sleep(1.2)  # flush file must carry a strictly later mtime
    flush = (
        src.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            F.to_timestamp(F.lit("2024-06-01 00:00:00")).alias("ts"),
            "user_id",
            F.lit("flush").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    flush.coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        session_metrics(stream, gap="30 minutes", watermark="35 days")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.sql("select * from sessions_stream").collect()
    }
    cutoff = F.to_timestamp(F.lit("2024-03-01 00:00:00"))
    want = {
        tuple(r)
        for r in session_metrics(
            spark.read.parquet(d), gap="30 minutes"
        ).filter(F.col("first_ts") < cutoff).collect()
    }
    assert got == want
    assert len(got) > 0
    # the flush sessions are still open — none may have been emitted
    assert all(r[4].year < 2024 or r[4].month < 6 for r in got)


def test_stream_dedup_suppresses_redelivery_matches_batch(
    spark, events_dir, tmp_path
):
    """At-least-once simulation: every file delivered TWICE, one file
    per micro-batch, so each duplicate arrives in a different batch —
    the suppression must come from keyed state, not batch-local
    distinct.  With a span-covering watermark the drained stream equals
    the batch dropDuplicates twin exactly."""
    from deepie_spark.streaming.dedup import dedup_events

    redeliver = str(tmp_path / "redelivered")
    os.makedirs(redeliver)
    n = 0
    for f in sorted(os.listdir(events_dir)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(events_dir, f),
                        os.path.join(redeliver, f"a_{f}"))
            shutil.copy(os.path.join(events_dir, f),
                        os.path.join(redeliver, f"b_{f}"))
            n += 1
    assert n >= 2

    batch = spark.read.parquet(redeliver)
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(redeliver)
    )
    q = (
        dedup_events(stream, keys=("event_id",), watermark="90 days")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select event_id, ts, user_id, event_type from dedup_stream"
    ).collect()
    want = dedup_events(batch, keys=("event_id",)).select(
        "event_id", "ts", "user_id", "event_type"
    ).collect()
    assert len(got) == len(want) == batch.count() // 2
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
