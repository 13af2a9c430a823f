"""Checkpoint/resume and per-partition lineage metrics (north rule).

The reference's only "resume" is its pickle intermediate
(rnn_process_onlyExtra.py:826 / rnnRE.py:691).  At 10^12 documents a rerun
must skip completed work instead: the pipeline processes deterministic
``part_id`` buckets (hash of url, plans.pipeline.part_id_col), writes
triples partitioned by ``part_id``, and appends one manifest row per
completed bucket.  Resume = anti-join of the bucket universe against the
``_done`` manifest — only pending buckets are scanned (partition pruning
on the source side makes the skip free).

On Iceberg the manifest role is played by snapshot metadata; parquet +
a ``_done`` manifest directory reproduces the semantics portably here.

``lineage_metrics`` rows (FIXTURES.md §5) double as the pipeline's
observability surface: row counts per stage per bucket.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "part_id int, stage string, n_pages long, n_mentions long,"
    " n_pairs long, n_triples long, t_start double, t_end double,"
    " status string"
)


def done_part_ids(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """part_ids recorded as done; empty DataFrame when no manifest yet."""
    try:
        m = spark.read.parquet(manifest_dir)
    except Exception:
        return spark.createDataFrame([], "part_id int")
    return (
        m.filter(F.col("status") == "done").select("part_id").distinct()
    )


def pending(df: DataFrame, done: DataFrame) -> DataFrame:
    """Anti-join: rows of buckets not yet completed."""
    return df.join(F.broadcast(done), "part_id", "left_anti")


def _part_files(out_dir: str) -> set[str]:
    return set(glob.glob(os.path.join(out_dir, "part_id=*", "*.parquet")))


def _footer_counts(files: set[str]) -> dict[int, int]:
    """Exact per-bucket row counts from parquet footer metadata only —
    no data pages are read and the triples plan is never re-executed.
    On Iceberg the same numbers come from the snapshot's manifest
    statistics; on a remote store this listing is a metadata-service
    call, the same O(files) cost Iceberg's commit itself pays."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for f in files:
        pid = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        counts[pid] = counts.get(pid, 0) + pq.ParquetFile(f).metadata.num_rows
    return counts


def write_triples_with_manifest(
    triples: DataFrame,
    out_dir: str,
    manifest_dir: str,
    stage: str = "triples",
) -> dict:
    """Materialize triples partitioned by part_id + append manifest rows.

    One shuffle (repartition by part_id) so each output partition is a
    single task's write — at scale this is also where AQE coalescing and
    a sort-within-partitions for downstream locality would slot in.

    The manifest counts come from the footers of the files this call
    wrote (before/after file-set diff, so concurrent history in an
    append dir is excluded): the triples plan — the most expensive job
    in the system — executes exactly once.
    """
    spark = triples.sparkSession
    t0 = time.time()
    before = _part_files(out_dir)
    (
        triples.repartition("part_id")
        .sortWithinPartitions("subj", "pred", "obj")
        .write.mode("append")
        .partitionBy("part_id")
        .parquet(out_dir)
    )
    counts = _footer_counts(_part_files(out_dir) - before)
    t1 = time.time()
    rows = [
        (pid, stage, None, None, None, n, t0, t1, "done")
        for pid, n in sorted(counts.items())
    ]
    spark.createDataFrame(rows, MANIFEST_SCHEMA).write.mode("append").parquet(
        manifest_dir
    )
    return {"parts": len(rows), "n_triples": sum(counts.values())}


def resume_run(
    spark: SparkSession,
    pages_with_part: DataFrame,
    out_dir: str,
    manifest_dir: str,
    pipeline_fn,
) -> dict:
    """Run ``pipeline_fn`` only over buckets absent from the manifest."""
    done = done_part_ids(spark, manifest_dir)
    todo = pending(pages_with_part, done)
    if todo.isEmpty():
        return {"parts": 0, "n_triples": 0, "skipped": True}
    triples = pipeline_fn(todo)
    out = write_triples_with_manifest(triples, out_dir, manifest_dir)
    out["skipped"] = False
    return out
