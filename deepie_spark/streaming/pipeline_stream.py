"""Continuous-ingest form of the flagship pipeline.

Pages arriving as a file stream (the Common-Crawl drop-folder pattern)
flow through the SAME batch plan via ``foreachBatch``: each micro-batch
runs pages → extract → mentions → pairs → classify → triples and lands
part_id-partitioned parquet plus lineage manifest rows — so a streaming
deployment shares every operator, test, and plan property with the
batch path, and the manifest doubles as exactly-once bookkeeping at the
bucket level.  ``Trigger.AvailableNow`` turns the same query into a
catch-up batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deepie_spark.plans.pipeline import extract_triples
from deepie_spark.plans.resume import write_triples_with_manifest


def stream_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    manifest_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the streaming pages→triples query; returns the handle."""
    if schema is None:
        schema = spark.read.parquet(pages_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = extract_triples(spark, batch_df)
        write_triples_with_manifest(
            triples, out_dir, manifest_dir, stage=f"stream_batch_{batch_id}"
        )

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
