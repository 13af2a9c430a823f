"""One-off probe: sustained-throughput sensitivity to corpus size and
file layout at local[32].  Not part of the bench contract — used to pick
bench.py's sustained-leg configuration with data instead of guesses.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pyspark.sql import functions as F

    from deepie_spark.datagen.pages import pages_from_documents
    from deepie_spark.plans.pipeline import extract_triples
    from deepie_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe", cores=cores, shuffle_partitions=cores)
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).repartition(cores)

    configs = [
        (120, 128),
        (120, 64),
        (120, 96),
        (120, 96),
    ]
    results = []
    for reps, files in configs:
        big = docs.crossJoin(
            spark.range(reps).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        tmp = tempfile.mkdtemp(prefix="probe_pages_")
        pages_dir = os.path.join(tmp, "pages.parquet")
        pages_from_documents(big).repartition(files).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        n = extract_triples(spark, pages).count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            extract_triples(spark, pages).count()
            dt = time.time() - t0
            best = min(best, dt)
            log(f"  reps={reps} files={files}: {dt:.2f}s")
        tps = n / best
        results.append((reps, files, n, best, tps))
        log(f"reps={reps} files={files}: {n} triples best {best:.2f}s"
            f" = {tps:,.0f}/s")
        shutil.rmtree(tmp, ignore_errors=True)
    log("== summary ==")
    for reps, files, n, best, tps in results:
        log(f"reps={reps:4d} files={files:4d}  {best:7.2f}s  {tps:12,.0f}/s")
    spark.stop()


if __name__ == "__main__":
    main()
