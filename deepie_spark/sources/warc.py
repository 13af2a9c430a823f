"""WARC-lite source: Common-Crawl-style record files → pages rows.

A simplified WARC shape (real WARC adds more headers; the parsing
strategy is identical): each record is

    WARC/1.0
    WARC-Target-URI: <url>
    WARC-Date: <iso timestamp>
    Content-Length: <n chars>

    <payload (html), exactly n characters>

Distributed read: ``spark.read.text`` with the record marker as the
line separator splits shards into one row per record WITHOUT any
driver-side pre-parse — each executor parses only its blocks; header
fields come out with ``regexp_extract`` and the payload is cut to
exactly ``Content-Length`` characters (so trailing record framing never
leaks into the html, and extraction stays byte-identical).  Everything
is a column expression; the scan parallelizes per shard/split like any
text source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "WARC/1.0"


def write_warc_lite(
    records: list[tuple[str, str, str]], out_dir: str, shards: int = 4
) -> list[str]:
    """Driver-side shard writer (fixture generation): records are
    (url, iso_ts, html) tuples, striped across ``shards`` files.

    Payloads must not contain the record marker (``WARC/1.0``): the
    reader splits shards on it, so a marker inside a payload would cut
    that record mid-body and drop the headerless remainder silently.
    Real WARC frames by Content-Length instead; this lite format trades
    that for a splittable lineSep scan, so the writer rejects the
    ambiguity up front rather than producing corrupt shards."""
    for url, _ts, html in records:
        if MARKER in html:
            raise ValueError(
                f"payload for {url!r} contains the record marker"
                f" {MARKER!r}; warc-lite cannot frame it"
            )
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{i:04d}.warc") for i in range(shards)
    ]
    files = [open(p, "w", encoding="utf-8") for p in paths]
    try:
        for i, (url, ts, html) in enumerate(records):
            f = files[i % shards]
            f.write(
                f"{MARKER}\n"
                f"WARC-Target-URI: {url}\n"
                f"WARC-Date: {ts}\n"
                f"Content-Length: {len(html)}\n"
                f"\n{html}\n"
            )
    finally:
        for f in files:
            f.close()
    return paths


def read_warc_lite(spark: SparkSession, path: str) -> DataFrame:
    """WARC-lite shards → (url, warc_ts, html binary)."""
    raw = spark.read.option("lineSep", MARKER).text(path)
    rec = F.col("value")
    # try_* variants: one malformed/headerless record (or stray preamble
    # text before the first marker) must yield a droppable null row, not
    # kill the scan — Spark 4 runs ANSI mode by default, where plain
    # to_timestamp('')/cast throw
    parsed = raw.filter(F.length(F.trim(rec)) > 0).select(
        F.regexp_extract(rec, r"WARC-Target-URI: (\S+)", 1).alias("url"),
        F.try_to_timestamp(
            F.regexp_extract(rec, r"WARC-Date: (\S+)", 1)
        ).alias("warc_ts"),
        F.regexp_extract(rec, r"Content-Length: (\d+)", 1)
        .try_cast("int")
        .alias("clen"),
        F.regexp_extract(rec, r"(?s)\n\n(.*)$", 1).alias("body"),
    )
    valid = parsed.filter(
        (F.length("url") > 0) & F.col("clen").isNotNull()
    )
    return valid.select(
        "url",
        "warc_ts",
        F.col("body").substr(F.lit(1), F.col("clen"))
        .cast("binary")
        .alias("html"),
    )
