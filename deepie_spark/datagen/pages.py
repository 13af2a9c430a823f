"""Deterministic synthesis of the north-rule ``pages`` table.

``input_hint`` fixes the engine's source shape:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — a Common-Crawl-style web-page table.  In production this
is an Iceberg table partitioned by ``bucket(url_host)`` × ``days(warc_ts)``;
here we synthesize it deterministically from the driver-provided
``documents`` parquet (TESTDATA.md) with **no external data**:

* ``url``      — ``https://{source}.example.com/doc/{doc_id}``
* ``warc_ts``  — 2024-01-01T00:00:00Z + doc_id seconds
* ``text``     — the golden extracted text (byte-identical target for
  the extraction stage, per-row invariant of the north rule)
* ``html``     — a deterministic minimal HTML wrapping of ``text``
* ``lang``     — carried through

Everything is a column expression — no UDF, no nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: html template pieces; extraction inverts this wrapping exactly.
_PRE = '<html><head><meta charset="utf-8"><title>'
_MID = "</title></head><body><article><p>"
_POST = "</p></article></body></html>"


def html_escape_col(c):
    """Minimal deterministic HTML escaping (&, <, > — order matters)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return c


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages table."""
    title = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit(_PRE),
        title,
        F.lit(_MID),
        html_escape_col(F.col("text")),
        F.lit(_POST),
    )
    return documents.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
