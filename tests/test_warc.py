"""WARC-lite source tests: shard roundtrip, Content-Length-exact
payloads, and the byte-identical extraction invariant from WARC input.
"""

import os

import pytest
from pyspark.sql import functions as F

from deepie_spark.datagen.pages import pages_from_documents
from deepie_spark.plans.pipeline import extract_stage, extract_triples
from deepie_spark.sources.warc import read_warc_lite, write_warc_lite


@pytest.fixture(scope="module")
def warc_dir(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_from_documents(docs)
    rows = [
        (r["url"], r["warc_ts"].isoformat(), bytes(r["html"]).decode())
        for r in pages.collect()
    ]
    out = str(tmp_path_factory.mktemp("warc"))
    write_warc_lite(rows, out, shards=4)
    return out, pages


def test_roundtrip_urls_and_html(spark, warc_dir):
    out, pages = warc_dir
    got = read_warc_lite(spark, out)
    assert got.count() == pages.count()
    want_rows = {
        r["url"]: bytes(r["html"]) for r in pages.collect()
    }
    for r in got.collect():
        assert bytes(r["html"]) == want_rows[r["url"]], r["url"]
        assert r["warc_ts"] is not None


def test_payload_with_tricky_content(spark, tmp_path):
    """Payloads containing blank lines and the record marker string must
    survive intact — Content-Length cuts exactly."""
    html = "<p>line1\n\nline2 WARC/1.0 not a marker?</p>"
    # the marker only splits records when it starts a record; embedding
    # it mid-payload WOULD split on the naive lineSep read, so WARC-lite
    # documents the constraint: payloads must not contain the marker.
    safe = "<p>line1\n\nline2 with blank lines</p>"
    out = str(tmp_path / "warc2")
    write_warc_lite(
        [("https://a", "2024-01-01T00:00:00", safe)], out, shards=1
    )
    got = read_warc_lite(spark, out).collect()
    assert len(got) == 1
    assert bytes(got[0]["html"]).decode() == safe

    # the writer must refuse the ambiguous payload instead of silently
    # producing a shard the reader would truncate mid-body
    with pytest.raises(ValueError, match="marker"):
        write_warc_lite(
            [("https://b", "2024-01-01T00:00:00", html)],
            str(tmp_path / "warc3"),
            shards=1,
        )


def test_malformed_records_do_not_kill_the_scan(spark, tmp_path):
    """One bad record (missing date / missing length / stray preamble)
    must degrade to a dropped or null-field row, never abort the job —
    Spark 4 ANSI mode would otherwise throw on the empty-string casts."""
    out = str(tmp_path / "warc_bad")
    os.makedirs(out)
    with open(os.path.join(out, "part-0000.warc"), "w") as f:
        f.write("stray preamble junk\n")
        f.write(
            "WARC/1.0\nWARC-Target-URI: https://good\n"
            "WARC-Date: 2024-01-01T00:00:00\nContent-Length: 6\n\n<p>ok</p>\n"
        )
        f.write(
            "WARC/1.0\nWARC-Target-URI: https://nodate\n"
            "Content-Length: 3\n\nabc\n"
        )
        f.write(
            "WARC/1.0\nWARC-Target-URI: https://nolen\n"
            "WARC-Date: 2024-01-01T00:00:00\n\npayload\n"
        )
    got = {r["url"]: r for r in read_warc_lite(spark, out).collect()}
    assert set(got) == {"https://good", "https://nodate"}
    assert bytes(got["https://good"]["html"]) == b"<p>ok<"  # clen cut
    assert got["https://nodate"]["warc_ts"] is None


def test_extraction_from_warc_is_byte_identical(spark, warc_dir, sf_dir):
    out, _ = warc_dir
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    golden = {
        r["url"]: r["text"]
        for r in pages_from_documents(docs).select("url", "text").collect()
    }
    pages = read_warc_lite(spark, out)
    extracted = extract_stage(pages).select("url", "text").collect()
    assert len(extracted) == len(golden)
    for r in extracted:
        assert r["text"] == golden[r["url"]], r["url"]


def test_full_pipeline_from_warc(spark, warc_dir, sf_dir):
    """WARC shards → triples equals the parquet-pages pipeline."""
    out, pages = warc_dir
    from_warc = extract_triples(spark, read_warc_lite(spark, out))
    from_parquet = extract_triples(spark, pages)
    cols = ["subj", "pred", "obj", "url", "pos1", "pos2"]
    a, b = from_warc.select(cols), from_parquet.select(cols)
    assert a.exceptAll(b).isEmpty()
    assert b.exceptAll(a).isEmpty()
