"""Multimodal plumbing tests: schema, byte-budget batch shaping,
deterministic features, narrow-scan pruning, stubbed decode.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_features,
    decode_image,
    extract_media_features,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return synthetic_media(docs).cache()


def test_decode_stub_is_loud():
    from deepie_spark.operators.multimodal import HAVE_PIL

    if HAVE_PIL:
        pytest.skip("real decoder available — loud-stub contract n/a")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_features_deterministic_and_normalized():
    f1 = _fake_features(b"hello world")
    f2 = _fake_features(b"hello world")
    assert np.array_equal(f1, f2)
    assert f1.shape == (FEATURE_DIM,)
    assert f1.sum() == pytest.approx(1.0, abs=1e-5)
    assert np.array_equal(_fake_features(b""), np.zeros(FEATURE_DIM, np.float32))


def test_media_schema_and_kinds(media):
    assert set(media.columns) == {
        "media_id", "kind", "mime", "width", "height", "duration_ms", "payload",
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_roundtrip(media, spark):
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    # cross-check a sample against the driver-side kernel on raw payloads
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.limit(20).collect()
    }
    by_id = {r["media_id"]: r for r in rows}
    for mid, payload in payloads.items():
        got = np.array(by_id[mid]["features"], dtype=np.float32)
        want = _fake_features(payload)
        assert np.allclose(got, want, atol=1e-6)
        assert by_id[mid]["n_bytes"] == len(payload)


def test_byte_budget_rechunking_preserves_results(media):
    """A tiny byte budget forces many small emitted batches; results must
    be identical to the single-batch path (the media batch contract)."""
    big = {
        r["media_id"]: (r["n_bytes"], tuple(r["features"]))
        for r in extract_media_features(media, batch_bytes=64 << 20).collect()
    }
    small = {
        r["media_id"]: (r["n_bytes"], tuple(r["features"]))
        for r in extract_media_features(media, batch_bytes=2048).collect()
    }
    assert big == small


def test_metadata_only_plan_prunes_payload(spark, sf_dir):
    """Scanning metadata must not materialize the heavy binary column:
    on an uncached media frame, Catalyst prunes the payload projection
    (and its source text column) out of the parquet scan entirely."""
    # distinct source subtree (filter) so the module's cached media plan
    # is not substituted by the cache manager — we want the parquet scan
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") >= 0)
    meta = synthetic_media(docs).select("media_id", "kind", "duration_ms")
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
    assert "encode(" not in plan  # the payload-producing expression is gone
    executed = meta._jdf.queryExecution().executedPlan().toString()
    # the parquet ReadSchema carries only the three source columns needed
    assert "text" not in executed.split("ReadSchema")[-1]


def test_features_feed_similarity_ops(media, spark):
    """The features contract: fixed-length float arrays consumable by the
    similarity operators."""
    from deepie_spark.operators.similarity import brute_force_topk

    feats = extract_media_features(media).limit(30).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    feats = feats.cache()
    q = feats.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = brute_force_topk(feats, q, k=3)
    assert got.count() == 6


def test_best_featurizer_contract_whichever_path(spark):
    """Runs the REAL decode path when Pillow is importable, the
    deterministic stand-in otherwise — either way the FEATURES_SCHEMA
    contract holds: FEATURE_DIM float32 features, exact n_bytes, one
    output row per media row, stable across reruns."""
    from deepie_spark.operators.multimodal import (
        FEATURES_SCHEMA,
        HAVE_PIL,
        MEDIA_SCHEMA,
        best_image_featurizer,
        image_features,
    )

    kernel = best_image_featurizer()
    assert kernel is (image_features if HAVE_PIL else _fake_features)
    if HAVE_PIL:
        import io

        from PIL import Image

        def payload(i):
            im = Image.new("RGB", (8, 8), (i * 17 % 256, 64, 200))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue()

    else:

        def payload(i):
            return bytes([i % 251]) * (100 + i)

    rows = [
        (i, "image", "image/png", 8, 8, None, payload(i)) for i in range(20)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_media_features(media, featurizer=kernel)
    assert out.schema == FEATURES_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[i]
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] == len(payload(i))
        assert all(isinstance(x, float) for x in r["features"])
    again = {r["media_id"]: r for r in extract_media_features(
        media, featurizer=kernel).collect()}
    assert all(got[i]["features"] == again[i]["features"] for i in got)


def test_sample_frames_plumbing(spark):
    """Per-frame rows with stable hashes, reconstruction of slicing
    arithmetic, and a map-only JVM plan (no Python workers)."""
    import hashlib

    from deepie_spark.operators.multimodal import sample_frames

    rows = [(1, b"0123456789abcdefghijklmnopqrstuv"), (2, b"short")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(media, n_frames=4, frame_bytes=16)
    got = {(r["media_id"], r["frame_idx"]): r for r in out.collect()}
    assert len(got) == 8
    # doc 1: len 32, stride max(1,(32-16)//3)=5 → offsets 0,5,10,15
    payload = rows[0][1]
    for i, off in enumerate((0, 5, 10, 15)):
        frame = payload[off : off + 16]
        assert got[(1, i)]["frame_md5"] == hashlib.md5(frame).hexdigest()
        assert got[(1, i)]["n_bytes"] == len(frame)
    # doc 2: len 5 < 16 → stride 1, overlapping short frames
    for i in range(4):
        frame = rows[1][1][i : i + 16]
        assert got[(2, i)]["frame_md5"] == hashlib.md5(frame).hexdigest()
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final
    assert "EvalPython" not in plan
