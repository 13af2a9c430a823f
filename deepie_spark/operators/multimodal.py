"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs, exactly
like the north-rule ``html binary`` column.  The decode/feature kernels
are *stubbed* (no image/audio libs in this container — clearly marked
below); the Spark-side plumbing — schema, partition sizing, Arrow UDF
signatures, batch shapes — is real and tested:

* media rows are kept **narrow on the scan side** (metadata only) until
  the decode stage, so Catalyst prunes the heavy binary column from any
  plan that doesn't touch it;
* decode runs in ``mapInPandas`` with a *byte budget* per emitted batch —
  media batches are size-bound, not row-bound (a row-bound Arrow batch of
  4K-video rows would OOM the worker);
* extracted features come back as fixed-length float arrays, the same
  contract the similarity operators consume.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


try:  # import-gated real decoder (round-3 verdict item 6): production
    # containers with Pillow get real pixel features with NO code change;
    # this container has no PIL, so tests exercise the stand-in path.
    # Detection happens at module import — NOT inside the UDF — so the
    # mapInPandas closure ships a plain bool, no per-task import retry.
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except Exception:  # pragma: no cover - container-dependent
    _PILImage = None
    HAVE_PIL = False


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload to an RGB uint8 array (H, W, 3).

    Real path (Pillow, when importable); otherwise raises so accidental
    production use without a decoder is loud — callers that can accept a
    stand-in use :func:`best_image_featurizer` instead."""
    if not HAVE_PIL:
        raise NotImplementedError("image decoding requires PIL/opencv")
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode → fixed-dim features: per-channel mean/std (6) + a
    10-bin luminance histogram = 16 floats, deterministic in the pixels.
    Same output contract (FEATURE_DIM float32, L1-ish normalized
    histogram tail) as the byte-histogram stand-in."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    px = decode_image(payload).astype(np.float64)
    mean = px.mean(axis=(0, 1)) / 255.0
    std = px.std(axis=(0, 1)) / 255.0
    lum = px @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=dim - 6, range=(0.0, 255.0))[0]
    hist = hist / max(hist.sum(), 1)
    return np.concatenate([mean, std, hist]).astype(np.float32)[:dim]


def best_image_featurizer():
    """The decode→feature kernel for image payloads: real pixels when a
    decoder is importable, byte-histogram stand-in otherwise.  Resolved
    once at plan-build time (a bool, not an import, crosses into the
    UDF closure)."""
    return image_features if HAVE_PIL else _fake_features


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode→embed: byte histogram moments.

    Pure function of the payload bytes → stable across runs/partitions,
    which is what the plumbing tests need."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_media_features(
    media: DataFrame,
    batch_bytes: int = 64 << 20,
    featurizer=None,
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads.

    Iterator-form ``mapInPandas``: incoming Arrow batches are re-chunked
    so no emitted pandas frame holds more than ``batch_bytes`` of
    payload — the batch shape contract for media pipelines.

    ``featurizer`` defaults to the deterministic byte-histogram stand-in
    (what the gated oracle query pins); pass
    ``best_image_featurizer()`` for real pixel features on containers
    that ship Pillow."""
    kernel = featurizer or _fake_features

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            start = 0
            acc = 0
            for i, payload in enumerate(pdf["payload"]):
                acc += len(payload) if payload is not None else 0
                if acc >= batch_bytes:
                    yield _featurize(pdf.iloc[start : i + 1])
                    start, acc = i + 1, 0
            if start < len(pdf):
                yield _featurize(pdf.iloc[start:])

    def _featurize(pdf: pd.DataFrame) -> pd.DataFrame:
        feats = [kernel(p) for p in pdf["payload"]]
        return pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [
                    len(p) if p is not None else 0 for p in pdf["payload"]
                ],
                "features": feats,
            }
        )

    from deepie_spark.session import ensure_parallelism

    narrow = ensure_parallelism(media.select("media_id", "kind", "payload"))
    return narrow.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over opaque media payloads: ``n_frames`` evenly
    spaced byte windows per payload — the video-pipeline stage shape
    (decode→frame-sample) with the codec-specific seek replaced by a
    deterministic byte stride (a real container would seek keyframes;
    the Spark-side contract — per-frame rows, bounded width, stable
    ids/hashes — is identical).

    Entirely JVM expressions (substring/md5 on binary): map-only plan,
    no Python worker, no shuffle — and a DuckDB twin reproduces the
    frame hashes bit-exactly, which gates the slicing arithmetic."""
    ln = F.length(F.col(payload_col)).cast("long")
    stride = F.greatest(
        F.lit(1).cast("long"),
        F.floor((ln - frame_bytes) / F.lit(n_frames - 1)).cast("long"),
    )
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("long").alias("frame_idx"),
            F.substring(
                F.col(payload_col),
                (i * stride + 1).cast("int"),
                frame_bytes,
            ).alias("frame"),
        ),
    )
    return (
        media.select(F.col(id_col).alias("media_id"), F.explode(frames).alias("f"))
        .select(
            "media_id",
            F.col("f.frame_idx").alias("frame_idx"),
            F.md5(F.col("f.frame")).alias("frame_md5"),
            F.length(F.col("f.frame")).cast("long").alias("n_bytes"),
        )
    )


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents (no external
    data): payload = utf-8 text bytes standing in for encoded media."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
