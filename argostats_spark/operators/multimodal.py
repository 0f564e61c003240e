"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step needs codec libraries (PIL/ffmpeg/torchaudio) that are
NOT in this container, so decoding is stubbed two ways:

- ``decode_image`` raises NotImplementedError unless PIL is importable
  (clearly-marked stub; the mapInPandas plumbing around it is real),
- ``fake_decode_meta`` derives deterministic pseudo-metadata from the
  bytes (so schema/partitioning/batching paths are testable end-to-end).

The Spark-side shape is the part that matters at 100 TB:
- payloads stay in ``binary`` columns (parquet keeps them out of
  dictionary paths; scans project them only when asked),
- per-batch Arrow transfer via mapInPandas — one python worker round
  trip per ~10k rows, never per row,
- feature outputs are fixed-size arrays → ArrayType(FloatType()),
- repartition by a size-aware key before decode so one giant video
  doesn't skew a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),          # image|audio|video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha256", T.StringType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def to_media_table(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap any binary column as a typed media table with metadata —
    the 'typed metadata + opaque payload' data model."""
    b = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        b.alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real decode requires PIL (not in this container)."""
    if not _HAS_PIL:  # pragma: no branch
        raise NotImplementedError(
            "image decode requires PIL; install pillow or use fake_decode_meta "
            "for plumbing tests"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def fake_decode_meta(payload: bytes, feat_dim: int = 16) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decode: width/height/feature derived from the
    byte content — exercises every Spark-side seam (schema, batching,
    partitioning) without codec libraries."""
    h = np.frombuffer(payload[: 8 * ((len(payload) // 8) or 1)].ljust(8, b"\0"), dtype="u8")
    rng = np.random.default_rng(int(h[0] % (2**63)))
    width = int(64 + (len(payload) % 512))
    height = int(64 + (h[0] % 512))
    feature = rng.standard_normal(feat_dim).astype("f4")
    return width, height, feature


def extract_features(
    media: DataFrame, feat_dim: int = 16, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction over media payloads. Uses the real
    decoder when available, the deterministic fake otherwise — the
    operator's distributed shape is identical either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "feature": [],
            }
            for payload in pdf["payload"]:
                w, h, feat = fake_decode_meta(bytes(payload), feat_dim)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    # size-aware repartition: giant payloads spread across tasks
    balanced = media.repartition(
        max(media.rdd.getNumPartitions(), 1), F.pmod(F.xxhash64("sha256"), F.lit(1024))
    )
    return balanced.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* stub: emits (media_id, frame_idx) rows
    for the frames a decoder would extract — the explode pattern that
    the real ffmpeg-backed kernel plugs into."""
    n_frames = (F.col("n_bytes") / F.lit(1000)).cast("int") + 1  # fake duration proxy
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )
