"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns plus typed metadata —
the schema a 100 TB multimodal training pipeline uses so Spark never
interprets media bytes in the JVM. Decode / feature-extraction run as
Arrow-batched ``mapInPandas`` so whole payload batches reach Python
without per-row overhead.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode step is stubbed: ``decode_image`` raises NotImplementedError
unless a decoder is importable, and ``extract_media_features`` computes
deterministic byte-level features (real plumbing, fake vision). The Spark
side — schema, batching, partitioning, UDF signatures — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


def attach_media_payload(
    df: DataFrame,
    bytes_col: str,
    id_col: str,
    media_type: str = "image/png",
    source_col: str | None = None,
) -> DataFrame:
    """Normalize any (id, binary) pair into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.col(bytes_col).cast("binary")).cast("long").alias("n_bytes"),
        (F.col(source_col) if source_col else F.lit("unknown")).alias("source"),
    )


def decode_image(payload: bytes):
    """Decode an image payload → (height, width, channels) array.

    STUB: no imaging library ships in this container. The import gate
    keeps the pipeline importable; wire PIL/cv2 here on a real cluster.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not available in this "
            "environment; extract_media_features uses byte-level features"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("head_hash", T.LongType()),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType())),
    ]
)


def extract_media_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over payload batches.

    Features are deterministic byte-level stands-in for a vision encoder:
    byte histogram entropy, a rolling head hash, and a 16-dim normalized
    byte-histogram "embedding". Swap the inner function for a real encoder
    without touching the Spark plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                if n:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    hist = np.bincount(arr, minlength=256).astype(np.float64)
                    p = hist / n
                    nz = p[p > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    head = 0
                    for x in b[:64]:
                        head = (head * 31 + x) % 1_000_000_007
                    vec16 = hist.reshape(16, 16).sum(axis=1)
                    denom = float(np.linalg.norm(vec16)) or 1.0
                    feat = (vec16 / denom).tolist()
                else:
                    entropy, head, feat = 0.0, 0, [0.0] * 16
                rows.append((media_id, n, entropy, head, feat))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "byte_entropy", "head_hash", "feature_vec"],
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: emit (media_id, frame_idx, frame_payload)
    rows by slicing the payload — the partitioning/explode shape of real
    video frame sampling with a byte-slice stand-in for the codec."""
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.col("n_bytes") / every_n_bytes).cast("int")),
    )
    exploded = media.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
    return exploded.select(
        "media_id",
        "frame_idx",
        F.expr(
            f"substring(payload, frame_idx * {every_n_bytes} + 1, {every_n_bytes})"
        ).alias("frame_payload"),
    )
