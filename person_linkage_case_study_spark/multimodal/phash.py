"""Perceptual image hashing + near-duplicate detection (late r12).

The image-side analog of the text dedup family (``dedup/minhash.py``):
a 64-bit DCT perceptual hash per image payload, then an EXACT-recall
banded self-join for hamming-distance near-dups — image dedup that
survives re-encoding (PNG vs BMP vs baseline-vs-progressive JPEG of the
same pixels hash identically or near-identically), brightness shifts,
and resampling, the transformations crawl pipelines actually see.

Spark-first shape: hashing is one Arrow-batched ``mapInPandas`` pass
over the payload column (the heavy work is the decoders already in
:mod:`.media`); candidate generation is a BANDED equi-join — split the
64 bits into ``max_distance + 1`` bands, join on (band index, band
value). By pigeonhole, two hashes within hamming distance d ≤
``max_distance`` differ in at most d bands, so at least one of the
d + 1 bands matches exactly: recall is 1.0 BY CONSTRUCTION, not
probabilistic (unlike MinHash banding, whose S-curve only approaches
it). The hamming filter itself is JVM-side ``bit_count(a ^ b)`` —
whole-stage-codegen, no UDF. Pair volume is corpus-linear in the band
buckets, never all-pairs; near-identical corpora (e.g. a million copies
of one logo) concentrate in one bucket, which is the correct output
size for that input, not a skew artifact.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media import _PNG_SIG, parse_bmp, parse_gif, parse_jpeg, parse_png

#: downsample target and retained low-frequency block (the classic
#: pHash geometry: 32x32 luma -> 2D DCT -> 8x8 low block -> median bits)
_RESAMPLE = 32
_LOWFREQ = 8


def _dct_basis_n(n: int):
    """n-point DCT-II basis (the 32-point sibling of media._dct_basis's
    cached 8x8): A[u, x] = sqrt(2/n)·c(u)·cos((2x+1)uπ/2n)."""
    import numpy as np

    u = np.arange(n).reshape(n, 1)
    x = np.arange(n).reshape(1, n)
    a = np.sqrt(2.0 / n) * np.cos((2 * x + 1) * u * np.pi / (2 * n))
    a[0] /= np.sqrt(2.0)
    return a


def _decode_gray(payload: bytes):
    """Decode any pixel-tier image format to a float64 luma plane, or
    None for metadata-only / corrupt payloads. 16-bit PNG scales to the
    8-bit range so the same pixels hash identically across depths."""
    import numpy as np

    b = bytes(payload)
    try:
        if b[:8] == _PNG_SIG:
            px = parse_png(b)["pixels"]
            if px is not None and px.dtype == np.uint16:
                px = (px >> 8).astype(np.uint8)
        elif b[:3] == b"\xff\xd8\xff":
            px = parse_jpeg(b)["pixels"]
        elif b[:2] == b"BM":
            px = parse_bmp(b)["pixels"]
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            px = parse_gif(b)["pixels"]
        else:
            px = None
    except Exception:
        px = None  # crawl-garbage contract
    if px is None:
        return None
    f = px.astype("float64")
    if f.ndim == 2:
        return f
    if f.shape[2] == 1:
        return f[..., 0]
    # RGB(A): ITU-R 601 luma; alpha is not signal
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def phash64(payload: bytes):
    """64-bit perceptual hash of an image payload, or None when no
    pixel tier decodes it. Classic DCT pHash: nearest-sample the luma
    plane to 32x32 (deterministic — no float resampling kernel to
    disagree about), 2D DCT-II, keep the 8x8 low-frequency block,
    threshold each coefficient at the block's median. Bit i (row-major,
    MSB first) is 1 when coefficient i exceeds the median — a constant
    shift in brightness moves only the DC coefficient, so near-identical
    images land within a few bits."""
    import numpy as np

    gray = _decode_gray(payload)
    if gray is None or gray.size == 0:
        return None
    h, w = gray.shape
    r = (np.arange(_RESAMPLE) * h) // _RESAMPLE
    c = (np.arange(_RESAMPLE) * w) // _RESAMPLE
    g = gray[np.ix_(r, c)]
    a = _dct_basis_n(_RESAMPLE)
    low = (a @ g @ a.T)[:_LOWFREQ, :_LOWFREQ]
    med = float(np.median(low))
    bits = (low > med).reshape(-1)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out  # signed LongType


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def attach_phash(media: DataFrame) -> DataFrame:
    """mapInPandas pHash over payload batches → (media_id, phash), NULL
    for undecodable rows (the standard crawl-garbage contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = [
                phash64(bytes(p)) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    return media.select("media_id", "payload").mapInPandas(
        batches, PHASH_SCHEMA
    )


def phash_near_dups(
    hashes: DataFrame,
    *,
    max_distance: int = 10,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Hamming near-dup pairs over a (id, 64-bit hash) frame with EXACT
    recall: ``max_distance + 1`` bands partition the 64 bits, so any
    pair within distance d ≤ max_distance shares at least one whole
    band (pigeonhole) and surfaces in the banded equi-join; the
    JVM-side ``bit_count(xor)`` then filters to true distance. Returns
    ``(id_a, id_b, distance)`` with id_a < id_b, each pair once.

    Plan shape at 100 TB: one projection builds (band_idx, band_key)
    rows (64-bit shifts, no UDF), the self-join shuffles on the compound
    band key — corpus-linear candidate volume — and the distance filter
    runs inside codegen before the distinct."""
    if not 0 <= max_distance < 64:
        raise ValueError("max_distance must be in [0, 64)")
    nbands = max_distance + 1
    base, extra = divmod(64, nbands)
    bands = []
    offset = 0
    for i in range(nbands):
        width = base + (1 if i < extra else 0)
        mask = (1 << width) - 1
        if mask >= 1 << 63:
            mask -= 1 << 64  # 64-bit all-ones is -1 as a signed Long
        bands.append(
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(F.col(hash_col), offset)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
        )
        offset += width
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(F.array(*bands)).alias("band"),
    )
    left = h.select("id", "h", "band")
    right = (
        h.select(
            F.col("id").alias("id_b"),
            F.col("h").alias("h_b"),
            F.col("band").alias("band_b"),
        )
    )
    pairs = (
        left.join(
            right,
            (F.col("band") == F.col("band_b")) & (F.col("id") < F.col("id_b")),
        )
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.bit_count(
                F.col("h").bitwiseXOR(F.col("h_b"))
            ).alias("distance"),
        )
        .where(F.col("distance") <= max_distance)
        .distinct()
    )
    return pairs
