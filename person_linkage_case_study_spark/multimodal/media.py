"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns plus typed metadata —
the schema a 100 TB multimodal training pipeline uses so Spark never
interprets media bytes in the JVM. Decode / feature-extraction run as
Arrow-batched ``mapInPandas`` so whole payload batches reach Python
without per-row overhead.

Image decode (r9): PNG is decoded for REAL in pure Python — signature +
IHDR parse, zlib IDAT inflate (stdlib), scanline de-filtering (all five
PNG filter types) to a numpy pixel array — and JPEG headers are parsed
for dimensions/components (entropy-coded pixel decode stays behind the
PIL gate: a DCT decoder is out of scope, and the metadata is what the
curation pipeline consumes). ``encode_png`` is the matching writer so
fixtures and round-trip tests need no imaging library. Audio gets the
same treatment (r9): WAV/PCM16 is decoded for REAL — RIFF chunk walk,
fmt parse, int16 sample array with RMS/peak — via :func:`parse_wav`,
with :func:`encode_wav` as the matching writer. Heavier codecs
(ffmpeg/torchaudio, JPEG pixels, compressed audio) still gate on an
import-try; ``extract_media_features`` computes deterministic byte-level
features wherever a codec is unavailable.

r10: indexed (color type 3 / PLTE) PNGs decode to RGB — the last common
PNG tier a crawl actually contains; the Sub scanline filter reconstructs
via one vectorized prefix sum instead of a per-byte loop; and every
per-row decode in the Spark kernels catches Exception, not just
ValueError, so payloads with valid signatures and corrupt innards
(zlib.error, struct.error — advisor-probed) NULL out instead of killing
the stage.
"""

from __future__ import annotations

import struct
import zlib
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels, color_type: int | None = None, palette=None) -> bytes:
    """Minimal, spec-correct PNG writer for 8-bit images (the fixture /
    round-trip counterpart of :func:`parse_png` — no imaging library in
    this container). ``pixels`` is a uint8 numpy array: (h, w) gray or
    (h, w, c) with c ∈ {1, 2, 3, 4}. Rows are filtered with a rotating
    None/Sub/Up/Average/Paeth schedule (all five spec filters, r10 — so
    every decoder path is exercised by round-trip tests, not just
    filter-0 passthrough); encoding-side predictors read RAW neighbor
    values, which equal the decoder's reconstructed ones, so the whole
    schedule is vectorizable and lossless.

    ``palette`` (r10): an (n ≤ 256, 3) uint8 RGB array makes this a
    color-type-3 (indexed) writer — ``pixels`` is then the (h, w) uint8
    INDEX array and a PLTE chunk is emitted before IDAT (PNG spec 11.2.3
    requires PLTE ahead of the image data for type 3)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError("palette must be (n<=256, 3) uint8 RGB")
        if c != 1:
            raise ValueError("indexed PNG wants a single index sample per pixel")
        if int(px.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        color_type = 3
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if color_type == 3 and palette is None:
        raise ValueError("color_type 3 requires a palette")
    if _PNG_CHANNELS[color_type] != c:
        raise ValueError(f"color_type {color_type} wants {_PNG_CHANNELS[color_type]} channels, got {c}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    flat = px.reshape(h, w * c).astype(np.int32)
    zeros = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        ft = y % 5  # 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth
        row = flat[y]
        left = np.concatenate((zeros[:c], row[:-c]))
        up = flat[y - 1] if y else zeros
        if ft == 1:
            filtered = (row - left) % 256
        elif ft == 2:
            filtered = (row - up) % 256
        elif ft == 3:
            filtered = (row - (left + up) // 2) % 256
        elif ft == 4:
            upleft = np.concatenate((zeros[:c], up[:-c]))
            pa = np.abs(up - upleft)
            pb = np.abs(left - upleft)
            pc = np.abs(left + up - 2 * upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            filtered = (row - pred) % 256
        else:
            filtered = row
        raw.append(ft)
        raw.extend(filtered.astype(np.uint8).tobytes())
    plte = b"" if palette is None else chunk(b"PLTE", pal.tobytes())
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def parse_png(payload: bytes) -> dict:
    """Pure-Python PNG decode: IHDR metadata always; for 8-bit
    non-interlaced images also the full pixel array (zlib inflate + all
    five scanline filters per the PNG spec, 9.2) and its mean — including
    color type 3 (indexed, r10): index samples are de-filtered like any
    1-sample image and expanded through the PLTE lookup table to an RGB
    array, so ``channels`` reports 3 and ``pixel_mean`` averages the
    expanded RGB values. Returns ``{format, width, height, channels,
    bit_depth, pixels, pixel_mean}`` — ``pixels``/``pixel_mean`` are None
    when only metadata is decodable (16-bit, interlaced, palette sans
    PLTE); ``channels`` is then the IHDR samples-per-pixel count."""
    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("PNG IHDR truncated")
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS.get(color_type)
    meta = {
        "format": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": bit_depth,
        "pixels": None,
        "pixel_mean": None,
    }
    if (
        bit_depth != 8
        or interlace != 0
        or not idat
        or channels is None
        or (color_type == 3 and plte is None)
    ):
        return meta  # metadata-only tier
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    if len(raw) < height * (1 + stride):
        raise ValueError("PNG IDAT shorter than the scanline geometry")
    for y in range(height):
        ft = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        p += 1 + stride
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 1:  # Sub: recon[i] = line[i] + recon[i - channels] is a
            # per-channel prefix sum mod 256, so one np.cumsum reconstructs
            # the whole scanline (r10 — the per-byte loop it replaces ran
            # every third encoder row through Python; a 512×512 RGB
            # Sub-only image now decodes whole in 16 ms where the old
            # de-filter loop alone took 1.15 s — ~74×, SCALING.md). int64
            # cumsum cannot overflow below ~3.6e16 columns.
            rec = (
                np.cumsum(line.reshape(width, channels), axis=0, dtype=np.int64)
                % 256
            ).reshape(stride).astype(np.int32)
        elif ft in (3, 4):  # Average / Paeth: the predictor mixes the UP
            # neighbor with the reconstructed LEFT, which breaks the
            # prefix-sum form — sequential in PIXELS, but every channel
            # of a pixel vectorizes together (r10: width iterations, not
            # width × channels)
            ln = line.reshape(width, channels)
            pv = prev.reshape(width, channels)
            pvl = np.vstack(
                (np.zeros((1, channels), dtype=np.int32), pv[:-1])
            )  # up-left = previous row shifted one pixel right
            rc = np.zeros((width, channels), dtype=np.int32)
            a = np.zeros(channels, dtype=np.int32)  # reconstructed left
            for x in range(width):
                b = pv[x]
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    cd = pvl[x]
                    pa = np.abs(b - cd)
                    pb = np.abs(a - cd)
                    pc = np.abs(a + b - 2 * cd)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cd)
                    )
                a = (ln[x] + pred) % 256
                rc[x] = a
            rec = rc.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: 3 * (len(pal) // 3)].reshape(-1, 3)
        if not len(pal):
            raise ValueError("PNG PLTE chunk empty")
        if int(out.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        pixels = pal[out]  # (h, w, 3) RGB expansion
        meta["channels"] = 3
    else:
        pixels = out.reshape(height, width, channels)
    meta["pixels"] = pixels
    meta["pixel_mean"] = float(pixels.mean())
    return meta


_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_jpeg(payload: bytes) -> dict:
    """JPEG header parse: walk the marker segments to the first SOFn and
    read precision / dimensions / component count. Pixel decode (huffman
    + DCT) is deliberately NOT reimplemented — metadata is what the
    curation pipeline consumes; wire PIL for pixels on a real cluster."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (bad SOI)")
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _SOF_MARKERS:
            return {
                "format": "jpeg",
                "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                "channels": payload[i + 9],
                "bit_depth": payload[i + 4],
                "pixels": None,
                "pixel_mean": None,
            }
        if marker == 0xD9 or marker == 0xDA:  # EOI / start-of-scan
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        i += 2 + seglen
    raise ValueError("JPEG missing SOF header")


def decode_image(payload: bytes):
    """Decode an image payload.

    PNG decodes for REAL in pure Python (r9 — see :func:`parse_png`):
    returns the (h, w, c) uint8 numpy array for 8-bit non-interlaced
    images, including indexed/PLTE images expanded to RGB (r10). JPEG and
    anything else fall through to PIL when importable; otherwise
    NotImplementedError (a pure-Python huffman+DCT decoder is out of
    scope — JPEG *metadata* is available via :func:`parse_jpeg`).
    """
    if payload[:8] == _PNG_SIG:
        meta = parse_png(payload)
        if meta["pixels"] is not None:
            return meta["pixels"]
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG (or 16-bit/interlaced PNG) pixel decode "
            "requires PIL/pillow, not available in this environment; "
            "parse_png/parse_jpeg provide metadata and "
            "extract_media_features byte-level features"
        ) from e
    return Image.open(io.BytesIO(payload))


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ]
)


def extract_image_meta(media: DataFrame) -> DataFrame:
    """mapInPandas image decode over payload batches: PNG → full decode
    (dims + channels + true pixel mean), JPEG → header metadata, other /
    corrupt payloads → NULL columns (a 100 TB crawl always contains
    garbage bytes; a decode kernel that throws on them kills the stage).
    Same Arrow-batched shape as :func:`extract_media_features`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    if b[:8] == _PNG_SIG:
                        m = parse_png(b)
                    elif b[:3] == b"\xff\xd8\xff":
                        m = parse_jpeg(b)
                    else:
                        m = None
                except Exception:
                    # crawl-garbage contract: a valid signature with corrupt
                    # innards raises whatever the codec hit (zlib.error on a
                    # bad IDAT, struct.error on a truncated header — advisor
                    # probe, r10); ANY decode failure means NULL columns,
                    # never a thrown stage
                    m = None
                if m is None:
                    rows.append((media_id, None, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            media_id,
                            m["format"],
                            m["width"],
                            m["height"],
                            m["channels"],
                            m["bit_depth"],
                            m["pixel_mean"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height", "channels",
                    "bit_depth", "pixel_mean",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal, spec-correct RIFF/WAVE writer for PCM16 (the fixture /
    round-trip counterpart of :func:`parse_wav` — no audio library in
    this container). ``samples`` is an int16 numpy array: (n,) mono or
    (n, ch) interleaved on write."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()  # C-order == interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def parse_wav(payload: bytes) -> dict:
    """Pure-Python WAV decode: RIFF chunk walk (word-aligned per the
    spec — odd-length chunks carry a pad byte), fmt metadata always; for
    PCM16 also the decoded (n_frames, ch) int16 sample array and its
    RMS / peak (the stats an audio curation pipeline filters on).
    Returns ``{format, channels, sample_rate, bit_depth, n_frames,
    duration_sec, samples, rms, peak}`` — sample-tier fields are None
    for non-PCM16 encodings (float32, ADPCM, …), mirroring
    :func:`parse_png`'s metadata-only tier."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    audio_format = channels = sample_rate = bit_depth = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            audio_format, channels, sample_rate, _, _, bit_depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if audio_format is None:
        raise ValueError("WAV missing fmt chunk")
    meta = {
        "format": "wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "bit_depth": bit_depth,
        "n_frames": None,
        "duration_sec": None,
        "samples": None,
        "rms": None,
        "peak": None,
    }
    if data is None:
        return meta
    # degenerate fmt guards (r10, advisor probe): channels=0 / bit_depth=0
    # give frame_bytes=0 (division by zero at n_frames), sample_rate=0
    # divides by zero at duration — all legal-looking garbage a crawl
    # contains, all resolved to the metadata-only tier, never a throw
    frame_bytes = channels * (bit_depth // 8)
    if frame_bytes and sample_rate:
        meta["n_frames"] = len(data) // frame_bytes
        meta["duration_sec"] = meta["n_frames"] / sample_rate
    if audio_format != 1 or bit_depth != 16 or meta["n_frames"] is None:
        return meta  # metadata-only tier (non-PCM16 or degenerate fmt)
    s = np.frombuffer(data[: meta["n_frames"] * frame_bytes], dtype="<i2").reshape(
        meta["n_frames"], channels
    )
    meta["samples"] = s
    if s.size:
        meta["rms"] = float(np.sqrt((s.astype(np.float64) ** 2).mean()))
        meta["peak"] = int(np.abs(s.astype(np.int32)).max())
    return meta


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """mapInPandas audio decode over payload batches: WAV/PCM16 → full
    decode (frames, duration, RMS, peak), non-PCM16 WAV → header
    metadata, garbage → NULL columns (same crawl-garbage contract as
    :func:`extract_image_meta`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    m = parse_wav(b) if b[:4] == b"RIFF" else None
                except Exception:
                    # same crawl-garbage contract as extract_image_meta: a
                    # RIFF header with corrupt innards can raise beyond
                    # ValueError (struct.error on a truncated chunk —
                    # advisor probe, r10); NULL columns, never a throw
                    m = None
                if m is None:
                    rows.append(
                        (media_id, None, None, None, None, None, None, None, None)
                    )
                else:
                    rows.append(
                        (
                            media_id,
                            m["format"],
                            m["channels"],
                            m["sample_rate"],
                            m["bit_depth"],
                            m["n_frames"],
                            m["duration_sec"],
                            m["rms"],
                            m["peak"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "channels", "sample_rate",
                    "bit_depth", "n_frames", "duration_sec", "rms", "peak",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, AUDIO_META_SCHEMA
    )


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


def box_downsample(pixels, scale: int):
    """Box-average downsample of an (h, w, c) uint8 array by integer
    ``scale``: each output pixel is the mean of a ``scale × scale`` input
    block (edge blocks truncate to whatever rows/cols remain, mirroring
    how real resize kernels handle non-divisible dims). Pure numpy —
    ``np.add.reduceat`` along each axis then divide by the exact block
    areas — so the arithmetic is deterministic and testable against
    hand-computed goldens. Rounding is round-half-away-from-zero via
    ``floor(x + 0.5)`` (values are non-negative), NOT banker's rounding,
    so 0.5-exact averages are stable across numpy versions."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, _ = px.shape
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    ys = np.arange(0, h, scale)
    xs = np.arange(0, w, scale)
    summed = np.add.reduceat(np.add.reduceat(px, ys, axis=0), xs, axis=1)
    blk_h = np.minimum(ys + scale, h) - ys  # edge blocks truncate
    blk_w = np.minimum(xs + scale, w) - xs
    area = np.multiply.outer(blk_h, blk_w)[:, :, None]
    return np.floor(summed / area + 0.5).astype(np.uint8)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ]
)


def resize_images(media: DataFrame, scale: int = 2) -> DataFrame:
    """mapInPandas image resize over payload batches — the missing rung
    between decode and feature-extract in a multimodal curation pipeline
    (thumbnail / fixed-res normalization before a vision encoder).

    Each decodable PNG payload is decoded (:func:`parse_png`), box-average
    downsampled by ``scale`` (:func:`box_downsample`), and RE-ENCODED
    (:func:`encode_png`); the emitted ``width/height/channels/pixel_mean``
    metadata come from decoding the re-encoded bytes again, so a match
    against expected values proves the whole decode → resize → encode →
    decode loop, not just the numpy kernel. Non-decodable / non-PNG /
    metadata-only payloads emit NULL columns rather than throwing — a
    100 TB crawl always contains garbage bytes and a kernel that throws
    on them kills the stage. Batches stream through Arrow; nothing is
    collected."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    meta = parse_png(b) if b[:8] == _PNG_SIG else None
                    if meta is not None and meta["pixels"] is not None:
                        # round-trip: metadata from re-decoding the output
                        out = encode_png(box_downsample(meta["pixels"], scale))
                        m2 = parse_png(out)
                    else:
                        meta = None
                except Exception:
                    # the whole decode → resize → encode → re-decode loop is
                    # under the crawl-garbage contract: a valid PNG signature
                    # with corrupt IDAT raises zlib.error, a truncated IHDR
                    # struct.error (advisor probe, r10) — NULL row, no throw
                    meta = None
                if meta is None:
                    rows.append((media_id, None, None, None, None, None))
                    continue
                rows.append(
                    (
                        media_id,
                        out,
                        m2["width"],
                        m2["height"],
                        m2["channels"],
                        m2["pixel_mean"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "payload", "width", "height", "channels",
                    "pixel_mean",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


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
