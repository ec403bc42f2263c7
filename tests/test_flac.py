"""FLAC PCM decode (r13): exact round-trips through every subframe
type, predictor order, Rice method/partition order, and stereo
decorrelation; a hand-built golden stream whose CRCs come from an
INDEPENDENT bit-serial implementation (so the table-driven CRCs and
the bit layout are cross-checked, the r11 JPEG discipline); escape
codes, wasted bits, truncation and byte-flip fuzz."""

import struct

import numpy as np
import pytest

from person_linkage_case_study_spark.multimodal.flac import (
    _BitWriter,
    crc8,
    crc16,
    decode_flac_pcm,
    encode_flac,
)


def _ref_crc(data: bytes, poly: int, width: int) -> int:
    """Bit-serial CRC written independently of the module's tables."""
    reg = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            top = (reg >> (width - 1)) & 1
            reg = ((reg << 1) & ((1 << width) - 1)) | 0
            if top ^ bit:
                reg ^= poly & ((1 << width) - 1)
    return reg


def test_crc_tables_match_bit_serial_reference():
    rng = np.random.default_rng(3)
    for _ in range(20):
        data = rng.integers(0, 256, int(rng.integers(1, 64)), np.uint8).tobytes()
        assert crc8(data) == _ref_crc(data, 0x07, 8)
        assert crc16(data) == _ref_crc(data, 0x8005, 16)


def _roundtrip(samples, **kw):
    blob = encode_flac(samples, **kw)
    d = decode_flac_pcm(blob)
    got = d["samples"]
    want = np.asarray(samples)
    if want.ndim == 1:
        want = want[:, None]
    assert got.shape == want.shape
    assert (got == want).all(), (
        np.argwhere(got != want)[:5],
        got[got != want][:5],
        want[got != want][:5],
    )
    return d


def test_roundtrip_subframe_types_mono():
    rng = np.random.default_rng(7)
    sig = rng.integers(-3000, 3000, 1000).astype(np.int64)
    for subframe, kw in [
        ("verbatim", {}),
        ("fixed", {"order": 0}),
        ("fixed", {"order": 1}),
        ("fixed", {"order": 2}),
        ("fixed", {"order": 3}),
        ("fixed", {"order": 4}),
        ("lpc", {"lpc": ([3, -1], 1, 4)}),
        ("lpc", {"lpc": ([1205, -554, 120], 10, 12)}),
    ]:
        d = _roundtrip(
            sig, sample_rate=8000, block_size=256, subframe=subframe, **kw
        )
        assert d["sample_rate"] == 8000 and d["channels"] == 1
        assert d["n_frames"] == 1000
        assert d["duration_sec"] == 1000 / 8000
    # constant blocks through the constant subframe
    _roundtrip(np.full(500, -12345, np.int64), subframe="constant",
               block_size=100)


def test_roundtrip_partition_orders_and_rice2():
    rng = np.random.default_rng(11)
    sig = np.cumsum(rng.integers(-50, 51, 2048)).astype(np.int64)
    for po in (0, 1, 2, 4):
        for method in (0, 1):
            _roundtrip(
                sig, block_size=512, subframe="fixed", order=2,
                partition_order=po, rice_method=method,
            )
    # pinned (worst-case) rice params exercise long unary runs
    _roundtrip(sig[:256], block_size=256, subframe="fixed", order=1,
               rice_param=0)
    _roundtrip(sig[:256], block_size=256, subframe="fixed", order=1,
               rice_param=14)


def test_roundtrip_stereo_decorrelation():
    rng = np.random.default_rng(13)
    left = np.cumsum(rng.integers(-40, 41, 700)).astype(np.int64)
    right = left + rng.integers(-10, 11, 700)
    st = np.stack([left, right], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        d = _roundtrip(st, block_size=192, subframe="fixed", order=2,
                       stereo=mode)
        assert d["channels"] == 2
    # odd/even parity corners of the mid/side reconstruction
    tiny = np.array([[1, 0], [0, 1], [-1, 0], [5, -4], [-7, -8]], np.int64)
    _roundtrip(tiny, block_size=5, subframe="verbatim", stereo="mid_side")


def test_roundtrip_short_last_frame_and_escape():
    # 1000 % 192 != 0: the last frame is shorter (16-bit end-of-header
    # blocksize path); all-zero signal drives the 0-bit escape partitions
    _roundtrip(np.zeros(1000, np.int64), block_size=192, subframe="fixed",
               order=0)
    sig = np.zeros(512, np.int64)
    sig[100] = 7  # one nonzero partition among zero (escape) partitions
    _roundtrip(sig, block_size=512, subframe="fixed", order=0,
               partition_order=4)


def test_roundtrip_bit_depths():
    rng = np.random.default_rng(17)
    for bits in (8, 12, 16, 20, 24, 32):
        lim = 1 << (bits - 1)
        sig = rng.integers(-lim, lim, 300).astype(np.int64)
        d = _roundtrip(sig, bits=bits, block_size=128, subframe="verbatim")
        assert d["bit_depth"] == bits


def test_hand_built_golden_stream():
    """A stream assembled field by field — 8-bit mono, blocksize 4,
    one FIXED order-1 subframe with Rice param 2 — with residuals and
    CRCs computed BY HAND/independently, so decode correctness doesn't
    lean on the encoder."""
    si = _BitWriter()
    si.write(4, 16); si.write(4, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(7, 5)  # 1 ch, 8-bit
    si.write(4, 36)
    streaminfo = si.bytes() + b"\x00" * 16
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]

    # samples 10, 13, 11, 14 -> order-1 residuals (+3, -2, +3) ->
    # zigzag (6, 3, 6) -> rice p=2: q=(1,0,1), rem=(2,3,2)
    w = _BitWriter()
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)   # blocksize: 16-bit at end of header
    w.write(0, 4)   # sample rate: STREAMINFO
    w.write(0, 4)   # 1 channel
    w.write(1, 3)   # 8-bit
    w.write(0, 1)
    w.write(0, 8)   # UTF-8 frame number 0
    w.write(3, 16)  # blocksize-1
    w.align()
    hdr = w.bytes()
    hdr += bytes([_ref_crc(hdr, 0x07, 8)])

    b = _BitWriter()
    b.write(0, 1); b.write(8 + 1, 6); b.write(0, 1)  # FIXED order 1
    b.write(10, 8)                                    # warmup sample
    b.write(0, 2); b.write(0, 4)                      # rice4, 1 partition
    b.write(2, 4)                                     # param 2
    for q, rem in ((1, 2), (0, 3), (1, 2)):
        b.write(1, q + 1)                             # unary: q zeros + 1
        b.write(rem, 2)
    b.align()
    frame = hdr + b.bytes()
    frame += struct.pack(">H", _ref_crc(frame, 0x8005, 16))

    d = decode_flac_pcm(head + streaminfo + frame)
    assert d["samples"][:, 0].tolist() == [10, 13, 11, 14]
    assert d["sample_rate"] == 8000 and d["bit_depth"] == 8


def test_wasted_bits_subframe():
    """Hand-built CONSTANT subframe with 3 wasted bits: stored value
    is sample >> 3 at bps-3, decoder shifts back."""
    si = _BitWriter()
    si.write(2, 16); si.write(2, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5)  # 16-bit
    si.write(2, 36)
    streaminfo = si.bytes() + b"\x00" * 16
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]

    w = _BitWriter()
    w.write(0x3FFE, 14); w.write(0, 2)
    w.write(7, 4); w.write(0, 4); w.write(0, 4); w.write(4, 3); w.write(0, 1)
    w.write(0, 8); w.write(1, 16)
    w.align()
    hdr = w.bytes()
    hdr += bytes([crc8(hdr)])
    b = _BitWriter()
    b.write(0, 1); b.write(0, 6)       # CONSTANT
    b.write(1, 1); b.write(1, 3)       # wasted flag; unary 2 -> w=3
    b.write_signed(-100, 13)           # value at bps-3
    b.align()
    frame = hdr + b.bytes()
    frame += struct.pack(">H", crc16(frame))
    d = decode_flac_pcm(head + streaminfo + frame)
    assert d["samples"][:, 0].tolist() == [-800, -800]  # -100 << 3


def test_corruption_is_loud_never_wrong():
    """Byte flips inside the frame region raise ValueError (CRCs /
    sync / bitstream guards), never return corrupt samples silently;
    truncations either raise or return a shorter-prefix decode."""
    rng = np.random.default_rng(23)
    sig = np.cumsum(rng.integers(-30, 31, 600)).astype(np.int64)
    blob = bytearray(encode_flac(sig, block_size=192, subframe="fixed",
                                 order=2))
    frame_start = 4 + 4 + 34 + 16  # sig + block header + streaminfo + md5
    for _ in range(40):
        i = int(rng.integers(frame_start, len(blob)))
        orig = blob[i]
        blob[i] ^= 1 << int(rng.integers(0, 8))
        with pytest.raises((ValueError, struct.error)):
            d = decode_flac_pcm(bytes(blob))
            # a flip the CRC can't see would have to round-trip anyway
            if not (d["samples"][:, 0] == sig).all():
                raise ValueError("silent corruption")
        blob[i] = orig
    full = decode_flac_pcm(bytes(blob))
    assert (full["samples"][:, 0] == sig).all()
    for cut in (10, 50, 60, 100, len(blob) - 3, len(blob) - 1):
        try:
            d = decode_flac_pcm(bytes(blob[:cut]))
        except (ValueError, struct.error):
            continue
        assert d["samples"].shape[0] <= 600


def test_extract_audio_meta_flac_pcm_spark(spark):
    """The Spark audio kernel now recovers FLAC samples: a real
    Rice-coded stream lands with exact RMS/peak (square wave: both A),
    a STREAMINFO-only skeleton stays metadata-tier, corrupt frames
    degrade to the STREAMINFO numbers — never a stage kill."""
    from person_linkage_case_study_spark.multimodal.media import (
        attach_media_payload,
        encode_flac_streaminfo,
        extract_audio_meta,
    )

    amp = 1234
    n = 600
    wave = np.where(np.arange(n) % 2 == 0, amp, -amp).astype(np.int64)
    good = encode_flac(wave, 8000, block_size=192, subframe="fixed", order=1)
    bad = bytearray(good)
    bad[-10] ^= 0xFF  # corrupt inside the last frame
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(encode_flac_streaminfo(44100, 2, 16, 44100))),
            (3, bytearray(bad)),
        ],
        "media_id long, payload binary",
    )
    media = attach_media_payload(df, bytes_col="payload", id_col="media_id")
    rows = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    assert rows[1]["rms"] == float(amp) and rows[1]["peak"] == float(amp)
    assert rows[1]["n_frames"] == n and rows[1]["duration_sec"] == n / 8000
    assert rows[2]["format"] == "flac" and rows[2]["rms"] is None
    assert rows[2]["duration_sec"] == 1.0
    assert rows[3]["format"] == "flac" and rows[3]["rms"] is None


def test_amplification_guard_streaminfo_total(monkeypatch):
    """r13 ADVICE (medium): a crafted stream appending extra valid
    frames past STREAMINFO's declared total must raise, not balloon —
    the decoder refuses at the START of any frame whose first sample
    would land at/after the declared total (legal last-block padding
    only extends the FINAL frame and is clipped, which stays green)."""
    n = 192
    sig = np.full(n, 77, dtype=np.int64)
    blob = encode_flac(sig, 8000, block_size=192, subframe="constant")
    # sanity: single-frame stream round-trips
    assert decode_flac_pcm(blob)["samples"].shape == (n, 1)
    frame = blob[4 + 4 + 34:]  # fLaC + STREAMINFO block header + body
    bomb = blob + frame  # duplicate frame: sample 192 >= total 192
    with pytest.raises(ValueError, match="exceeds STREAMINFO"):
        decode_flac_pcm(bomb)


def test_amplification_guard_hard_ceiling(monkeypatch):
    """With STREAMINFO totals absent (0), the FLAC_SAMPLE_LIMIT hard
    ceiling (audio analogue of PURE_JPEG_PIXEL_LIMIT) bounds the
    CONSTANT-subframe ~8700x amplification; an oversized declared
    total is clamped to the same ceiling."""
    import person_linkage_case_study_spark.multimodal.flac as flacmod

    n = 192
    sig = np.full(n, -5, dtype=np.int64)
    blob = bytearray(encode_flac(sig, 8000, block_size=192,
                                 subframe="constant"))
    # zero the 36-bit total-samples field (last 36 of STREAMINFO's
    # 144-bit fixed part: byte 13 low nibble + bytes 14-17, offset +8)
    blob[8 + 13] &= 0xF0
    for i in range(14, 18):
        blob[8 + i] = 0
    frame = bytes(blob[4 + 4 + 34:])
    stream3 = bytes(blob) + frame + frame  # 3 frames, 576 samples
    # unknown total + generous ceiling: decodes all three frames
    monkeypatch.setattr(flacmod, "FLAC_SAMPLE_LIMIT", 1000)
    assert decode_flac_pcm(stream3)["samples"].shape == (3 * n, 1)
    # ceiling reached at the third frame's start (384 >= 384)
    monkeypatch.setattr(flacmod, "FLAC_SAMPLE_LIMIT", 2 * n)
    with pytest.raises(ValueError, match="FLAC_SAMPLE_LIMIT"):
        decode_flac_pcm(stream3)
