"""Perceptual image hashing + hamming near-dup join (late r12).

The image analog of the MinHash suite: hash invariance across
re-encodings, sensitivity separation, the banded join's EXACT-recall
pigeonhole guarantee (constructed hash pairs at every distance), and
the plan shape (equi-join on the band key, never a cartesian)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.multimodal.media import (
    encode_bmp,
    encode_gif,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    encode_png,
)
from person_linkage_case_study_spark.multimodal.phash import (
    attach_phash,
    phash64,
    phash_near_dups,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariance_and_separation():
    """The same pixels hash IDENTICALLY through PNG, BMP, baseline and
    progressive JPEG (unit quant), and 16-bit PNG; a brightness shift
    moves only the DC coefficient (distance ~0); unrelated images land
    far apart; garbage returns None."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    h = phash64(encode_png(img))
    assert h == phash64(encode_bmp(img))
    assert h == phash64(encode_jpeg_baseline(img))
    assert h == phash64(encode_jpeg_progressive(img))
    assert h == phash64(encode_png(img.astype(np.uint16) << 8, bit_depth=16))

    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    assert _ham(h, phash64(encode_png(bright))) <= 4

    other = rng.integers(0, 256, (48, 64, 3), np.uint8)
    assert _ham(h, phash64(encode_png(other))) > 16

    # a GIF (palette-quantized) of a block image matches its exact PNG
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = (np.add.outer(np.arange(32), np.arange(32)) // 8 % 2).astype(
        np.uint8
    )
    assert phash64(encode_gif(idx, pal)) == phash64(encode_png(pal[idx]))

    assert phash64(b"not an image") is None
    assert phash64(b"") is None


@pytest.mark.parametrize("max_distance", [0, 3, 10])
def test_phash_banded_join_exact_recall(spark, max_distance):
    """Pigeonhole guarantee: EVERY pair within max_distance surfaces
    (constructed hashes flipping 0..max_distance bits at adversarial
    positions — including bits straddling band boundaries), pairs
    beyond the threshold never pass the distance filter, and the plan
    joins on the band key (no cartesian)."""
    base = 0x0123_4567_89AB_CDEF
    rows = [(0, base)]
    rid = 1
    expected = set()
    for d in range(max_distance + 1):
        # flip the d lowest bits, the d highest, and a spread pattern
        for positions in ([*range(d)], [*range(64 - d, 64)],
                          [*range(0, 64, 7)][:d]):
            if len(positions) != d:
                continue
            v = base
            for p in positions:
                v ^= 1 << p
            sv = v - (1 << 64) if v >= (1 << 63) else v
            rows.append((rid, sv))
            expected.add((0, rid))
            rid += 1
    # beyond-threshold controls: max_distance+1 and +8 flipped bits
    for extra in (max_distance + 1, min(63, max_distance + 8)):
        v = base
        for p in range(extra):
            v ^= 1 << (p * 2 if p * 2 < 64 else p)
        rows.append((rid, v - (1 << 64) if v >= (1 << 63) else v))
        rid += 1
    sbase = base - (1 << 64) if base >= (1 << 63) else base
    df = spark.createDataFrame(
        [(i, h if h < (1 << 63) else h - (1 << 64)) for i, h in rows],
        "media_id long, phash long",
    )
    pairs = phash_near_dups(df, max_distance=max_distance)
    got = {
        (r["id_a"], r["id_b"])
        for r in pairs.collect()
        if 0 in (r["id_a"], r["id_b"])
    }
    missing = expected - got
    assert not missing, f"pigeonhole recall violated: {missing}"
    for r in pairs.collect():
        assert r["distance"] <= max_distance

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan


def test_phash_spark_end_to_end(spark):
    """attach_phash + phash_near_dups over real payloads: a PNG and a
    BMP of the same pixels pair at distance 0, the unrelated image
    pairs with neither, garbage rows hash NULL and drop out."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 40, 3), np.uint8)
    other = rng.integers(0, 256, (40, 40, 3), np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(img))),
            (2, bytearray(encode_bmp(img))),
            (3, bytearray(encode_png(other))),
            (4, bytearray(b"junk")),
            (5, None),
        ],
        "media_id long, payload binary",
    )
    hashes = attach_phash(df)
    rows = {r["media_id"]: r["phash"] for r in hashes.collect()}
    assert rows[1] == rows[2] and rows[4] is None and rows[5] is None
    pairs = phash_near_dups(hashes, max_distance=6).collect()
    assert [(p["id_a"], p["id_b"], p["distance"]) for p in pairs] == [
        (1, 2, 0)
    ]
