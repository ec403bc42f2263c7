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
    phash256,
    phash_near_dups,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _ham_words(a, b) -> int:
    return sum(
        bin((x ^ y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b)
    )


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


def test_phash256_invariance_and_separation():
    """The 256-bit (16x16 low-block) hash carries the same invariance
    contract as the 64-bit one: identical across lossless re-encodings
    and bit depths, near under brightness shift, far for unrelated
    images, None for garbage — with 4 signed int64 words MSB-first."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    h = phash256(encode_png(img))
    assert isinstance(h, list) and len(h) == 4
    assert h == phash256(encode_bmp(img))
    assert h == phash256(encode_jpeg_baseline(img))
    assert h == phash256(encode_jpeg_progressive(img))
    assert h == phash256(encode_png(img.astype(np.uint16) << 8, bit_depth=16))

    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    assert _ham_words(h, phash256(encode_png(bright))) <= 8

    other = rng.integers(0, 256, (48, 64, 3), np.uint8)
    assert _ham_words(h, phash256(encode_png(other))) > 64

    # the 64-bit hash is NOT a prefix of the 256-bit one (different
    # median threshold over a different block) but both rank the same
    # way; sanity: garbage contract holds
    assert phash256(b"nope") is None


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


def _flip_words(words, positions):
    """Flip global bit positions (0 = MSB of word 0) in a 4-word hash."""
    out = list(words)
    for p in positions:
        wi, off = divmod(p, 64)
        v = out[wi] & ((1 << 64) - 1)
        v ^= 1 << (63 - off)
        out[wi] = v - (1 << 64) if v >= (1 << 63) else v
    return out


@pytest.mark.parametrize("max_distance", [0, 1, 3, 10, 21])
def test_phash256_banded_join_exact_recall(spark, max_distance):
    """r13: the pigeonhole guarantee over the array<long> 256-bit hash,
    at band layouts covering every packing path — d=0 (one 256-bit
    xor-fold band), d=1 (two 128-bit xor-fold bands), d=3 (64-bit
    whole-word bands), d=10 (23-24-bit bands STRADDLING word
    boundaries, the exact 2-piece packing), d=21 (11-12-bit bands).
    Adversarial flip positions include word boundaries (63/64,
    127/128, 191/192) and band seams."""
    rng = np.random.default_rng(max_distance + 1)

    def rand_hash():
        ws = []
        for _ in range(4):
            v = int(rng.integers(0, 1 << 32)) << 32 | int(
                rng.integers(0, 1 << 32)
            )
            ws.append(v - (1 << 64) if v >= (1 << 63) else v)
        return ws

    base = rand_hash()
    rows = [(0, base)]
    rid = 1
    expected = set()
    for d in range(max_distance + 1):
        for positions in (
            [*range(d)],  # clustered at the MSB end
            [*range(256 - d, 256)],  # clustered at the LSB end
            [*range(60, 60 + d)],  # straddles the word-0/1 boundary
            [*range(0, 256, 23)][:d],  # spread across band seams
        ):
            if len(positions) != d:
                continue
            rows.append((rid, _flip_words(base, positions)))
            expected.add((0, rid))
            rid += 1
    # beyond-threshold controls
    for extra in (max_distance + 1, min(255, max_distance + 40)):
        rows.append((rid, _flip_words(base, [*range(0, 256, 3)][:extra])))
        rid += 1
    # unrelated noise rows (these also exercise guard bucket counting)
    for _ in range(20):
        rows.append((rid, rand_hash()))
        rid += 1
    df = spark.createDataFrame(rows, "media_id long, phash array<long>")
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


def test_phash_volume_guard(spark):
    """r13 (closes the r12 'what's wrong'): a hot band bucket — here a
    planted pile of IDENTICAL 64-bit hashes, the all-copies-of-one-logo
    corpus — trips the fail-fast candidate-volume guard with an error
    naming the remedies, BEFORE any join is built; the same corpus
    passes with the ceiling raised (the volume is then genuinely
    intended) and with the guard disabled."""
    n = 200  # C(200,2) * 4 bands = 79.6k candidates > the 50k ceiling
    df = spark.createDataFrame(
        [(i, 0x0123_4567_89AB_CDEF) for i in range(n)],
        "media_id long, phash long",
    )
    with pytest.raises(ValueError, match="256-bit|max_distance|remedies|Remedies"):
        phash_near_dups(df, max_distance=3, max_candidate_pairs=5e4)
    # raised ceiling: the join is legal and emits every pair once
    pairs = phash_near_dups(
        df, max_distance=3, max_candidate_pairs=1e6
    )
    assert pairs.count() == n * (n - 1) // 2
    # disabled guard: no eager job, same result
    assert (
        phash_near_dups(df, max_distance=3, max_candidate_pairs=None).count()
        == n * (n - 1) // 2
    )


def test_phash_volume_guard_prefers_wide_hash(spark):
    """The guard's arithmetic embodies the module volume model: a
    uniform corpus that TRIPS the 64-bit d=10 banding (5-6-bit bands,
    near-quadratic) passes untouched as a 256-bit corpus at the same
    distance (23-24-bit bands) — the exact remedy the error names."""
    rng = np.random.default_rng(7)
    n = 3000
    rows64, rows256 = [], []
    for i in range(n):
        ws = []
        for _ in range(4):
            v = int(rng.integers(0, 1 << 32)) << 32 | int(
                rng.integers(0, 1 << 32)
            )
            ws.append(v - (1 << 64) if v >= (1 << 63) else v)
        rows64.append((i, ws[0]))
        rows256.append((i, ws))
    ceiling = 2e5  # 64-bit d=10: ~11 * n^2 / 2^7 ~ 7.7e5 >> ceiling
    df64 = spark.createDataFrame(rows64, "media_id long, phash long")
    with pytest.raises(ValueError, match="Remedies"):
        phash_near_dups(df64, max_distance=10, max_candidate_pairs=ceiling)
    df256 = spark.createDataFrame(rows256, "media_id long, phash array<long>")
    # 256-bit d=10: ~11 * n^2 / 2^24 ~ 6 expected collisions — sails under
    pairs = phash_near_dups(
        df256, max_distance=10, max_candidate_pairs=ceiling
    )
    assert pairs.count() == 0  # uniform noise: no true near-dups


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


def test_canonical_images_mixed_reencodings_one_survivor(spark):
    """The image-dedup canonicalization capstone (r13 verdict #1):
    PNG / progressive-JPEG / baseline-JPEG / BMP / 16-bit-PNG
    re-encodings of the SAME pixels collapse to ONE survivor through
    extract_image_profile -> phash_near_dups -> connected_components
    -> canonical keep; a distinct image survives on its own, and an
    undecodable payload is KEPT (dedup never silently drops what it
    cannot read)."""
    from person_linkage_case_study_spark.multimodal.phash import (
        canonical_images,
        image_survivors,
    )

    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:48, 0:40]
    base = (
        96 + 60 * np.sin(x / 6.0) + 50 * np.cos(y / 7.0)
        + rng.integers(-8, 9, (48, 40))
    ).clip(0, 255).astype(np.uint8)
    rgb = np.stack([base, base, base], axis=2)
    other = rng.integers(0, 256, (40, 40, 3), np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(rgb))),
            (2, bytearray(encode_jpeg_progressive(rgb))),
            (3, bytearray(encode_jpeg_baseline(rgb))),
            (4, bytearray(encode_bmp(rgb))),
            (5, bytearray(encode_png(rgb.astype(np.uint16) * 257,
                                     bit_depth=16))),
            (10, bytearray(encode_png(other))),
            (11, bytearray(encode_bmp(other))),
            (20, bytearray(b"not an image at all")),
        ],
        "media_id long, payload binary",
    )
    surv = image_survivors(df)  # default max_distance=3
    ids = sorted(r["media_id"] for r in surv.select("media_id").collect())
    assert ids == [1, 10, 20]
    # the mapping itself: every re-encoding canonicalizes to min id
    from person_linkage_case_study_spark.multimodal.media import (
        extract_image_profile,
    )

    prof = extract_image_profile(df).where(F.col("phash").isNotNull())
    canon = canonical_images(
        prof.select("media_id", "phash"), max_distance=3, nbits=64
    )
    mapping = {r["media_id"]: r["canonical_id"] for r in canon.collect()}
    assert mapping == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_image_survivors_256bit_path(spark):
    """use_256 routes the capstone through phash256 (wider bands, the
    scale remedy) and keeps identical survivorship on lossless
    re-encodings."""
    from person_linkage_case_study_spark.multimodal.phash import (
        image_survivors,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(img))),
            (2, bytearray(encode_bmp(img))),
            (3, bytearray(encode_png(other))),
        ],
        "media_id long, payload binary",
    )
    surv = image_survivors(df, max_distance=10, use_256=True)
    ids = sorted(r["media_id"] for r in surv.select("media_id").collect())
    assert ids == [1, 3]


def test_gif_frames_near_dup_with_still_reencodings(spark):
    """r13 verdict item #6: animated-GIF frames (exploded to real PNG
    payloads via extract_gif_frames(as_png=True)) near-dup against
    still re-encodings of the same pixels through the banded pHash
    join, and collapse with them to one survivor through the
    canonicalization capstone."""
    from person_linkage_case_study_spark.multimodal.media import (
        encode_gif_animation,
        extract_gif_frames,
    )
    from person_linkage_case_study_spark.multimodal.phash import (
        canonical_images,
    )

    rng = np.random.default_rng(3)
    # 64-entry grayscale-ramp palette, smooth index planes
    pal = np.stack([np.arange(0, 256, 4)] * 3, axis=1).astype(np.uint8)
    y, x = np.mgrid[0:40, 0:40]
    f0 = ((np.sin(x / 5.0) + np.cos(y / 6.0) + 2) * 15).astype(np.uint8)
    f1 = ((np.cos(x / 4.0) + np.sin(y / 5.0) + 2) * 15).astype(np.uint8)
    gif = encode_gif_animation(
        [
            {"indexes": f0, "delay_cs": 5},
            {"indexes": f1, "delay_cs": 5},
        ],
        pal,
    )
    gdf = spark.createDataFrame(
        [(100, bytearray(gif))], "media_id long, payload binary"
    )
    frames = extract_gif_frames(gdf, as_png=True).select(
        # re-key each frame so it lives alongside the stills
        (F.col("media_id") * 10 + F.col("frame_idx")).alias("media_id"),
        F.col("frame_png").alias("payload"),
    )
    stills = spark.createDataFrame(
        [
            (1, bytearray(encode_png(pal[f0]))),   # still of frame 0
            (2, bytearray(encode_bmp(pal[f0]))),   # BMP re-encode
            (3, bytearray(encode_png(pal[f1]))),   # still of frame 1
        ],
        "media_id long, payload binary",
    )
    corpus = stills.unionByName(frames)  # ids: 1, 2, 3, 1000, 1001
    from person_linkage_case_study_spark.multimodal.media import (
        extract_image_profile,
    )

    prof = extract_image_profile(corpus).where(F.col("phash").isNotNull())
    canon = canonical_images(
        prof.select("media_id", "phash"), max_distance=3, nbits=64
    )
    mapping = {r["media_id"]: r["canonical_id"] for r in canon.collect()}
    # frame 0 (id 1000) clusters with its stills (1, 2); frame 1
    # (id 1001) with its still (3); the two clusters stay apart
    assert mapping == {1: 1, 2: 1, 1000: 1, 3: 3, 1001: 3}
