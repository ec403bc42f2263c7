"""Media codec throughput rehearsal (r13): measured MP/s / MS/s for
every pure-Python decode tier, single-core and through the 32-way
mapInPandas kernels — the numbers SCALING.md and COVERAGE.md quote
instead of guessing.

Content classes per codec are the shapes that bracket real cost:
block-smooth (DC-heavy, the fast path) and dense-noise (worst-case
entropy coding) for JPEG; photographic-gradient PNG (filter-heavy
zlib); random-palette GIF (LZW table churn); square-wave and
random-walk FLAC (short vs long Rice codes).

Usage: python tools/bench_media.py [rows_per_kernel]
Prints ONE JSON line:
{"metric": "media_throughput", "single_core": {codec: {"mp_s": ...}},
 "kernel_32way": {"rows_s": N, "rows": R, "wall_sec": s}}
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _bench(fn, payloads, unit_pixels):
    t0 = time.time()
    for p in payloads:
        fn(p)
    wall = time.time() - t0
    total = unit_pixels * len(payloads)
    return {
        "wall_sec": round(wall, 3),
        "units": total,
        "per_sec": round(total / wall, 1) if wall else None,
    }


def single_core():
    from person_linkage_case_study_spark.multimodal.flac import (
        decode_flac_pcm,
        encode_flac,
    )
    from person_linkage_case_study_spark.multimodal.media import (
        decode_jpeg_pixels,
        encode_bmp,
        encode_gif,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
        encode_png,
        parse_bmp,
        parse_gif,
        parse_png,
    )

    rng = np.random.default_rng(42)
    out = {}

    # 256x256 content classes
    smooth = np.repeat(
        np.repeat(rng.integers(0, 256, (32, 32), np.uint8), 8, 0), 8, 1
    )
    grad = (
        np.add.outer(np.arange(256), np.arange(256)) // 2
        + rng.integers(-4, 5, (256, 256))
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (256, 256), np.uint8)
    mp = 256 * 256 / 1e6

    out["png_gradient"] = _bench(
        parse_png, [encode_png(grad[:, :, None])] * 8, mp
    )
    out["png_noise"] = _bench(
        parse_png, [encode_png(noise[:, :, None])] * 8, mp
    )
    out["jpeg_baseline_smooth"] = _bench(
        decode_jpeg_pixels, [encode_jpeg_baseline(smooth)] * 4, mp
    )
    out["jpeg_baseline_noise"] = _bench(
        decode_jpeg_pixels, [encode_jpeg_baseline(noise)] * 2, mp
    )
    out["jpeg_progressive_smooth"] = _bench(
        decode_jpeg_pixels, [encode_jpeg_progressive(smooth)] * 2, mp
    )
    out["jpeg_12bit_smooth"] = _bench(
        decode_jpeg_pixels,
        [encode_jpeg_baseline(smooth.astype(np.int64) * 16, precision=12)] * 2,
        mp,
    )
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    out["gif_noise"] = _bench(
        parse_gif, [encode_gif(noise, pal)] * 4, mp
    )
    out["bmp"] = _bench(
        parse_bmp, [encode_bmp(np.stack([noise] * 3, -1))] * 32, mp
    )

    # FLAC: 8k samples stereo; units = mega-samples
    ms = 8192 * 2 / 1e6
    sq = np.where(np.arange(8192) % 2 == 0, 9000, -9000)
    sq2 = np.stack([sq, -sq], 1).astype(np.int64)
    walk = np.cumsum(rng.integers(-99, 100, (8192, 2)), 0).astype(np.int64)
    out["flac_square"] = _bench(
        decode_flac_pcm,
        [encode_flac(sq2, block_size=4096, subframe="fixed", order=1,
                     stereo="mid_side")] * 4,
        ms,
    )
    out["flac_walk"] = _bench(
        decode_flac_pcm,
        [encode_flac(walk, block_size=4096, subframe="fixed", order=2)] * 4,
        ms,
    )
    return out


def kernel_32way(rows: int):
    """The end-to-end shape: the mm_media_features ten-codec entry over
    a synthesized documents frame, rows/s through the full plan."""
    from pyspark.sql import SparkSession

    from person_linkage_case_study_spark import queries as catalog

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("bench_media")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    sf_dir = "/root/testdata/sf0.1"
    # warm
    qs["mm_media_features"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    t0 = time.time()
    df = qs["mm_media_features"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    nrows = df.count()
    spark.stop()
    return {
        "rows": nrows,
        "wall_sec": round(wall, 2),
        "rows_s": round(nrows / wall, 1),
        "note": "mm_media_features at sf0.1: ~13 codec round-trips/row",
    }


def profile_ab(rows: int = 4000):
    """r13 verdict "what's wrong #4": the one-pass profile win was
    asserted (decode is ~all the cost), never measured. Times the
    3-consumer pipeline both ways over the SAME materialized payload
    frame: CHAINED = extract_image_meta + extract_media_features +
    attach_phash (three kernels, three decodes) joined on media_id,
    vs COMBINED = extract_image_profile (one decode). Best-of-2 each,
    alternating, so host drift hits both arms."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from person_linkage_case_study_spark.multimodal.media import (
        extract_image_meta,
        extract_image_profile,
        extract_media_features,
    )
    from person_linkage_case_study_spark.multimodal.phash import attach_phash

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("bench_media_profile_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def synth(it):
        import pandas as pd

        from person_linkage_case_study_spark.multimodal.media import (
            encode_png,
        )

        rng = np.random.default_rng(99)
        grad = (
            np.add.outer(np.arange(128), np.arange(128)) // 2
            + rng.integers(-4, 5, (128, 128))
        ).astype(np.uint8)
        payload = encode_png(grad[:, :, None])
        for pdf in it:
            yield pd.DataFrame(
                {"media_id": pdf["id"], "payload": [payload] * len(pdf)}
            )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    media = (
        spark.range(rows).repartition(32).mapInPandas(synth, schema).persist()
    )
    media.count()  # materialize: synth cost is NOT timed

    def chained() -> float:
        t0 = time.time()
        meta = extract_image_meta(media)
        feat = extract_media_features(media)
        ph = attach_phash(media)
        meta.join(feat, "media_id").join(ph, "media_id").write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.time() - t0, 3)

    def combined() -> float:
        t0 = time.time()
        extract_image_profile(media).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    combined()  # warm the python workers / plans once
    chained()
    runs = {"chained": [], "combined": []}
    for _ in range(2):
        runs["chained"].append(chained())
        runs["combined"].append(combined())
    media.unpersist()
    spark.stop()
    ch, co = min(runs["chained"]), min(runs["combined"])
    return {
        "rows": rows,
        "chained_sec": ch,
        "combined_sec": co,
        "speedup": round(ch / co, 2) if co else None,
        "raw": runs,
        "note": "3 consumers (meta+features+phash) chained vs one-pass "
        "extract_image_profile, same persisted 128x128-PNG frame",
    }


def mpeg_throughput(n_frames: int = 200):
    """Single-core MPEG-1 audio frame-layer decode throughput (r14):
    dense stereo Layer I (all 32 subbands at 6-bit codes) and dense
    mono Layer II over the fixture allocation table (all 12 subbands,
    random classes incl. grouped) — requantized subband samples/sec,
    the frame-layer analogue of the FLAC MS/s numbers."""
    from person_linkage_case_study_spark.multimodal.mpeg_audio import (
        decode_layer1,
        decode_layer2,
        design_alloc_table,
        encode_layer1,
        encode_layer2,
    )

    rng = np.random.default_rng(7)
    l1_frames = []
    for _ in range(n_frames):
        l1_frames.append({
            "alloc": np.full((2, 32), 5, np.int64),  # nb = 6
            "scf": rng.integers(0, 63, (2, 32)),
            "codes": rng.integers(0, 64, (12, 2, 32)),
        })
    blob1 = encode_layer1(l1_frames, mode="stereo")
    t0 = time.time()
    d1 = decode_layer1(blob1)
    w1 = time.time() - t0
    s1 = int(d1["subbands"].size)

    tab = design_alloc_table()
    rows_tab = tab["rows"]
    l2_frames = []
    for _ in range(n_frames):
        alloc = np.zeros((1, 32), np.int64)
        scf = np.zeros((1, 32, 3), np.int64)
        codes = np.zeros((36, 1, 32), np.int64)
        for sb in range(tab["sblimit"]):
            a = int(rng.integers(1, len(rows_tab[sb][1]) + 1))
            alloc[0, sb] = a
            scf[0, sb, :] = rng.integers(0, 63)
            codes[:, 0, sb] = rng.integers(0, rows_tab[sb][1][a - 1], 36)
        l2_frames.append({
            "alloc": alloc, "scf": scf, "codes": codes,
            "scfsi": np.full((1, 32), 2, np.int64),
        })
    blob2 = encode_layer2(l2_frames, alloc_table=tab, mode="mono")
    t0 = time.time()
    d2 = decode_layer2(blob2, alloc_table=tab)
    w2 = time.time() - t0
    s2 = int(d2["subbands"].size)
    return {
        "layer1": {"frames": n_frames, "subband_samples": s1,
                   "wall_sec": round(w1, 3),
                   "samples_per_sec": round(s1 / w1, 1) if w1 else None},
        "layer2": {"frames": n_frames, "subband_samples": s2,
                   "wall_sec": round(w2, 3),
                   "samples_per_sec": round(s2 / w2, 1) if w2 else None},
        "note": "single-core frame-layer decode (requantized subband "
        "samples/s); stereo L1 all-32-subbands nb=6, mono L2 fixture "
        "table all-12-subbands random classes",
    }


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows = int(pos[0]) if pos else 0
    if "--mpeg" in sys.argv:
        print(json.dumps({"metric": "mpeg_throughput",
                          **mpeg_throughput(rows or 200)}))
        return
    if "--profile-ab" in sys.argv:
        print(
            json.dumps(
                {"metric": "media_profile_ab", **profile_ab(rows or 4000)}
            )
        )
        return
    payload = {
        "metric": "media_throughput",
        "single_core": single_core(),
        "kernel_32way": kernel_32way(rows),
        "profile_ab": profile_ab(),
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
