"""Multimodal plumbing: binary payload schema, mapInPandas batching, stubs."""

import pytest
from pyspark.sql import functions as F

from person_linkage_case_study_spark.multimodal.media import (
    attach_media_payload,
    decode_image,
    extract_media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG" + b"x" * 10000, "a"), (2, b"", "b"), (3, b"abc", "a")],
        "media_id long, payload binary, src string",
    )
    return attach_media_payload(df, bytes_col="payload", id_col="media_id", source_col="src")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "n_bytes", "source",
    ]
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == 10004
    assert rows[2]["n_bytes"] == 0


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG....")


def test_feature_extraction(media):
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["n_bytes"] == 10004
    assert feats[1]["byte_entropy"] > 0
    assert len(feats[1]["feature_vec"]) == 16
    assert feats[2]["byte_entropy"] == 0.0 and feats[2]["head_hash"] == 0
    # determinism
    again = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["head_hash"] == again[1]["head_hash"]


def test_frame_sampling(media):
    frames = sample_frames(media, every_n_bytes=4096, max_frames=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 2  # 10004 bytes / 4096 -> 2 frames
    assert len(by_id[3]) == 1
    assert len(by_id[1][0]["frame_payload"]) == 4096
