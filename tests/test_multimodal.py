"""Multimodal plumbing: schema, mapInPandas batch shape, decode/feature/
frame-sample contracts (decode kernels are stubs — the Spark side is
what's under test)."""

from __future__ import annotations

import pytest

from milan_telecom_etl__spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
)
from milan_telecom_etl__spark.schemas import MEDIA


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", None, None, None, None),
        (2, "image", b"\x89PNG-fake-bytes-2", "image/png", None, None, None, None),
        (3, "image", None, "image/png", None, None, None, None),  # corrupt
        (4, "video", b"fake-mp4", "video/mp4", None, None, 3500, None),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_decode_contract(media_df):
    out = decode_media(media_df).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 4
    ok1 = by_id[1]
    assert ok1["ok"] and 64 <= ok1["width"] < 576 and len(ok1["sha256"]) == 64
    # deterministic: same payload → same fake dims
    assert decode_media(media_df).filter("media_id = 1").first()["width"] == ok1["width"]
    # corrupt media is data, not a crash
    bad = by_id[3]
    assert not bad["ok"] and "payload" in bad["error"]


def test_feature_contract(media_df):
    out = {r["media_id"]: r for r in extract_features(media_df).collect()}
    assert len(out) == 4
    vec = out[1]["features"]
    assert len(vec) == FEATURE_DIM and all(0.0 <= v <= 1.0 for v in vec)
    assert out[1]["features"] != out[2]["features"]


def test_frame_sampling(media_df):
    frames = sample_frames(media_df, every_ms=1000).collect()
    # only the video row produces frames: ceil(3500/1000) = 4 samples
    assert {r["media_id"] for r in frames} == {4}
    assert [r["frame_ms"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [
        0, 1000, 2000, 3000,
    ]


def test_metadata_scan_prunes_payload(media_df, tmp_path):
    # metadata-only query over the MEDIA schema must not read payload
    path = str(tmp_path / "media.parquet")
    media_df.write.parquet(path)
    spark = media_df.sparkSession
    scan = spark.read.parquet(path).select("media_id", "modality", "mime_type")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruned at the parquet scan
    assert scan.count() == 4


def test_resize_contract(media_df):
    import hashlib

    from milan_telecom_etl__spark.operators.multimodal import (
        resize_media,
        synthetic_decode,
    )

    out = {r["media_id"]: r for r in resize_media(media_df, 224, 128).collect()}
    assert len(out) == 4
    # corrupt payload -> NULL dims + NULL hash (error-as-data)
    assert out[3]["out_width"] is None and out[3]["resized_sha256"] is None
    for mid, payload in [(1, b"\x89PNG-fake-bytes-1"), (4, b"fake-mp4")]:
        w, h = synthetic_decode(payload)
        if w * 128 >= h * 224:
            ew, eh = 224, max(1, h * 224 // w)
        else:
            ew, eh = max(1, w * 128 // h), 128
        assert (out[mid]["out_width"], out[mid]["out_height"]) == (ew, eh)
        assert 1 <= out[mid]["out_width"] <= 224
        assert 1 <= out[mid]["out_height"] <= 128
        assert out[mid]["resized_sha256"] == hashlib.sha256(
            payload + b":resize:224x128"
        ).hexdigest()


def test_frame_hash_contract(media_df):
    import hashlib

    frames = sample_frames(media_df, every_ms=1000).collect()
    by_ix = {r["frame_index"]: r for r in frames}
    assert by_ix[2]["frame_sha256"] == hashlib.sha256(
        b"fake-mp4:frame:2000"
    ).hexdigest()
