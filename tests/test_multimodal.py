"""Multimodal plumbing tests: schemas, Arrow batch shape, fan-out — with a
deterministic fake codec (real codecs are stubbed, see operators/multimodal)."""

from __future__ import annotations

import pytest

from kafka_streams_examples_spark.operators.multimodal import (
    extract_features, frame_sample, synthesize_media,
)


def _fake_decode():
    # defined via factory so cloudpickle serializes by value (test modules
    # aren't importable on executors)
    def fake_decode(payload: bytes, meta: dict) -> list[float]:
        n = len(payload)
        return [float(n), float(sum(payload) % 997), float(payload[0])]
    return fake_decode


def _fake_frames():
    def fake_frames(payload: bytes, meta: dict) -> list[bytes]:
        k = 8
        step = max(1, len(payload) // k)
        return [payload[i * step:(i + 1) * step] for i in range(k)]
    return fake_frames


def test_extract_features_shapes(spark):
    fake_decode = _fake_decode()
    media = synthesize_media(spark, n=16)
    out = extract_features(media, decode_fn=fake_decode).collect()
    assert len(out) == 16
    for r in out:
        assert r["n_bytes"] >= 128
        assert len(r["feature"]) == 3
        assert r["modality"] in ("image", "audio")


def test_extract_features_default_raises(spark):
    media = synthesize_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        extract_features(media).collect()


def test_frame_sample_fanout(spark):
    fake_frames = _fake_frames()
    media = synthesize_media(spark, n=4)
    out = frame_sample(media, every_n=2, decode_fn=fake_frames).collect()
    # 8 fake frames per row, every 2nd sampled -> 4 per row
    assert len(out) == 16
    assert all(r["frame_no"] % 2 == 0 for r in out)


def test_bound_partition_bytes(spark):
    from kafka_streams_examples_spark.operators.multimodal import (
        bound_partition_bytes, synthesize_media,
    )

    media = synthesize_media(spark, n=32)
    # tiny budget forces a fan-out; row count is preserved
    bounded = bound_partition_bytes(media, target_bytes=1024)
    assert bounded.count() == 32
    assert bounded.rdd.getNumPartitions() > 1


def test_resize_media_updates_payload_and_meta(spark):
    from kafka_streams_examples_spark.operators.multimodal import (
        resize_media, synthesize_media,
    )

    media = synthesize_media(spark, n=8)

    def fake_resize(payload, meta, w, h):
        # deterministic stand-in: truncate/pad payload to w*h bytes
        target = w * h
        return (payload[:target] if len(payload) >= target
                else payload + bytes(target - len(payload)))

    out = resize_media(media, width=4, height=4, resize_fn=fake_resize)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["payload"]) == 16
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
        assert r["meta"]["modality"] in ("image", "audio")
