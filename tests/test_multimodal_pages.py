"""Multimodal plumbing + pages source: schemas, determinism, batch
shapes (decode itself is a documented stub)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.shipping import ensure_shipped
from pg_textsearch_spark.sources.multimodal import (
    FEATURE_DIM,
    extract_features,
    generate_media,
    resize_plan,
    sample_frames,
)
from pg_textsearch_spark.sources.pages import (
    generate_pages,
    with_extracted_text,
)


@pytest.fixture(scope="module")
def media(spark):
    ensure_shipped(spark)
    return generate_media(spark, 200, seed=11).cache()


def test_media_schema_and_determinism(spark, media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 200
    again = {r["media_id"]: r for r in generate_media(spark, 200, seed=11).collect()}
    for k in rows:
        assert bytes(rows[k]["payload"]) == bytes(again[k]["payload"])
        assert rows[k]["kind"] == again[k]["kind"]


def test_extract_features_shape_and_determinism(media):
    feats = extract_features(media).collect()
    assert len(feats) == 200
    for r in feats:
        v = np.array(r["features"], dtype=np.float32)
        assert v.shape == (FEATURE_DIM,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
    f2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    for r in feats:
        assert r["features"] == f2[r["media_id"]]


def test_resize_plan_aspect(media):
    plans = resize_plan(media, max_side=512).collect()
    assert plans
    for p in plans:
        assert max(p["target_w"], p["target_h"]) <= 512 + 1
        if max(p["width"], p["height"]) <= 512:
            assert (p["target_w"], p["target_h"]) == (p["width"], p["height"])


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=10000)
    agg = frames.groupBy("media_id").count().collect()
    assert agg
    durs = {r["media_id"]: r["meta"]["duration_ms"]
            for r in media.filter("kind='video'").collect()}
    for r in agg:
        expect = max(durs[r["media_id"]] - 1, 0) // 10000 + 1
        assert r["count"] == expect


def test_pages_extract_text_invariant(spark):
    ensure_shipped(spark)
    pages = generate_pages(spark, 50, seed=42)
    ext = with_extracted_text(pages).select("url", "text", "extracted_text")
    for r in ext.collect():
        # deterministic per url and contains the body text
        assert r["text"] in r["extracted_text"]
    # byte-identical across runs (input_hint invariant)
    a = {r["url"]: r["extracted_text"] for r in ext.collect()}
    b = {
        r["url"]: r["extracted_text"]
        for r in with_extracted_text(generate_pages(spark, 50, seed=42)).collect()
    }
    assert a == b


def _caps():
    from pg_textsearch_spark.sources import multimodal

    return multimodal.decode_capabilities(refresh=True)


def test_decode_capability_probe_shape():
    caps = _caps()
    assert set(caps) == {"image", "audio", "video"}
    assert all(isinstance(v, bool) for v in caps.values())


def test_decode_real_path_taken_when_capable(monkeypatch):
    """When the probe reports a capability, _decode_payload must route
    to the REAL decoder (and must NOT swallow its errors) — asserted
    by injecting a fake decoder, independent of what this container
    ships."""
    from pg_textsearch_spark.sources import multimodal

    marker = np.arange(multimodal.FEATURE_DIM, dtype=np.float64)
    monkeypatch.setattr(multimodal, "_CAPS_CACHE",
                        {"image": True, "audio": False, "video": False})
    monkeypatch.setitem(multimodal._REAL_DECODERS, "image",
                        lambda payload: marker)
    out = multimodal._decode_payload(b"\x01\x02", "image")
    assert np.array_equal(out, marker)

    def boom(payload):
        raise ValueError("bad image bytes")

    monkeypatch.setitem(multimodal._REAL_DECODERS, "image", boom)
    with pytest.raises(ValueError, match="bad image bytes"):
        multimodal._decode_payload(b"\x01\x02", "image")
    # the synthetic 'image/bin' mime must NEVER reach the real decoder
    out = multimodal._decode_payload(b"\x01\x02", "image", "image/bin")
    assert len(out) == multimodal.FEATURE_DIM
    # absent capability -> documented deterministic fallback
    monkeypatch.setattr(multimodal, "_CAPS_CACHE",
                        {"image": False, "audio": False, "video": False})
    a = multimodal._decode_payload(b"\x01\x02", "image")
    b = multimodal._decode_payload(b"\x01\x02", "image")
    assert np.array_equal(a, b) and len(a) == multimodal.FEATURE_DIM


@pytest.mark.skipif(not _caps()["image"], reason="PIL not installed")
def test_decode_image_real_pil():
    """Activates automatically in an environment with PIL: a real PNG
    round-trips through the real decoder to its pixel grid."""
    import io

    from PIL import Image

    from pg_textsearch_spark.sources import multimodal

    img = Image.new("L", (8, 4))
    img.putdata(list(range(32)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = multimodal._decode_image_real(buf.getvalue())
    assert out.shape == (multimodal.FEATURE_DIM,)
    assert np.allclose(out, np.arange(32) / 255.0)
