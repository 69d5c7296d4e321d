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
