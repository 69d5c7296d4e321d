"""Hybrid BM25+vector RRF fusion (operators/hybrid.py)."""

import math

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.index.builder import build_index
from pg_textsearch_spark.operators.hybrid import (
    DEFAULT_RRF_K0,
    hybrid_rrf_topk,
    rrf_fuse,
)
from pg_textsearch_spark.operators.knn import knn_bruteforce
from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
from pg_textsearch_spark.shipping import ensure_shipped

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def hy(spark, tmp_path_factory):
    ensure_shipped(spark)
    docs = spark.read.parquet(DOCS)
    d = str(tmp_path_factory.mktemp("hy") / "idx")
    build_index(spark, docs, d, config="english", n_buckets=8)
    return BM25Index(spark, d), spark.read.parquet(EMB)


def test_rrf_matches_manual_fusion(hy):
    idx, emb = hy
    qtext = "spark query table"
    qvec = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    got = hybrid_rrf_topk(
        idx, qtext, qvec, emb=emb, k=10, candidates=30
    ).collect()
    # manual fusion from the two constituent operators, re-ranked on
    # rounded scores exactly like the operator (reproducible fusion)
    trows = sorted(
        topk_exhaustive(idx, qtext, k=30 + 16).collect(),
        key=lambda r: (-round(r["score"], 4), r["doc_id"]),
    )[:30]
    trank = {r["doc_id"]: i + 1 for i, r in enumerate(trows)}
    qdf = idx.spark.createDataFrame(
        [(0, [float(x) for x in qvec])],
        "query_id long, query_vec array<double>",
    )
    vrows = sorted(
        knn_bruteforce(emb, qdf, k=30 + 16).collect(),
        key=lambda r: (-round(r["cos"], 6), r["vec_id"]),
    )[:30]
    vrank = {r["vec_id"]: i + 1 for i, r in enumerate(vrows)}
    scores = {}
    for d, r in trank.items():
        scores[d] = scores.get(d, 0.0) + 1.0 / (DEFAULT_RRF_K0 + r)
    for d, r in vrank.items():
        scores[d] = scores.get(d, 0.0) + 1.0 / (DEFAULT_RRF_K0 + r)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"]) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["rrf"], s, rel_tol=1e-12)
    # a doc present in BOTH rankings outranks equal-depth single-side
    both = [d for d in trank if d in vrank]
    if both:
        assert got[0]["rrf"] >= 1.0 / (DEFAULT_RRF_K0 + 1)


def test_rrf_with_ann_index(hy, tmp_path_factory):
    # the scale path: same fusion over the materialized ANN index;
    # self-query puts the query's own doc first on the vector side
    from pg_textsearch_spark.index.ann import build_ann_index

    idx, emb = hy
    d = str(tmp_path_factory.mktemp("hyann") / "aidx")
    ann = build_ann_index(idx.spark, emb, d, n_lists=8, n_bits=16, bands=8)
    qvec = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    got = hybrid_rrf_topk(
        idx, "window join", qvec, ann_index=ann, k=10, candidates=20
    ).collect()
    assert len(got) == 10
    assert got == sorted(got, key=lambda r: r["rank"])
    # vec 7 is its own nearest neighbor -> rank-1 vector contribution
    assert any(r["doc_id"] == 7 for r in got)


def test_rrf_fuse_three_rankings(spark):
    # fusion is N-ary, not just text+vector
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    c = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b, c], k=3).collect()}
    k0 = DEFAULT_RRF_K0
    for d in (1, 2, 3):
        assert math.isclose(
            got[d], 1.0 / (k0 + 1) + 1.0 / (k0 + 2), rel_tol=1e-12
        )


def test_rrf_boundary_ties_deepen_past_pad(spark, tmp_path_factory):
    """Advisor r4: when more docs than the fetch pad tie at the
    rounded candidate cut, the side fetch must deepen until the top-c
    membership equals the full-corpus rounded ranking."""
    import numpy as np

    ensure_shipped(spark)
    n = 40
    rows = [(i, "tie alpha", [float((i % 7) + 1), 1.0, 0.5]) for i in range(n)]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(i, v) for i, _, v in rows], "vec_id long, embedding array<float>"
    )
    d = str(tmp_path_factory.mktemp("hytie") / "idx")
    build_index(spark, docs, d, config="ascii", n_buckets=4)
    idx = BM25Index(spark, d)
    qvec = [1.0, 1.0, 0.5]
    # c + initial pad = 8 + 16 = 24 < 40 tied docs on the text side
    got = hybrid_rrf_topk(
        idx, "tie", qvec, emb=emb, k=5, candidates=8
    ).collect()
    # oracle: full-corpus constituent rankings, rounded + id tie-break
    trows = sorted(
        topk_exhaustive(idx, "tie", k=n).collect(),
        key=lambda r: (-round(r["score"], 4), r["doc_id"]),
    )[:8]
    qdf = spark.createDataFrame(
        [(0, qvec)], "query_id long, query_vec array<double>"
    )
    vrows = sorted(
        knn_bruteforce(emb, qdf, k=n).collect(),
        key=lambda r: (-round(r["cos"], 6), r["vec_id"]),
    )[:8]
    scores = {}
    for i, r in enumerate(trows):
        scores[r["doc_id"]] = scores.get(r["doc_id"], 0.0) + 1.0 / (
            DEFAULT_RRF_K0 + i + 1
        )
    for i, r in enumerate(vrows):
        scores[r["vec_id"]] = scores.get(r["vec_id"], 0.0) + 1.0 / (
            DEFAULT_RRF_K0 + i + 1
        )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["rrf"], s, rel_tol=1e-12)
