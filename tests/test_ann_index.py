"""Materialized ANN index (index/ann.py): build-once semantics,
partition-pruned query plans with zero query-time Python, recall vs
brute force, and build determinism.

The round-2 verdict's top item: the ad-hoc operators/knn.py ANN paths
re-fit and re-assigned the corpus per call. These tests pin the fixed
contract — query plans read only the probed partitions and contain no
Python eval node (the assignment UDF runs only at build time).
"""

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.index.ann import (
    ANNIndex,
    ann_ivf_topk,
    ann_lsh_topk,
    build_ann_index,
)
from pg_textsearch_spark.operators.knn import knn_bruteforce
from pg_textsearch_spark.plans.explain import (
    assert_partition_filter,
    assert_pushed_filter,
    formatted_plan,
)
from pg_textsearch_spark.shipping import ensure_shipped

EMB = "/root/testdata/sf0.001/embeddings.parquet"

#: physical-plan node names that mean "Python ran at query time"
_PY_NODES = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
             "FlatMapGroupsInPandas")


@pytest.fixture(scope="module")
def ann(spark, tmp_path_factory):
    ensure_shipped(spark)
    emb = spark.read.parquet(EMB)
    d = str(tmp_path_factory.mktemp("ann") / "idx")
    return build_ann_index(
        spark, emb, d, n_lists=8, n_bits=16, bands=8, seed=11
    )


@pytest.fixture(scope="module")
def queries(spark):
    return (
        spark.read.parquet(EMB)
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def test_ivf_recall_and_self_hit(spark, ann, queries):
    bf = knn_bruteforce(spark.read.parquet(EMB), queries, k=5).collect()
    ivf = ann_ivf_topk(ann, queries, k=5, n_probe=3).collect()
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf}
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf}
    assert len(bf_set & ivf_set) / len(bf_set) >= 0.5
    for r in ivf:
        if r["rank"] == 1:  # own list is always probed -> self at cos 1
            assert r["vec_id"] == r["query_id"]


def test_ivf_query_plan_prunes_partitions_and_runs_no_python(
    ann, queries
):
    res = ann_ivf_topk(ann, queries, k=5, n_probe=3)
    plan = formatted_plan(res)
    # the verdict's contract: no corpus-wide assignment UDF at query
    # time — the only Python in the plan would be an Eval/Pandas node
    for node in _PY_NODES:
        assert node not in plan, f"{node} in query plan:\n{plan}"
    # candidate scan is partition-pruned on list_id
    assert_partition_filter(res, "list_id")


def test_ivf_probe_scan_reads_only_probed_lists(ann):
    scan = ann.probe_scan([0, 3])
    assert_partition_filter(scan, "list_id")
    got = {r["list_id"] for r in scan.select("list_id").distinct().collect()}
    assert got <= {0, 3} and got


def test_lsh_recall_plan_and_self_hit(spark, ann, queries):
    bf = knn_bruteforce(spark.read.parquet(EMB), queries, k=5).collect()
    res = ann_lsh_topk(ann, queries, k=5)
    plan = formatted_plan(res)
    for node in _PY_NODES:
        assert node not in plan, f"{node} in query plan:\n{plan}"
    assert_partition_filter(res, "band")
    assert_pushed_filter(res, "bits")
    rows = res.collect()
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf}
    got = {(r["query_id"], r["vec_id"]) for r in rows}
    assert len(bf_set & got) / len(bf_set) >= 0.5
    for r in rows:
        if r["rank"] == 1:  # identical sketch -> always a candidate
            assert r["vec_id"] == r["query_id"]


def test_build_is_deterministic(spark, ann, queries, tmp_path_factory):
    emb = spark.read.parquet(EMB)
    d2 = str(tmp_path_factory.mktemp("ann2") / "idx")
    ann2 = build_ann_index(
        spark, emb, d2, n_lists=8, n_bits=16, bands=8, seed=11
    )
    a = sorted(
        tuple(r)
        for r in ann.vectors().select("vec_id", "list_id", "sketch").collect()
    )
    b = sorted(
        tuple(r)
        for r in ann2.vectors().select("vec_id", "list_id", "sketch").collect()
    )
    assert a == b
    r1 = sorted(tuple(r) for r in ann_ivf_topk(ann, queries, k=5).collect())
    r2 = sorted(tuple(r) for r in ann_ivf_topk(ann2, queries, k=5).collect())
    assert r1 == r2


def test_handle_reload_and_manifest(spark, ann):
    idx = ANNIndex(spark, ann.index_dir)
    assert idx.manifest["num_vectors"] > 0
    assert idx.centroids.shape == (idx.n_lists, idx.manifest["dim"])
    # centroids are unit-norm (spherical k-means)
    import numpy as np

    norms = np.linalg.norm(idx.centroids, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-9)


def test_append_delta_segment_found_without_rebuild(
    spark, tmp_path_factory
):
    # build over the first half of the corpus, append the second half
    # as a delta (same centroids), and require: (a) delta vectors are
    # reachable through BOTH query paths with zero rebuild, (b) a
    # probed self-query on a delta vector still self-hits at rank 1,
    # (c) manifest stats cover base + delta.
    from pg_textsearch_spark.index.ann import ann_append

    ensure_shipped(spark)
    emb = spark.read.parquet(EMB)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path_factory.mktemp("annappend") / "idx")
    idx = build_ann_index(
        spark, half, d, n_lists=8, n_bits=16, bands=8, seed=11
    )
    n_half = idx.manifest["num_vectors"]
    idx = ann_append(spark, idx, rest)
    assert idx.segments == [0, 1]
    assert idx.manifest["num_vectors"] == emb.count()
    assert idx.manifest["num_vectors"] > n_half
    delta_queries = (
        rest.filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    ivf = ann_ivf_topk(idx, delta_queries, k=3, n_probe=3).collect()
    assert ivf, "delta vectors unreachable via IVF"
    for r in ivf:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]
    lsh = ann_lsh_topk(idx, delta_queries, k=3).collect()
    got = {(r["query_id"], r["vec_id"]) for r in lsh}
    for qid in {r["query_id"] for r in lsh}:
        assert (qid, qid) in got  # identical sketch -> self always hits
    # reload from disk: the manifest alone reconstructs the view
    idx2 = ANNIndex(spark, d)
    assert idx2.segments == [0, 1]
    assert idx2.vectors().count() == emb.count()


def test_append_validates_delta(spark, ann, tmp_path_factory):
    # advisor r4: dim mismatch and duplicate delta ids must fail
    # loudly up front, not deep in the assign UDF / silently
    from pg_textsearch_spark.index.ann import ann_append

    emb = spark.read.parquet(EMB)
    bad_dim = emb.limit(2).select(
        "vec_id", F.slice("embedding", 1, 3).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        ann_append(spark, ann, bad_dim)
    dup = emb.limit(1).union(emb.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        ann_append(spark, ann, dup)
    # re-appending already-indexed ids is caught only under the
    # opt-in scan (the default documents the caller-dedupes contract)
    with pytest.raises(ValueError, match="already"):
        ann_append(spark, ann, emb.limit(3), validate_ids=True)
    # empty delta is a no-op, not a new segment
    assert ann_append(spark, ann, emb.limit(0)).segments == ann.segments
