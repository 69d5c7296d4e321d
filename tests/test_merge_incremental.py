"""Build-mode invariance + merge correctness (SURVEY.md §5 plan (e)):
bulk build == incremental segments == merged segments, exactly —
the reference's scoring1..6.sql pin the same invariant."""

import shutil

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.index.builder import build_index
from pg_textsearch_spark.index.merge import force_merge, maybe_compact
from pg_textsearch_spark.operators.bmw import topk_bmw
from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
from pg_textsearch_spark.streaming.incremental import insert_batch

QUERIES = ["spark query table", "window", "join join merge"]


def _results(idx, q, k=10):
    return [(r["rank"], r["doc_id"], round(r["score"], 9))
            for r in topk_exhaustive(idx, q, k).collect()]


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = tmp_path_factory.mktemp("modes")

    bulk_dir = str(base / "bulk")
    build_index(spark, docs, bulk_dir, config="ascii", n_buckets=8)

    inc_dir = str(base / "inc")
    shutil.rmtree(inc_dir, ignore_errors=True)
    # 4 ordered batches of 125 docs each, no compaction -> 4 segments
    for lo in range(0, 500, 125):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 125)
        ).withColumn("key", F.col("doc_id")).drop("doc_id")
        insert_batch(
            spark, inc_dir, batch, text_col="text", key_col="key",
            compact=False, config="ascii", n_buckets=8,
        )
        # bootstrap config for the first batch
        if lo == 0:
            import json, os
            with open(f"{inc_dir}/manifest.json") as f:
                m = json.load(f)
            assert m["segments"][0]["seg_id"] == 0
    return spark, bulk_dir, inc_dir


def test_incremental_has_four_segments(corpora):
    spark, _bulk, inc = corpora
    idx = BM25Index(spark, inc)
    assert len(idx.manifest["segments"]) == 4
    assert idx.num_docs == 500


def test_corpus_stats_invariant(corpora):
    spark, bulk, inc = corpora
    a, b = BM25Index(spark, bulk), BM25Index(spark, inc)
    assert a.num_docs == b.num_docs
    assert a.total_tokens == b.total_tokens


@pytest.mark.parametrize("q", QUERIES)
def test_bulk_vs_incremental_exact(corpora, q):
    spark, bulk, inc = corpora
    assert _results(BM25Index(spark, bulk), q) == _results(BM25Index(spark, inc), q)


@pytest.mark.parametrize("q", QUERIES)
def test_force_merge_preserves_results(corpora, q):
    spark, bulk, inc = corpora
    idx = BM25Index(spark, inc)
    before = _results(idx, q)
    force_merge(idx)
    merged = BM25Index(spark, inc)
    assert len(merged.manifest["segments"]) == 1
    assert _results(merged, q) == before
    assert _results(merged, q) == _results(BM25Index(spark, bulk), q)


def test_bmw_over_multi_segment(spark, tmp_path_factory):
    # BMW must handle cursors from multiple segments of the same run
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("multiseg") / "idx")
    for lo in range(0, 500, 250):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 250)
        ).withColumn("key", F.col("doc_id")).drop("doc_id")
        insert_batch(spark, d, batch, key_col="key", compact=False, config="ascii", n_buckets=8)
    idx = BM25Index(spark, d)
    assert len(idx.manifest["segments"]) == 2
    for q in QUERIES:
        exh = topk_exhaustive(idx, q, 10).collect()
        bmw = topk_bmw(idx, q, 10).collect()
        for e, w in zip(exh, bmw):
            assert abs(e["score"] - w["score"]) <= 1e-3


def test_leveled_compaction_policy(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("lsm") / "idx")
    # 4 batches with fan_in=2: expect compaction to kick in
    for lo in range(0, 500, 125):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 125)
        ).withColumn("key", F.col("doc_id")).drop("doc_id")
        insert_batch(spark, d, batch, key_col="key", compact=True, fan_in=2, config="ascii", n_buckets=8)
    idx = BM25Index(spark, d)
    assert len(idx.manifest["segments"]) < 4
    assert idx.num_docs == 500
    # results identical to a bulk build
    bulk_dir = str(tmp_path_factory.mktemp("lsm") / "bulk")
    build_index(spark, docs, bulk_dir, config=idx.config,
                n_buckets=idx.n_buckets)
    for q in QUERIES:
        assert _results(idx, q) == _results(BM25Index(spark, bulk_dir), q)


def test_mixed_keymap_merge_preserves_partial_keymap(spark, tmp_path):
    """Regression (round-3 ADVICE, medium): merging a keymap-built
    segment with a non-keymap segment must CARRY the partial keymap —
    the round-2 all() check skipped the merged write and then reclaimed
    the source keymap files, permanently destroying the mapping."""
    from pg_textsearch_spark.index.merge import force_merge

    d = str(tmp_path / "mixed")
    keyed = spark.createDataFrame(
        [(f"u{i}", f"alpha beta doc{i}") for i in range(40)],
        "url string, text string",
    )
    build_index(spark, keyed, d, key_col="url", config="ascii", n_buckets=4)
    unkeyed = spark.createDataFrame(
        [(1000 + i, f"gamma delta doc{i}") for i in range(20)],
        "doc_id long, text string",
    )
    insert_batch(spark, d, unkeyed, doc_id_col="doc_id", compact=False)

    idx = BM25Index(spark, d)
    assert len(idx.manifest["segments"]) == 2
    force_merge(idx)
    idx = BM25Index(spark, d)
    assert len(idx.manifest["segments"]) == 1
    # the merged segment still carries the keyed docs' mapping
    res = topk_exhaustive(idx, "alpha", k=5)
    resolved = idx.resolve_keys(res).collect()
    assert all(r["doc_key"].startswith("u") for r in resolved)
    # unkeyed docs resolve to NULL, not an error
    res2 = topk_exhaustive(idx, "gamma", k=5)
    resolved2 = idx.resolve_keys(res2).collect()
    assert resolved2 and all(r["doc_key"] is None for r in resolved2)


def test_update_docs_replaces_versions(spark, tmp_path):
    """UPDATE analog (reference test/sql/updates.sql): old version
    dead immediately, new version scored, resolve_keys follows the
    newest doc_id; a second update and a vacuum keep the invariant."""
    from pg_textsearch_spark.index.builder import build_index
    from pg_textsearch_spark.index.deletes import vacuum
    from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
    from pg_textsearch_spark.streaming.incremental import update_docs

    d = str(tmp_path / "upd")
    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog"),
        ("u2", "postgresql is a powerful database system"),
        ("u3", "full text search with ranking is efficient"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    build_index(spark, docs, d, key_col="url", text_col="text",
                config="ascii", n_buckets=4)
    idx = BM25Index(spark, d)
    assert idx.num_docs == 3

    # update u2's content (updates.sql: simple UPDATE)
    upd = spark.createDataFrame(
        [("u2", "postgresql is an advanced relational database")],
        "url string, text string",
    )
    update_docs(idx, upd, key_col="url", text_col="text")
    assert idx.num_docs == 3  # one dead + one new
    got = topk_exhaustive(idx, "advanced relational", k=3).collect()
    assert len(got) == 1
    resolved = idx.resolve_keys(
        topk_exhaustive(idx, "advanced relational", k=3)
    ).collect()
    assert resolved[0]["doc_key"] == "u2"
    # the old wording no longer matches anything
    assert topk_exhaustive(idx, "powerful", k=3).count() == 0

    # upsert: one changed row + one brand-new key in the same batch
    batch = spark.createDataFrame(
        [("u1", "the quick red fox sprints"), ("u4", "a brand new page")],
        "url string, text string",
    )
    update_docs(idx, batch, key_col="url", text_col="text")
    assert idx.num_docs == 4
    r = idx.resolve_keys(topk_exhaustive(idx, "sprints", k=2)).collect()
    assert [x["doc_key"] for x in r] == ["u1"]
    assert topk_exhaustive(idx, "brand", k=2).count() == 1

    # vacuum reclaims the dead versions; results unchanged
    vacuum(idx)
    idx2 = BM25Index(spark, d)
    assert idx2.num_docs == 4
    assert not idx2.has_deletes()
    r = idx2.resolve_keys(topk_exhaustive(idx2, "sprints", k=2)).collect()
    assert [x["doc_key"] for x in r] == ["u1"]
    assert topk_exhaustive(idx2, "powerful", k=3).count() == 0
