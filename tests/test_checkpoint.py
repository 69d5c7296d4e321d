"""Resumable build: interrupt after 2 of 4 batches, resume, verify
results identical to a one-shot bulk build and that completed batches
are not rebuilt (north_rule: per-partition lineage + metrics)."""

import json
import os

import pytest

from pg_textsearch_spark.index.builder import build_index
from pg_textsearch_spark.index.checkpoint import CheckpointedBuild
from pg_textsearch_spark.index.maintenance import describe_index
from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive


def _res(idx, q):
    return [(r["rank"], r["doc_id"], round(r["score"], 9))
            for r in topk_exhaustive(idx, q, 10).collect()]


def test_checkpointed_build_resumes(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "ckpt_idx")

    cb = CheckpointedBuild(spark, d)
    state1 = cb.run(docs, n_batches=4, config="ascii", n_buckets=8,
                    input_desc="sf0.001/documents", max_batches_this_run=2)
    assert len(state1["completed"]) == 2
    assert state1["pending"] == [2, 3]
    # lineage + metrics recorded per batch
    for rec in state1["completed"].values():
        assert rec["num_docs"] > 0
        assert rec["num_postings"] > 0
        assert rec["total_tokens"] > 0
        assert "doc_id_range" in rec

    finished = {
        k: v["finished_at_unix"] for k, v in state1["completed"].items()
    }

    # resume (fresh driver object, as a restarted job would)
    cb2 = CheckpointedBuild(spark, d)
    state2 = cb2.run(docs, n_batches=4, config="ascii", n_buckets=8,
                     input_desc="sf0.001/documents")
    assert state2["pending"] == []
    assert len(state2["completed"]) == 4
    # first two batches were not rebuilt
    for k, ts in finished.items():
        assert state2["completed"][k]["finished_at_unix"] == ts

    idx = BM25Index(spark, d)
    info = describe_index(idx)
    assert info["num_segments"] == 4
    assert info["num_docs"] == 500

    bulk_dir = str(tmp_path / "bulk_idx")
    build_index(spark, docs, bulk_dir, config="ascii", n_buckets=8)
    bulk = BM25Index(spark, bulk_dir)
    for q in ["spark query table", "window", "join join merge"]:
        assert _res(idx, q) == _res(bulk, q)


def test_checkpoint_boundaries_stable(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "idx")
    cb = CheckpointedBuild(spark, d)
    cb.run(docs, n_batches=3, config="ascii", n_buckets=8,
           max_batches_this_run=1)
    with open(os.path.join(d, "build_checkpoint.json")) as f:
        b1 = json.load(f)["boundaries"]
    cb.run(docs, n_batches=3, config="ascii", n_buckets=8)
    with open(os.path.join(d, "build_checkpoint.json")) as f:
        b2 = json.load(f)["boundaries"]
    assert b1 == b2
