"""Structured Streaming ingestion: file stream -> foreachBatch ->
insert_batch (the memtable/spill analog wired to a real stream,
SURVEY.md §2.2 B8/B9)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
from pg_textsearch_spark.shipping import ensure_shipped
from pg_textsearch_spark.streaming.incremental import insert_batch


def test_stream_ingest_matches_bulk(spark, tmp_path):
    ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # three arrival files, ordered by doc_id ranges
    for i, lo in enumerate((0, 200, 400)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 200)) \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/batch={i}")

    idx_dir = str(tmp_path / "stream_idx")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch=*")
    )

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        insert_batch(
            spark,
            idx_dir,
            batch_df.withColumn("key", F.col("doc_id")).drop("doc_id"),
            key_col="key",
            compact=False,
            config="ascii",
            n_buckets=8,
            lineage={"stream_batch": batch_id},
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    idx = BM25Index(spark, idx_dir)
    assert idx.num_docs == 500
    assert len(idx.manifest["segments"]) >= 2
    # streaming arrival order within files is doc_id-ordered, so the
    # index must equal the bulk build exactly
    from pg_textsearch_spark.index.builder import build_index

    bulk = str(tmp_path / "bulk")
    build_index(spark, docs, bulk, config="ascii", n_buckets=8)
    for query in ["spark query table", "window"]:
        a = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in topk_exhaustive(idx, query, 10).collect()]
        b = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in topk_exhaustive(BM25Index(spark, bulk), query, 10).collect()]
        assert a == b
    # lineage recorded per stream batch
    with open(os.path.join(idx_dir, "manifest.json")) as f:
        m = json.load(f)
    assert all("stream_batch" in s["lineage"] for s in m["segments"])


def test_streaming_dedup_exact_state_across_batches(spark, tmp_path):
    # custom stateful streaming operator (applyInPandasWithState):
    # duplicate texts must be flagged ACROSS micro-batches (keyed state
    # survives the trigger boundary), first occurrence wins
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_textsearch_spark.streaming.dedup_stream import (
        streaming_dedup_exact,
    )

    ensure_shipped(spark)
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: text A twice (ids 1, 3) + text B once (id 2)
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": ["aaa", "bbb", "aaa"]}),
        str(src / "b1.parquet"),
    )
    time.sleep(1.1)  # file-source orders micro-batches by mod time
    # batch 2: text A again (id 10, dup via STATE) + new text C (id 11)
    pq.write_table(
        pa.table({"doc_id": [10, 11], "text": ["aaa", "ccc"]}),
        str(src / "b2.parquet"),
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the cross-batch claim is only proven if the two files really ran
    # as two separate triggers (state crossed a batch boundary)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, [p["numInputRows"] for p in q.recentProgress]
    rows = {
        r["doc_id"]: r["is_duplicate"]
        for r in spark.table("dedup_stream_test").collect()
    }
    assert rows == {1: False, 2: False, 3: True, 10: True, 11: False}, rows
