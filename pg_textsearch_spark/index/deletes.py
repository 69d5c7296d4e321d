"""Deletes + vacuum: the alive-bitset / bulkdelete path.

Reference semantics: deleted docs are marked in a per-segment alive
bitset (V5 format) and skipped during scoring (bmw.c:542-548,
1580-1585, src/segment/alive_bitset.c); compaction physically drops
dead postings and corrects ``total_tokens`` by the *quantized* length
of each dead doc (merge.c:842-866); VACUUM reclaims space
(src/access/vacuum.c).

Spark model: an append-only ``deletes`` table of doc_ids next to the
manifest (the bitset), consulted by both scoring paths as an anti-join
/ broadcast filter; ``vacuum`` rewrites segments without dead docs and
clears the table — the reference's bulkdelete+compaction collapsed
into one job. Corpus stats follow the reference exactly: N excludes
deleted docs, ``total_tokens`` subtracts decode(encode(dl)) per dead
doc (the quantized correction — raw lengths are no longer known to
the reference at delete time, and we reproduce that semantic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_textsearch_spark.index.builder import IndexWriter
from pg_textsearch_spark.operators.topk import (
    BM25Index,
    _fieldnorm_decode_expr,
)


def _deletes_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def delete_docs(index: BM25Index, doc_ids: DataFrame | list[int]) -> dict:
    """Mark doc_ids deleted (tp_bulkdelete analog). Appends to the
    deletes table and updates manifest-level dead stats."""
    spark = index.spark
    if isinstance(doc_ids, list):
        doc_ids = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id bigint"
        )
    new_del = doc_ids.select(F.col("doc_id").cast("bigint"))
    # only docs that exist and are not already deleted count
    existing = index.doclen().select("doc_id", "fieldnorm")
    already = index.deleted_ids()
    eff = new_del.join(existing, "doc_id").join(already, "doc_id", "left_anti")
    # quantized-length correction for the dead docs (merge.c:842-866)
    stats = eff.select(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(_fieldnorm_decode_expr(F.col("fieldnorm"))), F.lit(0.0)
        ).alias("dead_tokens"),
    ).collect()[0]
    eff.select("doc_id").write.mode("append").parquet(_deletes_path(index.index_dir))

    writer = IndexWriter(index.index_dir)
    manifest = writer.read_manifest()
    manifest["deleted_docs"] = manifest.get("deleted_docs", 0) + int(stats["n"])
    manifest["deleted_tokens_quantized"] = manifest.get(
        "deleted_tokens_quantized", 0
    ) + int(stats["dead_tokens"])
    writer._commit_manifest(manifest)
    index.manifest = manifest
    return manifest


def vacuum(index: BM25Index) -> dict:
    """Physically drop dead docs: rewrite every segment's postings and
    doclen without them, reset delete stats (bulkdelete + compaction
    collapsed; reference: vacuum.c:832-1290)."""
    spark = index.spark
    dead = index.deleted_ids()
    if dead.isEmpty():
        return index.manifest
    from pg_textsearch_spark.index.merge import merge_segments

    seg_ids = [s["seg_id"] for s in index.manifest["segments"]]
    new_id = max(seg_ids) + 1
    # merge_segments decodes + regroups; the dead filter rides the
    # decoded stream via a pre-registered anti-join hook
    manifest = merge_segments(index, seg_ids, new_id, drop_doc_ids=dead)
    # clear the deletes table + counters
    import shutil

    shutil.rmtree(_deletes_path(index.index_dir), ignore_errors=True)
    writer = IndexWriter(index.index_dir)
    manifest = writer.read_manifest()
    manifest["deleted_docs"] = 0
    manifest["deleted_tokens_quantized"] = 0
    writer._commit_manifest(manifest)
    index.manifest = manifest
    return manifest
