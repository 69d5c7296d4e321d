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

from pg_textsearch_spark.functions.fieldnorm import FIELDNORM_DECODE_TABLE
from pg_textsearch_spark.index.builder import IndexWriter, RUN_SHIFT
from pg_textsearch_spark.operators.topk import (
    BM25Index,
    decode_postings_flat,
)


def _deletes_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def _dead_dfs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "dead_dfs")


def delete_docs(index: BM25Index, doc_ids: DataFrame | list[int]) -> dict:
    """Mark doc_ids deleted (tp_bulkdelete analog). Appends to the
    deletes table, records per-term dead doc counts, and updates
    manifest-level dead stats.

    The per-term counts (``dead_dfs`` table) are the delete-time
    amortization of IDF correction: one run-pruned postings decode per
    delete BATCH writes (term, dead_df) rows, and every subsequent
    query corrects doc_freq with a tiny dictionary-style lookup instead
    of decoding its terms' full posting lists (head terms made that
    per-query correction expensive between vacuums). The decode is
    pruned by ``run IN (dead runs)`` — a dead doc only affects posting
    rows of its own 2^RUN_SHIFT range, so a small delete batch touches
    a small fraction of the postings table.
    """
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
    # one collect; everything downstream works from this snapshot so a
    # non-deterministic input can't diverge between the stats pass and
    # the table write (delete batches are small by policy — vacuum
    # before they grow)
    eff_rows = eff.select("doc_id", "fieldnorm").collect()
    n_dead = len(eff_rows)
    # quantized-length correction for the dead docs (merge.c:842-866)
    dead_tokens = int(
        sum(int(FIELDNORM_DECODE_TABLE[int(r["fieldnorm"])]) for r in eff_rows)
    )
    dead_ids = [int(r["doc_id"]) for r in eff_rows]
    if dead_ids:
        eff_df = spark.createDataFrame([(i,) for i in dead_ids], "doc_id bigint")
        eff_df.write.mode("append").parquet(_deletes_path(index.index_dir))
        # per-term dead counts: decode only posting rows in the dead
        # docs' runs, count hits per term
        runs = sorted({i >> RUN_SHIFT for i in dead_ids})
        hit = index.postings().filter(F.col("run").isin(runs))
        per_term = (
            decode_postings_flat(hit)
            .select("term", "doc_id")
            .join(F.broadcast(eff_df), "doc_id")
            .groupBy("term")
            .agg(F.count("*").alias("dead_df"))
        )
        per_term.write.mode("append").parquet(_dead_dfs_path(index.index_dir))

    writer = IndexWriter(index.index_dir)
    manifest = writer.read_manifest()
    manifest["deleted_docs"] = manifest.get("deleted_docs", 0) + n_dead
    manifest["deleted_tokens_quantized"] = manifest.get(
        "deleted_tokens_quantized", 0
    ) + dead_tokens
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
    # clear the deletes table, per-term dead counts, and counters
    import shutil

    shutil.rmtree(_deletes_path(index.index_dir), ignore_errors=True)
    shutil.rmtree(_dead_dfs_path(index.index_dir), ignore_errors=True)
    writer = IndexWriter(index.index_dir)
    manifest = writer.read_manifest()
    manifest["deleted_docs"] = 0
    manifest["deleted_tokens_quantized"] = 0
    writer._commit_manifest(manifest)
    index.manifest = manifest
    return manifest
