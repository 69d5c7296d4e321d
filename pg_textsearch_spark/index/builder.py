"""Distributed inverted-index build — the reference's CREATE INDEX path.

Maps pg_textsearch's parallel build (workers tokenize disjoint heap
block ranges, leader N-way merges sorted terms; reference:
src/access/build_parallel.c:476-914) onto Spark's native model: the
"workers" are input partitions, the "leader merge" IS the
term-partitioned shuffle, and segments are partitioned Parquet
directories (Iceberg tables in production — same logical schema).

Logical schema (SURVEY.md §1.5):
- ``postings(term, run, df_run, num_blocks, blocks[])`` bucketed by
  ``crc32(term) % n_buckets`` for query-time file pruning (the role of
  the segment dictionary's binary search, reference:
  src/segment/scan.c:579-688);
- ``doclen(doc_id, doc_len, fieldnorm)`` (the fieldnorm table,
  reference: src/segment/docmap.c:42-212) plus, for key_col-built
  indexes, ``keymap(doc_id, doc_key)`` (the ctid map: resolves
  results back to source rows, reference: segment.c:1270-1288);
- manifest.json: corpus stats + segment lineage (the metapage,
  reference: src/index/metapage.h:30-106).

Skew handling (explicit per north_rule): posting lists are built per
``(term, run)`` where ``run = doc_id >> RUN_SHIFT``. A head term's
postings therefore shard into many independent groups — no single
reducer ever owns a stopword-adjacent term's full posting list. Runs
hold disjoint, ordered doc_id ranges, so a term's posting list is the
ordered concatenation of its runs (the reference's disjoint-source
merge fast path, reference: src/segment/merge.c:748-769), and
query-time scoring treats runs independently.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel
from pyspark.sql.functions import pandas_udf

from pg_textsearch_spark.functions import bm25
from pg_textsearch_spark.functions.fieldnorm import encode_fieldnorm
from pg_textsearch_spark.functions.tokenizer import get_config
from pg_textsearch_spark.index.blocks import BLOCKS_SCHEMA, build_blocks

#: docs per run: 2^13 = 8192. Caps any (term, run) posting group at 8192
#: entries (64 blocks) regardless of term skew — the salting knob from
#: SURVEY.md §4. A stopword-grade term shards into one group per run,
#: spreading across reducers, while a rare term still occupies a single
#: group; runs hold disjoint ordered doc ranges so a term's posting
#: list is the ordered concatenation of its runs (reference merge
#: disjoint fast path, merge.c:748-769). Measured on 100k synthetic
#: pages: the posting-build stage went from 1.3x to near-linear scaling
#: when head terms stopped being single groups.
RUN_SHIFT = 13

DEFAULT_N_BUCKETS = 16


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side bucket of a term; must equal the Spark-side expr."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_expr(term_col, n_buckets: int):
    """JVM-side bucket expr — F.crc32 == zlib.crc32 on utf-8 bytes."""
    return F.pmod(F.crc32(term_col.cast("string")), F.lit(n_buckets)).cast("int")


def _fieldnorm_udf():
    # NOT the JVM fieldnorm_encode_col expression: higher-order
    # array functions (filter/aggregate) are interpreted, which
    # disables whole-stage codegen for the entire projection stage —
    # measured +33% on the 2M-page build because the tokenizer
    # split/filter in the SAME stage loses codegen. The Arrow-batched
    # UDF keeps the JVM stage compiled and costs ~0.4 s per 2M docs.
    @pandas_udf("int")
    def _enc(doc_len: pd.Series) -> pd.Series:
        return pd.Series(
            encode_fieldnorm(doc_len.to_numpy(dtype=np.int64)).astype(np.int32)
        )

    return _enc


_POSTINGS_ROW_SCHEMA = (
    "term string, run bigint, df_run bigint, blocks " + BLOCKS_SCHEMA
)


def _postings_rows(batches, codec: str = "bitpack"):
    """mapInPandas kernel: sorted (term, run, doc_id, tf, fieldnorm)
    stream -> one row per (term, run) with posting blocks.

    Input partitions are hash-partitioned by (term, run) and sorted by
    (term, run, doc_id), so each group is contiguous; a group may span
    Arrow batch boundaries, handled by carrying the tail group over.
    Everything is flat numpy — no per-posting Python objects. This is
    the reference's posting-serialization loop (segment.c:968-1495)
    recast as a vectorized streaming kernel.
    """
    import pandas as pd  # local import: runs on executors

    carry: pd.DataFrame | None = None

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        runs = pdf["run"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        fns = pdf["fieldnorm"].to_numpy()
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (runs[1:] != runs[:-1])
        ) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pdf)]))
        out_t, out_r, out_df, out_b = [], [], [], []
        for s, e in zip(starts, ends):
            gi, gt, gf = ids[s:e], tfs[s:e], fns[s:e]
            if len(gi) > 1 and not np.all(gi[1:] > gi[:-1]):
                # duplicate (term, doc) occurrences from the
                # single-shuffle build: sum their tfs here (the
                # removed groupBy stage, vectorized). fieldnorm is
                # constant per doc -> first occurrence wins.
                uids, first_idx, inv = np.unique(
                    gi, return_index=True, return_inverse=True
                )
                gt = np.bincount(inv, weights=gt).astype(np.int64)
                gf = gf[first_idx]
                gi = uids
            out_t.append(terms[s])
            out_r.append(int(runs[s]))
            out_df.append(int(len(gi)))
            # already sorted by doc_id within the group
            out_b.append(build_blocks(gi, gt, gf, codec))
        return pd.DataFrame(
            {"term": out_t, "run": out_r, "df_run": out_df, "blocks": out_b}
        )

    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if len(pdf) == 0:
            continue
        terms = pdf["term"].to_numpy()
        runs = pdf["run"].to_numpy()
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (runs[1:] != runs[:-1])
        ) + 1
        if len(change) == 0:
            carry = pdf  # whole batch is one (possibly continuing) group
            continue
        last_start = int(change[-1])
        carry = pdf.iloc[last_start:].reset_index(drop=True)
        yield emit(pdf.iloc[:last_start])
    if carry is not None and len(carry):
        yield emit(carry)


def assign_doc_ids(
    df: DataFrame,
    key_col: str,
    out_col: str = "doc_id",
    persisted: list | None = None,
    validate: bool = False,
) -> DataFrame:
    """Dense global doc_ids 0..n-1 in ``key_col`` order, scalably.

    Plays the reference's docmap role: doc_id order == global key order
    (CTID order there, url order here; reference: docmap.c:172-181
    "CTID order = doc_id order"). ``key_col`` values must be unique
    (they play the CTID's role) AND the input plan must be
    DETERMINISTIC under re-evaluation: only the key column is persisted
    through the range shuffle, so ``df`` itself is executed twice (key
    pass + final hash join). A source whose keys change between
    evaluations (rand()/sampled/non-stable generators) would silently
    drop or mis-key documents via the inner join — persist such inputs
    before calling, or pass ``validate=True`` to pay one extra count
    job that fails loudly when the joined row count differs from the
    key count.

    Shape: only the KEY COLUMN goes through the range shuffle — the
    sample pass, the range exchange, and the within-partition sort all
    touch ~n keys, never the document bodies (dragging text through
    repartitionByRange measured ~10 s of an ~46 s 1M-doc build at 8
    cores, and the sample job decoded the text column for nothing).
    The (key, doc_id) table then hash-joins back onto the full rows —
    one text shuffle, same as before, but sort-free. No single-
    partition global window anywhere: ids come from per-partition
    row_number + broadcast partition offsets (tiny collect).

    The ranged key table stays persisted while the caller's actions
    run; pass ``persisted`` (a list the caller unpersists when done) to
    avoid executor-memory creep across many builds in one session.
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    keys = df.select(key_col)  # column-pruned: the scan reads only keys
    ranged = keys.repartitionByRange(n_parts, F.col(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    if persisted is not None:
        persisted.append(ranged)
    counts = {r["_pid"]: r["cnt"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(key_col)
    ids = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("_offset") - 1)
        .drop("_pid", "_offset")
    )
    # SHUFFLE_HASH: a sort-merge join would sort the document bodies by
    # key — exactly the cost this key-only design avoids. The hash
    # table builds from the narrow ids side; the text side streams.
    joined = df.join(ids.hint("SHUFFLE_HASH"), key_col)
    if validate:
        n_keys = sum(counts.values())
        n_joined = joined.count()
        if n_joined != n_keys:
            raise ValueError(
                f"assign_doc_ids: joined row count {n_joined} != key "
                f"count {n_keys} — the input plan re-evaluated "
                f"non-deterministically (or keys are not unique); "
                f"persist the input before calling"
            )
    return joined


def build_segment_dataframes(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    config: str = "english",
    n_buckets: int = DEFAULT_N_BUCKETS,
    codec: str = "bitpack",
    persisted: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """docs(doc_id, text) -> (postings_df, doclen_df) for one segment.

    Shuffle budget (the build's scale story): word-parser configs run
    ONE shuffle end-to-end — the (term, run) repartition feeding the
    block builder. doc_len and fieldnorm are computed per *doc row*
    before the explode (doc_len = surviving-token count; stemming
    never changes the count), so no doc_id-keyed window/join ever
    touches the token table, and the fieldnorm UDF runs once per doc
    instead of once per token. Duplicate (term, doc) occurrences ride
    the shuffle as tf=1 rows and are collapsed by the block-builder
    kernel (map-side volume ~20-30%% higher than pre-aggregated pairs,
    in exchange for dropping the whole groupBy(doc, term) stage — a
    measured win). The posting-list "merge" of the reference's leader
    loop is simply that one shuffle (build_parallel.c:640-838).

    pg-parser configs (typed token classes) run the scanner kernel
    ONCE: it emits unique (doc, term, tf) WITH doc_len/fieldnorm
    computed in-kernel (the kernel holds each whole doc) and a
    term=NULL marker row for empty-tokenizing docs — so doclen is a
    narrow dedup over the same persisted output, and the (term, run)
    repartition is the only full-width shuffle (round 2 spent a window
    shuffle + a fieldnorm UDF stage + an input re-scan here).
    """
    cfg = get_config(config) if isinstance(config, str) else config
    if cfg.parser != "pg":
        return _words_segment_dataframes(
            docs, doc_id_col, text_col, cfg, n_buckets, codec, persisted
        )
    from pg_textsearch_spark.functions.tokenizer import (
        _pg_spark_tokens_with_len,
    )

    tokens = _pg_spark_tokens_with_len(docs, doc_id_col, text_col, cfg)
    tokens = tokens.withColumnRenamed(doc_id_col, "doc_id").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    tokens = tokens.persist(StorageLevel.MEMORY_AND_DISK)
    if persisted is not None:
        persisted.append(tokens)

    # every input doc appears exactly once: real docs via their token
    # rows (constant doc_len per doc), empty/NULL-text docs via their
    # marker row (doc_len 0, fieldnorm encode(0)=0) — the reference's
    # docmap registers every indexed row, so N/avgdl count empty docs
    # too (reference: docmap.c:42-212, bm25.c:155-191)
    doclen = tokens.select("doc_id", "doc_len", "fieldnorm").dropDuplicates(
        ["doc_id"]
    )

    flat = tokens.filter(F.col("term").isNotNull()).select(
        "term",
        F.shiftright("doc_id", RUN_SHIFT).alias("run"),
        "doc_id",
        "tf",
        "fieldnorm",
    )
    return postings_from_flat(flat, n_buckets, codec), doclen


def _words_segment_dataframes(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    cfg,
    n_buckets: int,
    codec: str,
    persisted: list | None,
) -> tuple[DataFrame, DataFrame]:
    """Single-shuffle build for split-regex configs (see caller doc)."""
    from pg_textsearch_spark.functions.tokenizer import (
        _stem_udf,
        raw_tokens_column,
    )

    toks = raw_tokens_column(F.col(text_col), cfg)
    if cfg.stopwords:
        stops = sorted(cfg.stopwords)
        # InSet membership per element — JVM-side, no anti-join needed
        toks = F.filter(toks, lambda t: ~t.isin(stops))
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    base = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"), toks.alias("toks")
    ).withColumn("doc_len", F.size("toks").cast("long"))
    base = base.withColumn("fieldnorm", _fieldnorm_udf()("doc_len"))
    # doc-level rows only (id, toks, len, norm): far lighter to persist
    # than the round-1 token-level table
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    if persisted is not None:
        persisted.append(base)

    # every doc appears, incl. ones tokenizing to nothing (doc_len 0)
    doclen = base.select("doc_id", "doc_len", "fieldnorm")

    tokens = base.select(
        "doc_id", "fieldnorm", F.explode("toks").alias("term")
    )
    if cfg.do_stem:
        tokens = tokens.withColumn("term", _stem_udf(cfg)("term"))
    flat = tokens.select(
        "term",
        F.shiftright("doc_id", RUN_SHIFT).alias("run"),
        "doc_id",
        F.lit(1).cast("int").alias("tf"),
        "fieldnorm",
    )
    return postings_from_flat(flat, n_buckets, codec), doclen


def postings_from_flat(
    flat: DataFrame, n_buckets: int, codec: str = "bitpack"
) -> DataFrame:
    """(term, run, doc_id, tf, fieldnorm) -> posting rows.

    The term-partitioned shuffle: hash by (term, run) — head terms
    shard across reducers by run — then sort within partitions so each
    (term, run) group is a contiguous sorted slice, consumed by the
    columnar mapInPandas block builder. Shared by bulk build, merge,
    and vacuum. ``codec`` selects the block payload encoding
    (bitpack default; varint alternative — see index/codec.py flags)."""
    spark = flat.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def rows(batches):
        yield from _postings_rows(batches, codec)

    return (
        flat.repartition(n_shuffle, "term", "run")
        .sortWithinPartitions("term", "run", "doc_id")
        .mapInPandas(rows, _POSTINGS_ROW_SCHEMA)
        .withColumn("bucket", term_bucket_expr(F.col("term"), n_buckets))
    )


#: physical layout = the dictionary's binary-searchability: cluster
#: each bucket into term-sorted files with small row groups so the
#: query-time ``term IN (...)`` predicate prunes at row-group
#: granularity (the reference reads only the matched terms' blocks;
#: without this a query reads its whole bucket). Shared by bulk build
#: and merge/vacuum via SegmentStore.write.
POSTINGS_WRITE_OPTS = dict(
    partition_by="bucket",
    sort_within=["term", "run"],
    parquet_block_size=1 << 20,
)


class IndexWriter:
    """Writes segments + maintains the manifest (the 'metapage').

    All segment IO goes through a ``SegmentStore`` (index/storage.py)
    — ParquetDirStore here; IcebergSegmentStore on clusters with the
    Iceberg runtime (manifest commit == snapshot commit there).
    """

    def __init__(self, index_dir: str):
        from pg_textsearch_spark.index.storage import ParquetDirStore

        self.index_dir = index_dir
        self.store = ParquetDirStore(index_dir)
        self.manifest_path = os.path.join(index_dir, "manifest.json")

    def read_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _commit_manifest(self, manifest: dict) -> None:
        # atomic rename == the reference's WAL'd metapage update
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def write_dictionary(self, spark: SparkSession, seg_id: int) -> None:
        """Materialize the per-segment term dictionary (term, bucket,
        df) from the written postings — the reference's sorted
        dictionary section (format.h:141-154). Query-time df lookup
        reads this tiny table (one row per term) with bucket pruning
        instead of touching posting rows (scan.c:698-818 batch-df
        analog)."""
        seg_dir = os.path.join(self.index_dir, "postings", f"seg={seg_id}")
        out_dir = os.path.join(self.index_dir, "dictionary", f"seg={seg_id}")
        # explicit schema: empty segments have no parquet footers
        p = spark.read.schema(
            "term string, run bigint, df_run bigint, blocks "
            "array<struct<last_doc_id:bigint,doc_count:int,block_max_tf:int,"
            "block_max_norm:int,payload:binary>>, bucket int"
        ).option("basePath", seg_dir).parquet(seg_dir)
        (
            p.groupBy("term", "bucket")
            .agg(F.sum("df_run").cast("long").alias("df"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_dir)
        )

    def write_segment(
        self,
        postings: DataFrame,
        doclen: DataFrame,
        seg_id: int,
        config: str,
        n_buckets: int,
        k1: float = bm25.DEFAULT_K1,
        b: float = bm25.DEFAULT_B,
        lineage: dict | None = None,
        keymap: DataFrame | None = None,
        metrics: dict | None = None,
    ) -> dict:
        """``metrics``, when given, receives wall seconds per phase
        (postings/doclen/keymap/dictionary/stats) — the build's
        profiling hook (mirrors checkpoint.py's per-batch metrics)."""

        def timed(name):
            t0 = time.time()

            def done():
                if metrics is not None:
                    metrics[name] = round(time.time() - t0, 3)

            return done

        base = self.index_dir
        d = timed("postings_sec")
        self.store.write(postings, "postings", seg_id, **POSTINGS_WRITE_OPTS)
        d()
        # the tail tables are independent chains once postings are on
        # disk — submit them from threads so their (fixed, core-count-
        # invariant) job planning/commit overlaps instead of serializing
        # (the Spark scheduler interleaves stages; each chain keeps its
        # internal order: doclen -> stats, postings -> dictionary).
        # These small jobs were the worst-scaling part of the build
        # (~4.5 s serial at 8 cores, dominated by per-job fixed cost).
        from concurrent.futures import ThreadPoolExecutor

        spark = postings.sparkSession

        def doclen_then_stats():
            d = timed("doclen_sec")
            self.store.write(doclen, "doclen", seg_id)
            d()
            d = timed("stats_sec")
            row = spark.read.schema(
                "doc_id bigint, doc_len bigint, fieldnorm int"
            ).parquet(os.path.join(base, "doclen", f"seg={seg_id}")).agg(
                F.count("*").alias("num_docs"),
                F.coalesce(F.sum("doc_len"), F.lit(0)).alias("total_tokens"),
                F.coalesce(F.max("doc_id"), F.lit(-1)).alias("max_doc_id"),
            ).collect()[0]
            d()
            return row

        def write_keymap():
            if keymap is None:
                return
            # doc_id -> source key (e.g. url): the ctid-map analog
            d = timed("keymap_sec")
            self.store.write(keymap, "keymap", seg_id)
            d()

        def write_dict():
            d = timed("dictionary_sec")
            self.write_dictionary(spark, seg_id)
            d()

        with ThreadPoolExecutor(3) as pool:
            f_stats = pool.submit(doclen_then_stats)
            f_key = pool.submit(write_keymap)
            f_dict = pool.submit(write_dict)
            stats = f_stats.result()
            f_key.result()
            f_dict.result()

        manifest = self.read_manifest()
        if not manifest:
            manifest = {
                "format_version": 1,
                "config": config,
                "k1": k1,
                "b": b,
                "n_buckets": n_buckets,
                "segments": [],
            }
        assert manifest["config"] == config and manifest["n_buckets"] == n_buckets
        manifest["segments"] = [
            s for s in manifest["segments"] if s["seg_id"] != seg_id
        ]
        manifest["segments"].append(
            {
                "seg_id": seg_id,
                "level": 0,
                "num_docs": int(stats["num_docs"]),
                "total_tokens": int(stats["total_tokens"]),
                "max_doc_id": int(stats["max_doc_id"]),
                "created_at_unix": int(time.time()),
                "has_keymap": keymap is not None,
                "lineage": lineage or {},
            }
        )
        manifest["segments"].sort(key=lambda s: s["seg_id"])
        self._commit_manifest(manifest)
        return manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str | None = None,
    config: str = "english",
    n_buckets: int = DEFAULT_N_BUCKETS,
    k1: float = bm25.DEFAULT_K1,
    b: float = bm25.DEFAULT_B,
    lineage: dict | None = None,
    codec: str = "bitpack",
    metrics: dict | None = None,
) -> dict:
    """One-shot bulk build (reference: tp_build, build.c:1262-1600).

    If ``key_col`` is given (e.g. ``url`` for pages tables), dense
    doc_ids are assigned in key order first AND the doc_id -> key
    mapping is persisted as the segment's ``keymap`` table (the ctid
    map analog, reference: segment.c:1270-1288) so results resolve
    back to source rows; otherwise ``doc_id_col`` must already hold
    unique integer ids (their numeric order is the tie-break order).
    """
    persisted: list = []
    try:
        if key_col is not None:
            # project to the two columns the build touches BEFORE the
            # id shuffle: assign_doc_ids persists + range-shuffles its
            # input, which defeats Catalyst column pruning — dragging
            # e.g. the html binary through that shuffle triples its
            # volume
            docs = assign_doc_ids(
                docs.select(key_col, text_col), key_col, persisted=persisted
            )
            doc_id_col = "doc_id"
        else:
            docs = docs.select(doc_id_col, text_col)
        postings, doclen = build_segment_dataframes(
            docs, doc_id_col, text_col, config, n_buckets,
            codec=codec, persisted=persisted,
        )
        writer = IndexWriter(index_dir)
        keymap = None
        if key_col is not None:
            keymap = docs.select(
                F.col(doc_id_col).cast("long").alias("doc_id"),
                F.col(key_col).cast("string").alias("doc_key"),
            )
        return writer.write_segment(
            postings, doclen, seg_id=0, config=config, n_buckets=n_buckets,
            k1=k1, b=b, lineage=lineage, keymap=keymap, metrics=metrics,
        )
    finally:
        for h in persisted:
            h.unpersist()
