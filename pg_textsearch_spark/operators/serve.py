"""Low-latency serving path: driver-side top-k over the same index.

The distributed paths (operators/topk.py, operators/bmw.py) pay
Spark's per-job floor (~0.25 s in local mode: scheduling + pruned
parquet scan stages) on EVERY interactive query — fine for batch and
concurrent serving, ~50x the reference's warm 5 ms single-query p50.
This module is the interactive answer: the SAME on-disk index, the
SAME float32-pruned / exact-float64-emitted WAND kernels, but executed
in the serving process with pyarrow doing bucket-dir + row-group
pruning — no job, no scheduler, no exchange. Results are identical to
``topk_bmw`` (same kernels, same tie-break; oracle-gated).

Scale boundary (stated honestly, like SMALL_QUERY_POSTINGS): the
serving process reads the QUERY TERMS' posting rows only — work is
O(sum of the query terms' pruned postings), independent of corpus
size, but a stopword-grade term on a 10^11-doc corpus is GBs of
postings and belongs on the cluster. ``topk_auto`` dispatches: serve
locally when the (dictionary-known) pruned volume is under
``max_postings``, else run the distributed BMW plan. This mirrors the
reference's own architecture — its queries ARE single-process scans
over local segment files (src/segment/scan.c); here that role is
played by the driver against shared storage, while Spark remains the
build/maintenance/batch engine.

Requires a local (or locally-mounted) index directory; on object
storage, serve from a host that mounts it or stay on the cluster path.
"""

from __future__ import annotations

import math
import os

import numpy as np

from pg_textsearch_spark.functions.bm25 import bm25_term_score32
from pg_textsearch_spark.functions.fieldnorm import FIELDNORM_DECODE_TABLE
from pg_textsearch_spark.index.builder import term_bucket
from pg_textsearch_spark.index.codec import decompress_block
from pg_textsearch_spark.operators.bmw import (
    _Cursor,
    _score_accumulate,
    _score_single_term,
)
from pg_textsearch_spark.functions.tokenizer import tokenize_query


class LocalIndex:
    """Spark-free index handle for serving processes.

    Exposes the same stats surface a ``BM25Index`` does (manifest,
    corpus stats, stamp/delete discipline) from the on-disk manifest
    alone — a serving tier (one process per core, shared storage) can
    ``fork``/spawn workers holding one of these without a JVM or a
    SparkSession anywhere in the process. The reference's serving
    architecture is exactly this shape: each backend scans local
    segment files (src/segment/scan.c:59-178); Spark stays the
    build/maintenance/batch engine.
    """

    def __init__(self, index_dir: str):
        import json

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.config: str = self.manifest["config"]
        self.k1: float = self.manifest["k1"]
        self.b: float = self.manifest["b"]
        self.n_buckets: int = self.manifest["n_buckets"]

    def _stamp(self):
        return (
            int(self.manifest.get("deleted_docs", 0)),
            tuple(s["seg_id"] for s in self.manifest["segments"]),
        )

    @property
    def num_docs(self) -> int:
        return sum(s["num_docs"] for s in self.manifest["segments"]) - int(
            self.manifest.get("deleted_docs", 0)
        )

    @property
    def total_tokens(self) -> int:
        return sum(
            s["total_tokens"] for s in self.manifest["segments"]
        ) - int(self.manifest.get("deleted_tokens_quantized", 0))

    @property
    def avgdl(self) -> float:
        n = self.num_docs
        return (self.total_tokens / n) if n else 0.0

    def has_deletes(self) -> bool:
        return int(self.manifest.get("deleted_docs", 0)) > 0


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet")
        )
    return sorted(out)


class ServingIndex:
    """Driver-side reader over a BM25Index's files: memoized file
    listings + dictionary lookups, pyarrow row-group pruning by term.

    Wraps (and stays consistent with) a ``BM25Index`` handle — reuses
    its manifest for stats and its stamp discipline for invalidation.
    """

    def __init__(self, index: "BM25Index"):  # noqa: F821 (doc type)
        self.index = index
        self._files: dict[tuple, list[str]] | None = None
        self._df_cache: dict[str, int] = {}
        self._stamp = None

    def _check_stamp(self) -> None:
        s = self.index._stamp()
        if s != self._stamp:
            self._files = None
            self._df_cache = {}
            self._dead = None
            self._stamp = s

    def _bucket_files(self, table: str, bucket: int) -> list[str]:
        self._check_stamp()
        if self._files is None:
            self._files = {}
        key = (table, bucket)
        if key not in self._files:
            files: list[str] = []
            base = self.index.index_dir
            for seg in self.index.manifest["segments"]:
                d = os.path.join(
                    base, table, f"seg={seg['seg_id']}", f"bucket={bucket}"
                )
                if os.path.isdir(d):
                    files.extend(_parquet_files(d))
            self._files[key] = files
        return self._files[key]

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Unified df per term — dictionary parquet read in-process."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        self._check_stamp()
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            got = {t: 0 for t in missing}
            by_bucket: dict[int, list[str]] = {}
            for t in missing:
                by_bucket.setdefault(
                    term_bucket(t, self.index.n_buckets), []
                ).append(t)
            for b, ts in by_bucket.items():
                for f in self._bucket_files("dictionary", b):
                    tab = pq.read_table(
                        f,
                        columns=["term", "df"],
                        filters=[("term", "in", ts)],
                    )
                    for term, df in zip(
                        tab["term"].to_pylist(), tab["df"].to_pylist()
                    ):
                        got[term] += int(df)
            # pending-delete correction from the dead_dfs table
            dead_path = os.path.join(self.index.index_dir, "dead_dfs")
            if self.index.has_deletes() and os.path.isdir(dead_path):
                live = [t for t, v in got.items() if v > 0]
                if live:
                    tab = pq.read_table(
                        dead_path, filters=[("term", "in", live)]
                    )
                    for term, dd in zip(
                        tab["term"].to_pylist(), tab["dead_df"].to_pylist()
                    ):
                        got[term] -= int(dd)
            self._df_cache.update(got)
        return {t: self._df_cache[t] for t in terms if self._df_cache[t] > 0}

    def posting_rows(self, terms: list[str]):
        """Yield (term, blocks_pylist) for the terms' posting rows —
        bucket-dir pruned, then parquet row-group pruned on the sorted
        ``term`` column statistics."""
        import pyarrow.parquet as pq

        by_bucket: dict[int, list[str]] = {}
        for t in terms:
            by_bucket.setdefault(
                term_bucket(t, self.index.n_buckets), []
            ).append(t)
        for b, ts in by_bucket.items():
            for f in self._bucket_files("postings", b):
                tab = pq.read_table(
                    f,
                    columns=["term", "blocks"],
                    filters=[("term", "in", ts)],
                )
                terms_col = tab["term"].to_pylist()
                blocks_col = tab["blocks"].to_pylist()
                yield from zip(terms_col, blocks_col)

    def dead_ids(self) -> frozenset | None:
        self._check_stamp()
        if getattr(self, "_dead", None) is None:
            if not self.index.has_deletes():
                self._dead = frozenset()
            else:
                import pyarrow.parquet as pq

                path = os.path.join(self.index.index_dir, "deletes")
                self._dead = frozenset(
                    pq.read_table(path, columns=["doc_id"])["doc_id"].to_pylist()
                )
        return self._dead or None


def topk_serve(index, query: str, k: int = 10, _serving: ServingIndex | None = None):
    """Interactive top-k: list[(rank, doc_id, score)] in milliseconds.

    Identical results to ``topk_bmw`` — same query tokenization, same
    IDF arithmetic, same f32-pruning/f64-emitting kernels, same
    (score DESC, doc_id ASC) tie-break. Returns plain rows (the
    serving shape); wrap with ``spark.createDataFrame(rows, "rank int,
    doc_id bigint, score double")`` when a DataFrame is needed.
    """
    sv = _serving or ServingIndex(index)
    qtf = tokenize_query(query, index.config)
    if not qtf:
        return []
    dfs = sv.term_dfs(list(qtf))
    n = index.num_docs
    weights: dict[str, tuple[float, int]] = {}
    for term, qf in qtf.items():
        df = dfs.get(term, 0)
        if df:
            weights[term] = (math.log1p((n - df + 0.5) / (df + 0.5)), qf)
    if not weights:
        return []
    k1, b, avgdl = index.k1, index.b, index.avgdl
    dead = sv.dead_ids()
    if len(weights) == 1:
        cursors = []
        for term, blocks in sv.posting_rows(list(weights)):
            idf, qf = weights[term]
            c = _Cursor(blocks, idf * qf, k1, b, avgdl, idf=idf, qf=qf)
            if c.alive:
                cursors.append(c)
        if not cursors:
            return []
        rows = _score_single_term(cursors, int(k), dead)
    else:
        items = [
            (term, weights[term][0], weights[term][1], blocks)
            for term, blocks in sv.posting_rows(list(weights))
        ]
        if not items:
            return []
        # local two-phase floor (no deletes pending: dead set makes the
        # partial-sum bound unsafe, exactly like the distributed path)
        floor = -1.0 if dead else _local_floor(items, int(k), k1, b, avgdl)
        rows = _score_accumulate(
            items, int(k), k1, b, avgdl, dead=dead, floor=floor
        )
    rows.sort(key=lambda r: (-r[2], r[0]))
    return [
        (rank, doc_id, s64)
        for rank, (doc_id, _s32, s64) in enumerate(rows[: int(k)], start=1)
    ]


def _local_floor(items, k: int, k1: float, b: float, avgdl: float) -> float:
    """In-process analog of bmw._bootstrap_floor: rank posting rows by
    their max block upper, decode just enough rows to prove k distinct
    docs, and return the k-th best per-doc partial sum (shaved by the
    same f32 guard). Costs a handful of block decodes — no Spark."""
    metas = []
    for term, idf, qf, blocks in items:
        if not blocks:
            continue
        bmt = np.asarray([blk["block_max_tf"] for blk in blocks], dtype=np.int64)
        bmn = np.asarray([blk["block_max_norm"] for blk in blocks], dtype=np.int64)
        dl = FIELDNORM_DECODE_TABLE[bmn]
        upper = float(
            (
                bm25_term_score32(bmt, dl, np.float32(1.0), avgdl, k1, b)
                * np.float32(idf * qf)
            ).max()
        )
        ndocs = int(sum(blk["doc_count"] for blk in blocks))
        metas.append((upper, ndocs, term, idf, qf, blocks))
    if not metas:
        return -1.0
    metas.sort(key=lambda m: -m[0])
    n_terms = len({m[2] for m in metas})
    needed = k * n_terms
    ids_parts, s32_parts, covered = [], [], 0
    for upper, ndocs, term, idf, qf, blocks in metas:
        for blk in blocks:
            bids, btfs, bfns = decompress_block(bytes(blk["payload"]))
            dl = FIELDNORM_DECODE_TABLE[bfns.astype(np.int64)]
            ids_parts.append(bids.astype(np.int64))
            s32_parts.append(
                (
                    bm25_term_score32(btfs, dl, np.float32(1.0), avgdl, k1, b)
                    * np.float32(idf * qf)
                ).astype(np.float64)
            )
        covered += ndocs
        if covered >= needed:
            break
    ids = np.concatenate(ids_parts)
    s = np.concatenate(s32_parts)
    uids, inv = np.unique(ids, return_inverse=True)
    if len(uids) < k:
        return -1.0
    partials = np.bincount(inv, weights=s)
    kth = float(np.partition(partials, len(partials) - k)[len(partials) - k])
    return float(np.float32(kth) * (1.0 - 4e-6)) if kth > 0 else -1.0


#: above this many total postings (sum of query-term dfs) the pruned
#: volume no longer belongs in one process — dispatch to the cluster
SERVE_MAX_POSTINGS = 2_000_000


def topk_auto(index, query: str, k: int = 10,
              max_postings: int = SERVE_MAX_POSTINGS,
              _serving: ServingIndex | None = None):
    """Dispatch: serve driver-side when the dictionary-known pruned
    volume is bounded, else run the distributed BMW plan. Returns a
    Spark DataFrame either way (serving rows are lifted via
    createDataFrame — k rows, no job until the caller acts)."""
    from pg_textsearch_spark.operators.bmw import topk_bmw

    sv = _serving or ServingIndex(index)
    qtf = tokenize_query(query, index.config)
    dfs = sv.term_dfs(list(qtf)) if qtf else {}
    if sum(dfs.values()) <= max_postings:
        rows = topk_serve(index, query, k, _serving=sv)
        return index.spark.createDataFrame(
            rows, "rank int, doc_id bigint, score double"
        )
    return topk_bmw(index, query, k)
