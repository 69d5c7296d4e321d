"""Similarity search over embedding columns.

- ``knn_bruteforce``: exact cosine top-k per query vector. Query
  vectors are broadcast (k rows), the dot product is a pure JVM
  ``zip_with``/``aggregate`` fold in float64 (bit-identical to a
  left-to-right SQL sum — the oracle gate relies on this), and the
  global top-k per query is a TakeOrderedAndProject.
- ``ann_lsh_topk``: random-hyperplane LSH buckets as a scale path:
  probe only vectors sharing >= 1 of `bands` sketch bands with the
  query, exact-rescore the candidates.
- ``ann_ivf_topk``: the inverted-file alternative: spherical k-means
  on a deterministic sample fits ``n_lists`` centroids driver-side,
  every vector is assigned to its nearest list (Arrow-batched numpy
  matmul), and a query scans only its ``n_probe`` nearest lists.

The two ``ann_*`` functions here are the INDEX-FREE (ad-hoc, one-shot)
variants: they fit/assign per call, which is fine for a single batch
over a transient DataFrame but is a full corpus pass per call. The
serving path is ``index/ann.py``: ``build_ann_index`` materializes
list assignments, norms, and sketches ONCE (partitioned by list/band),
and its ``ann_ivf_topk``/``ann_lsh_topk`` are partition-pruned scans
with zero query-time Python.

All ANN paths are recall<1 by construction -> pytest-pinned vs brute
force; not SQL-expressible (rows-only driver checks). At 100 TB the
brute-force path is the per-bucket verifier inside the LSH/IVF
partitioner, not a standalone scan — the composition here mirrors
that: same scoring expression, different candidate generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos_expr(va, vb, na, nb):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (na * nb)


def _norm_expr(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def knn_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, vec_id, cos).

    Ties break (cos DESC, vec_id ASC). The corpus scans once per query
    batch; queries are broadcast.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col).alias("n_v"),
    )
    q = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_vec_col).alias("qv"),
        _norm_expr(q_vec_col).alias("n_q"),
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        _cos_expr("v", "qv", F.col("n_v"), F.col("n_q")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def _sketch_expr(vec_col, n_bits: int, seed: int):
    """Sign sketch: bit i = sign(dot(v, h_i)) for deterministic
    pseudo-random hyperplanes h_i with +-1 entries derived JVM-side
    from xxhash64(seed, i, element_index). No per-element plan
    literals (a dim x n_bits literal array bloats the plan at high
    embedding dim) and no driver-side dim probe — the index array
    comes from ``sequence(0, size(v)-1)`` per row."""
    idx = F.sequence(F.lit(0), F.size(vec_col) - 1)

    def _signed(i):
        return lambda x, j: x.cast("double") * (
            F.pmod(F.xxhash64(F.lit(int(seed)), F.lit(i), j), F.lit(2)) * 2 - 1
        ).cast("double")

    sketch = F.lit(0).cast("long")
    for i in range(n_bits):
        dot = F.aggregate(
            F.zip_with(vec_col, idx, _signed(i)), F.lit(0.0), lambda a, v: a + v
        )
        sketch = sketch + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sketch


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH banding.

    A candidate is any vector sharing at least one of ``bands`` sketch
    bands with the query; candidates are exact-rescored. At corpus
    scale the band join replaces the full scan with bucket-local work.
    """
    width = n_bits // bands
    mask = (1 << width) - 1

    def banded(df, idc, vc, prefix):
        s = _sketch_expr(vc, n_bits, seed)
        d = df.select(
            F.col(idc).alias(f"{prefix}_id"),
            F.col(vc).alias(f"{prefix}_v"),
            s.alias("sk"),
        )
        bandcol = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sk"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bits"),
                    )
                    for b in range(bands)
                ]
            )
        )
        return d.select(f"{prefix}_id", f"{prefix}_v", bandcol.alias("b")).select(
            f"{prefix}_id", f"{prefix}_v", "b.band", "b.bits"
        )

    e = banded(emb, id_col, vec_col, "vec")
    q = banded(queries, q_id_col, q_vec_col, "q")
    cand = (
        e.join(F.broadcast(q), ["band", "bits"])
        .select(
            F.col("q_id").alias("query_id"),
            F.col("vec_id"),
            F.col("vec_v"),
            F.col("q_v"),
        )
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        _cos_expr("vec_v", "q_v", _norm_expr("vec_v"), _norm_expr("q_v")).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def _fit_centroids(
    emb: DataFrame, vec_col: str, id_col: str, n_lists: int,
    sample_size: int, iters: int, seed: int
) -> np.ndarray:
    """Spherical k-means on a deterministic hash-sample, driver-side.

    The sample is tiny (<= sample_size rows); fitting is pure numpy.
    Determinism: rows are picked by xxhash64(id) order, never by
    partition order, so the same corpus always yields the same lists.
    """
    frac_rows = (
        emb.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(int(sample_size))
        .collect()
    )
    x = np.asarray([r["_v"] for r in frac_rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(n_lists, len(x))
    # deterministic init: first k sample rows (already hash-shuffled)
    c = x[:k].copy()
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def _assign_udf(centroids: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    flat = centroids.tolist()  # closure ships the (tiny) centroid matrix

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        c = np.asarray(flat, dtype=np.float64)
        m = np.asarray(list(vecs), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ c.T).argmax(axis=1).astype(np.int32))

    return _assign


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    sample_size: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate cosine top-k: (query_id, rank, vec_id, cos).

    Scan fraction ~ n_probe/n_lists; recall grows with n_probe
    (pytest-pinned vs brute force). Candidates are exact-rescored in
    float64 with the same expression as ``knn_bruteforce``.
    """
    spark = emb.sparkSession
    cents = _fit_centroids(
        emb, vec_col, id_col, n_lists, sample_size, iters, seed
    )
    assigned = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col).alias("n_v"),
        _assign_udf(cents)(F.col(vec_col)).alias("list_id"),
    )
    # driver-side probe lists per query (queries are a small batch)
    qrows = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("qv")
    ).collect()
    qm = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    qm_n = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qm_n @ cents.T), axis=1)[:, : int(n_probe)]
    probe_rows = [
        (r["query_id"], r["qv"], [int(p) for p in probes[i]])
        for i, r in enumerate(qrows)
    ]
    qdf = spark.createDataFrame(
        probe_rows,
        f"query_id long, qv array<double>, probe array<int>",
    ).select(
        "query_id", "qv", _norm_expr("qv").alias("n_q"),
        F.explode("probe").alias("list_id"),
    )
    cand = assigned.join(F.broadcast(qdf), "list_id")
    scored = cand.select(
        "query_id",
        "vec_id",
        _cos_expr("v", "qv", F.col("n_v"), F.col("n_q")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
