"""Hybrid retrieval: BM25 text ranking fused with vector similarity.

A training-data / RAG pipeline rarely retrieves by text OR vectors
alone — the standard production composition is reciprocal-rank fusion
(RRF, Cormack/Clarke/Buettcher SIGIR'09): fetch top-C candidates from
each ranker and score each doc by ``sum over rankers of
1 / (k0 + rank)`` (k0 = 60 conventionally), which needs no score
calibration between BM25 points and cosines. This module composes the
engine's existing operators — the BM25 index (operators/topk) and
either brute-force cosine (operators/knn, the exact oracle-gated
path) or the materialized ANN index (index/ann, the scale path) —
with the fusion expressed as one full-outer join + a window, fully
JVM-side.

Scale shape: each side produces <= C rows (their own pruned/indexed
plans do the heavy lifting); the fusion joins two k-row DataFrames —
broadcast-trivial at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: conventional RRF dampening constant (SIGIR'09)
DEFAULT_RRF_K0 = 60


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = DEFAULT_RRF_K0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse N (id, rank) DataFrames by reciprocal-rank: (rank, doc_id,
    rrf). A doc absent from a ranking contributes 0 for it. Ties break
    by ascending id (the engine-wide deterministic tie-break)."""
    assert rankings, "need at least one ranking"
    sides = []
    for i, r in enumerate(rankings):
        sides.append(
            r.select(
                F.col(id_col).alias("doc_id"),
                F.col("rank").alias(f"_r{i}"),
            )
        )
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, "doc_id", "full")
    rrf = None
    for i in range(len(sides)):
        term = F.coalesce(
            1.0 / (F.lit(float(k0)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        rrf = term if rrf is None else rrf + term
    scored = joined.select("doc_id", rrf.alias("rrf"))
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("rank", "doc_id", "rrf")
    )


def hybrid_rrf_topk(
    index,
    query_text: str,
    query_vec: list[float],
    emb: DataFrame | None = None,
    ann_index=None,
    k: int = 10,
    candidates: int | None = None,
    k0: int = DEFAULT_RRF_K0,
    n_probe: int = 4,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Text+vector hybrid top-k: (rank, doc_id, rrf).

    ``index``: a BM25Index over the corpus; ``emb``: the embedding
    table (vec_id aligned with doc_id) for the EXACT vector side
    (brute-force cosine — the oracle-gated path), or ``ann_index``: a
    materialized ANNIndex for the approximate scale path (rows-only
    check; recall bounded by the ANN tests). ``candidates`` is the
    per-ranker depth C (default max(4k, 50)) — RRF quality saturates
    quickly in C, and each side's plan is its own pruned top-C.
    """
    from pg_textsearch_spark.operators.topk import topk_exhaustive

    c = int(candidates if candidates is not None else max(4 * k, 50))
    # constituent ranks are assigned over ROUNDED scores (4dp BM25 /
    # 6dp cosine, id tie-break) — near-tied f64 totals flip order
    # under different summation orders (engines, plans), and a rank
    # flip at depth r shifts rrf by ~1/(k0+r)^2; rounding makes the
    # fused ranking reproducible, the engine-wide determinism
    # invariant. Candidates are over-fetched by a pad so the rounded
    # cut keeps the same membership on every engine.
    pad = 16
    text_raw = topk_exhaustive(index, query_text, k=c + pad)
    tw = Window.orderBy(
        F.desc(F.round("score", 4)), F.asc("doc_id")
    )
    text_side = (
        text_raw.select("doc_id", F.row_number().over(tw).alias("rank"))
        .filter(F.col("rank") <= c)
    )
    spark = index.spark
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "query_id long, query_vec array<double>",
    )
    if ann_index is not None:
        from pg_textsearch_spark.index.ann import ann_ivf_topk

        vec = ann_ivf_topk(ann_index, qdf, k=c + pad, n_probe=n_probe)
    else:
        assert emb is not None, "pass emb= (exact) or ann_index= (ANN)"
        from pg_textsearch_spark.operators.knn import knn_bruteforce

        vec = knn_bruteforce(
            emb, qdf, k=c + pad, id_col=vec_id_col, vec_col=vec_col
        )
    vw = Window.orderBy(F.desc(F.round("cos", 6)), F.asc("vec_id"))
    vec_side = (
        vec.select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(vw).alias("rank"),
        )
        .filter(F.col("rank") <= c)
    )
    return rrf_fuse([text_side, vec_side], k=k, k0=k0)
