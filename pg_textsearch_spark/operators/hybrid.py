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


def _collect_ranked_side(
    spark, fetch, c: int, score_col: str, id_col: str, dp: int
) -> DataFrame:
    """One ranker's top-``c`` constituent ranking as a c-row local
    DataFrame (id aliased to doc_id), ranks assigned over ROUNDED
    scores (``F.round(score, dp)`` DESC, id ASC).

    ``fetch(depth)`` returns that ranker's top-``depth`` rows by RAW
    score. The rounded re-rank can pull a doc from below the raw cut
    into the top-c only if its rounded score ties the score at position
    c — so the fetch deepens (pad x4) while the fetched window's raw
    minimum could still round up to the boundary's rounded score
    (conservative half-ulp margin — no driver-side reimplementation of
    the JVM rounding mode). Terminates: depth grows until the fetch
    comes back untruncated (the ranker's full candidate set). Advisor
    r4: the previous fixed pad=16 diverged from the full-corpus oracle
    ranking whenever >16 docs tied at the rounded cut."""
    pad = 16
    eps = 0.5 * 10.0 ** (-dp) * 1.0001
    while True:
        w = Window.orderBy(F.desc("rs"), F.asc("id"))
        rows = (
            fetch(c + pad)
            .select(
                F.col(id_col).alias("id"),
                F.round(score_col, dp).alias("rs"),
                F.col(score_col).cast("double").alias("raw"),
            )
            .withColumn("rank", F.row_number().over(w))
            .collect()
        )
        if len(rows) < c + pad or len(rows) <= c:
            break  # untruncated: the ranker has nothing deeper
        boundary = rows[c - 1]["rs"]
        if min(r["raw"] for r in rows) < boundary - eps:
            break  # nothing unfetched can round up into the boundary tie
        pad *= 4
    pairs = [(int(r["id"]), int(r["rank"])) for r in rows if r["rank"] <= c]
    return spark.createDataFrame(pairs, "doc_id long, rank int")


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
    # invariant. _collect_ranked_side deepens the raw fetch until the
    # rounded cut's membership is boundary-tie-safe.
    spark = index.spark
    text_side = _collect_ranked_side(
        spark,
        lambda d: topk_exhaustive(index, query_text, k=d),
        c, "score", "doc_id", 4,
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])],
        "query_id long, query_vec array<double>",
    )
    if ann_index is not None:
        from pg_textsearch_spark.index.ann import ann_ivf_topk

        def vec_fetch(d):
            return ann_ivf_topk(ann_index, qdf, k=d, n_probe=n_probe)
    else:
        assert emb is not None, "pass emb= (exact) or ann_index= (ANN)"
        from pg_textsearch_spark.operators.knn import knn_bruteforce

        def vec_fetch(d):
            return knn_bruteforce(
                emb, qdf, k=d, id_col=vec_id_col, vec_col=vec_col
            )

    vec_side = _collect_ranked_side(spark, vec_fetch, c, "cos", "vec_id", 6)
    return rrf_fuse([text_side, vec_side], k=k, k0=k0)
