"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (it delegates relational work to
Postgres; SURVEY.md §2.9) — these are the companion operators a
100 TB web-corpus pipeline runs before/alongside indexing:

- exact dedup           : hash-groupBy on normalized text
- n-gram Jaccard        : exact pairwise similarity over shared shingles
- MinHash + LSH         : scalable near-dup candidate generation
- SimHash               : 64-bit fingerprint + Hamming-band grouping
- embedding near-dup    : cosine-threshold pairs over vectors

Scale notes: every operator is expressed as joins/aggregations over
exploded feature tables (shingles, bands, hamming blocks) — never a
nested-loop/cartesian plan (plan-asserted in tests). The pairwise
stages only touch documents sharing a feature, which is the standard
web-scale shape (band buckets bound the quadratic term). The one
intentionally-O(n^2) operator is ``embedding_neardup_pairs(exact=
True)`` — exact cosine verification is all-pairs by definition — and
it runs as a block-grid equi-join, not a nested loop; its scale
companion is ``exact=False`` (sign-LSH banding).

All hashing is counter-based splitmix64 (same kernel as
sources/pages.py) so results are deterministic and reproducible in
plain SQL for the oracle gate where needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pg_textsearch_spark.sources.pages import _splitmix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts; keep the lowest id as canonical.

    -> (doc_id, dup_count): one row per distinct text, doc_id = min id.

    The shuffle key is (xxhash64(text), length(text)) — 12 bytes — not
    the text body: grouping on the raw text ships every distinct body
    across the wire as a key, which dominates the shuffle at corpus
    scale. 64-bit hash + exact length makes false merges vanishingly
    rare (birthday bound n^2 / 2^65 over equal-length docs); pipelines
    that need certainty can re-verify within dup groups (dup_count > 1
    rows are a tiny fraction) by regrouping just those docs on text.
    """
    return (
        df.groupBy(
            F.xxhash64(F.col(text_col)).alias("_h"),
            F.length(F.col(text_col)).alias("_len"),
        )
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("long").alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + exact Jaccard
# ---------------------------------------------------------------------------


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-grams per doc, all JVM-side:
    split -> slide a window via transform over token indexes."""
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: t != F.lit(""))
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    shingles = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Jaccard over word n-gram shingle sets, pairs >= threshold.

    Only docs sharing at least one shingle are ever paired (self-join
    on shingle), so cost is sum over shingles of bucket^2 — the
    standard candidate-pair bound, not |docs|^2.

    ``max_shingle_df`` caps that quadratic term: shingles present in
    more than this many docs (boilerplate headers, nav chrome — the
    buckets whose bucket^2 goes quadratic on real web text) are dropped
    from the feature set entirely (both intersection and union), the
    standard web-scale practice. Pairs whose overlap was only
    boilerplate disappear; Jaccard for surviving pairs is computed over
    the capped shingle sets. None = no cap (exact Jaccard).
    -> (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = shingle_table(df, id_col, text_col, n)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_udf(num_perm: int, seed: int):
    @pandas_udf("array<bigint>")
    def _mh(hash_lists: pd.Series) -> pd.Series:
        # shingles arrive pre-hashed (JVM xxhash64 — deterministic;
        # Python's hash() is salted per process and must never be used)
        salts = _splitmix64(
            np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1)
        )

        def one(hashes):
            if hashes is None or len(hashes) == 0:
                return [0] * num_perm
            hs = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
            # num_perm independent permutations via xor-salt + splitmix
            m = _splitmix64(hs[None, :] ^ salts[:, None]).min(axis=1)
            return (m >> np.uint64(1)).astype(np.int64).tolist()

        return hash_lists.map(one)

    return _mh


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    seed: int = 1,
) -> DataFrame:
    """(id, sig array<bigint>[num_perm]) — MinHash over word shingles."""
    sh = shingle_table(df, id_col, text_col, n).withColumn(
        "h", F.xxhash64("shingle")
    )
    grouped = sh.groupBy(id_col).agg(F.collect_list("h").alias("hashes"))
    return grouped.select(
        id_col, _minhash_udf(num_perm, seed)("hashes").alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 1,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band_id, band_hash), estimate similarity from full signatures.

    -> (doc_a, doc_b, est_jaccard). The band join is the only shuffle
    that can skew (a degenerate bucket of boilerplate pages); the
    bucket key includes the full band hash so only true near-dups
    collide.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.hash(
                        F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                    ).cast("long").alias("bh"),
                )
                for bi in range(bands)
            ]
        )
    )
    banded = sigs.select(F.col(id_col), "sig", band_cols.alias("b")).select(
        id_col, "sig", "b.band", "b.bh"
    )
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bh"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bh"
    )
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_perm))
    return cand.select("doc_a", "doc_b", est.alias("est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_udf(seed: int):
    @pandas_udf("bigint")
    def _sh(hash_lists: pd.Series) -> pd.Series:
        def one(hashes):
            if hashes is None or len(hashes) == 0:
                return 0
            hs = _splitmix64(
                np.asarray(hashes, dtype=np.int64).astype(np.uint64)
                ^ np.uint64(seed)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = 2 * bits.astype(np.int64).sum(axis=0) - len(hs)
            out = np.uint64(0)
            for i in np.flatnonzero(votes > 0):
                out |= np.uint64(1) << np.uint64(i)
            return int(out >> np.uint64(1))  # keep within int64

        return hash_lists.map(one)

    return _sh


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", seed: int = 9
) -> DataFrame:
    """(id, simhash bigint) — 63-bit SimHash of the token stream
    (with multiplicities). Tokens are hashed JVM-side (xxhash64)."""
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: t != F.lit(""))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(
        F.col(id_col), _simhash_udf(seed)(hashes).alias("simhash")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 9,
) -> DataFrame:
    """Pairs within Hamming distance <= max_hamming.

    Pigeonhole banding: split 64 bits into max_hamming+1 blocks; any
    qualifying pair matches exactly on >= 1 block -> bucket-join per
    block, verify true distance. -> (doc_a, doc_b, hamming).
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sh = simhash_table(df, id_col, text_col, seed)
    blocks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("blk"),
                    F.shiftrightunsigned(F.col("simhash"), bi * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bits"),
                )
                for bi in range(nblocks)
            ]
        )
    )
    banded = sh.select(id_col, "simhash", blocks.alias("b")).select(
        id_col, "simhash", "b.blk", "b.bits"
    )
    a = banded.select(F.col(id_col).alias("doc_a"),
                      F.col("simhash").alias("h_a"), "blk", "bits")
    b = banded.select(F.col(id_col).alias("doc_b"),
                      F.col("simhash").alias("h_b"), "blk", "bits")
    cand = (
        a.join(b, ["blk", "bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 3,
    exact: bool = True,
    n_blocks: int = 16,
) -> DataFrame:
    """Cosine-similarity pairs >= threshold.
    -> (vec_a, vec_b, cos) with vec_a < vec_b, float64 math.

    exact=True (the oracle-gated verifier): recall-1.0 all-pairs
    verification, distributed as a block-grid equi-join — each vector
    hashes into one of ``n_blocks`` blocks, each side is replicated
    across its grid row/column, and the join key is the (block_i,
    block_j) cell. Total compute is inherently O(n^2) (that is what
    exact near-dup *is*), but the plan is a hash-partitioned equi-join
    with n_blocks^2 independent cells — never a BroadcastNestedLoopJoin
    or CartesianProduct, bounded per-task memory, parallel across the
    cluster. Use it as the per-cluster verifier or at validation scale.

    exact=False (the 100 TB path): sign-LSH banding — ``n_bits`` random
    hyperplane signs (same sketch as operators/knn.py), split into
    ``bands`` bands; only vectors agreeing on at least one full band
    are candidates, and every candidate is exact-rescored in float64.
    Sub-quadratic; recall < 1 by construction (pytest-pinned vs the
    exact path).
    """
    nrm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        nrm.alias("nrm"),
    )
    if exact:
        blk = F.pmod(F.xxhash64(F.col("vid")), F.lit(n_blocks)).cast("int")
        grid = F.explode(F.array(*[F.lit(i) for i in range(n_blocks)]))
        a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("v_a"),
                     F.col("nrm").alias("n_a"), blk.alias("bi"),
                     grid.alias("bj"))
        b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("v_b"),
                     F.col("nrm").alias("n_b"), grid.alias("bi"),
                     blk.alias("bj"))
        cand = a.join(b, ["bi", "bj"]).filter(F.col("vec_a") < F.col("vec_b"))
    else:
        from pg_textsearch_spark.operators.knn import _sketch_expr

        width = n_bits // bands
        mask = (1 << width) - 1
        banded = e.withColumn("sk", _sketch_expr("v", n_bits, seed)).select(
            "vid", "v", "nrm",
            F.explode(F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftrightunsigned(F.col("sk"), bi * width)
                    .bitwiseAND(F.lit(mask)).alias("bits"),
                )
                for bi in range(bands)
            ])).alias("b"),
        ).select("vid", "v", "nrm", "b.band", "b.bits")
        a = banded.select(F.col("vid").alias("vec_a"), F.col("v").alias("v_a"),
                          F.col("nrm").alias("n_a"), "band", "bits")
        b = banded.select(F.col("vid").alias("vec_b"), F.col("v").alias("v_b"),
                          F.col("nrm").alias("n_b"), "band", "bits")
        cand = (
            a.join(b, ["band", "bits"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "v_a", "n_a", "vec_b", "v_b", "n_b")
            .distinct()
        )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("cos", dot / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.col("cos"))
    )
