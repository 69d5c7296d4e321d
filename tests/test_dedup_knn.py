"""Semantics of the approximate dedup/similarity operators that the
DuckDB gate can't express: MinHash-LSH recall vs exact Jaccard,
SimHash Hamming pairs, ANN-LSH recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash_table,
)
from pg_textsearch_spark.operators.knn import ann_lsh_topk, knn_bruteforce
from pg_textsearch_spark.shipping import ensure_shipped


@pytest.fixture(scope="module")
def dup_corpus(spark):
    ensure_shipped(spark)
    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(200)]
    rows = []
    base_docs = []
    for d in range(60):
        words = [vocab[i] for i in rng.integers(0, 200, 40)]
        base_docs.append(words)
        rows.append((d, " ".join(words)))
    # near-duplicates: perturb 2 of 40 words
    for j, d in enumerate(range(60, 80)):
        words = list(base_docs[j])
        words[3] = "zzz"
        words[17] = "qqq"
        rows.append((d, " ".join(words)))
    # exact duplicates
    rows.append((80, rows[0][1]))
    rows.append((81, rows[1][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_finds_duplicates(dup_corpus):
    res = dedup_exact(dup_corpus).collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in res}
    assert by_id[0] == 2 and by_id[1] == 2  # canonical = min doc_id
    assert 80 not in by_id and 81 not in by_id
    assert len(res) == 80


def test_minhash_lsh_recall_vs_exact(dup_corpus):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.6).collect()
    }
    assert len(exact) >= 20  # the 20 planted near-dup pairs (+ exact dups)
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(dup_corpus, num_perm=32, bands=8).collect()
    }
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(lsh))


def test_simhash_identical_docs_equal_hash(dup_corpus):
    sh = {r["doc_id"]: r["simhash"] for r in simhash_table(dup_corpus).collect()}
    assert sh[0] == sh[80] and sh[1] == sh[81]
    pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(dup_corpus, max_hamming=3).collect()
    }
    assert (0, 80, 0) in pairs and (1, 81, 0) in pairs


def test_dedup_exact_shuffles_hash_not_text(dup_corpus):
    from pg_textsearch_spark.plans.explain import formatted_plan

    plan = formatted_plan(dedup_exact(dup_corpus))
    # the aggregation key must be the 64-bit hash + length, not the body
    assert "xxhash64" in plan, plan


def test_embedding_neardup_plans_have_no_nested_loop(spark):
    from pg_textsearch_spark.operators.dedup import embedding_neardup_pairs
    from pg_textsearch_spark.plans.explain import assert_no_nested_loop

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert_no_nested_loop(
        embedding_neardup_pairs(emb, threshold=0.3, exact=True)
    )
    assert_no_nested_loop(
        embedding_neardup_pairs(emb, threshold=0.3, exact=False)
    )


def test_embedding_neardup_exact_blockgrid_is_allpairs(spark):
    # the block-grid equi-join must enumerate exactly the same pairs as
    # the mathematical all-pairs definition (numpy oracle)
    from pg_textsearch_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_neardup_pairs(
            emb, threshold=0.3, exact=True, n_blocks=7
        ).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    m = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    want = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            a, b = ids[i], ids[j]
            if a < b and cos[i, j] >= 0.3:
                want[(a, b)] = cos[i, j]
    assert set(got) == set(want), (len(got), len(want))
    for k_, v in got.items():
        assert abs(v - want[k_]) < 1e-9


def test_embedding_neardup_lsh_recall(spark):
    from pg_textsearch_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.3, exact=True).collect()
    }
    lsh_pairs = embedding_neardup_pairs(
        emb, threshold=0.3, exact=False, n_bits=16, bands=8
    ).collect()
    lsh = {(r["vec_a"], r["vec_b"]) for r in lsh_pairs}
    # every LSH pair is exact-rescored -> no false positives
    assert lsh <= exact
    assert exact, "fixture must produce pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.5, (recall, len(exact), len(lsh))


def test_ngram_jaccard_hot_shingle_cap(spark):
    from pg_textsearch_spark.operators.dedup import ngram_jaccard_pairs

    # 30 docs all sharing one boilerplate prefix (a hot shingle bucket
    # that goes quadratic), plus one true near-dup pair
    boiler = "site nav footer"
    rows = [(i, f"{boiler} unique{i} filler{i} tail{i}") for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.1).collect()
    capped = ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=5).collect()
    # without the cap the boilerplate bucket pairs all 30 docs
    assert len(uncapped) >= 30 * 29 // 2
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    # with the cap only the true near-dup pair survives
    assert capped_pairs == {(100, 101)}, capped_pairs


def test_ann_lsh_recall_vs_bruteforce(spark):
    ensure_shipped(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = knn_bruteforce(emb, queries, k=5).collect()
    ann = ann_lsh_topk(emb, queries, k=5, n_bits=16, bands=8).collect()
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf}
    ann_set = {(r["query_id"], r["vec_id"]) for r in ann}
    recall = len(bf_set & ann_set) / len(bf_set)
    # 8 bands of 2 bits = generous candidate net on random vectors
    assert recall >= 0.5, recall
    # rank 1 must be the query itself (cos = 1)
    for r in ann:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]


def test_ann_ivf_recall_vs_bruteforce(spark):
    from pg_textsearch_spark.operators.knn import ann_ivf_topk
    from pg_textsearch_spark.plans.explain import assert_no_nested_loop

    ensure_shipped(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = knn_bruteforce(emb, queries, k=5).collect()
    ivf = ann_ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3)
    assert_no_nested_loop(ivf)
    ivf_rows = ivf.collect()
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf}
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf_rows}
    recall = len(bf_set & ivf_set) / len(bf_set)
    # probing 3 of 8 lists on random-ish vectors: modest but real
    assert recall >= 0.5, recall
    # rank 1 must be the query itself (its own list is always probed)
    for r in ivf_rows:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]


def test_ann_ivf_deterministic(spark):
    from pg_textsearch_spark.operators.knn import ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = [tuple(r) for r in ann_ivf_topk(emb, queries, k=5).collect()]
    b = [tuple(r) for r in ann_ivf_topk(emb, queries, k=5).collect()]
    assert sorted(a) == sorted(b)
