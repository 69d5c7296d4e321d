"""Ranking-quality smoke on real-ish prose with the english config
(stemming + stopwords through the full index path) — the reference's
aerodocs/Cranfield quality tests in miniature (FIXTURES.md F7,
test/README.md:26). Also pins the F3 two-doc golden case."""

import pytest

from pg_textsearch_spark.index.builder import build_index
from pg_textsearch_spark.operators.bmw import topk_bmw
from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
from tests.cranfield_data import CRANFIELD_DOCS, GOLDEN, full_text

DOCS = [
    (1, "The turbulent boundary layer on a flat plate develops downstream "
        "of the leading edge and its thickness grows with Reynolds number."),
    (2, "Supersonic flow over a slender cone produces an attached shock "
        "wave whose angle depends on the Mach number."),
    (3, "Heat transfer in hypersonic vehicles is dominated by stagnation "
        "point heating which scales with nose radius."),
    (4, "The lift coefficient of a thin airfoil varies linearly with angle "
        "of attack until stall, as predicted by thin airfoil theory."),
    (5, "Numerical methods for solving the compressible Navier Stokes "
        "equations require shock capturing schemes."),
    (6, "A recipe for sourdough bread requires patient fermentation and a "
        "well maintained starter culture."),
]

QUERIES = {
    "boundary layer thickness": 1,
    "shock wave mach cone": 2,
    "stagnation heating hypersonic": 3,
    "airfoil lift stall": 4,
    "navier stokes shock capturing": 5,
    "sourdough fermentation": 6,
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("quality") / "idx")
    build_index(spark, docs, d, config="english", n_buckets=4)
    return BM25Index(spark, d)


@pytest.mark.parametrize("query,expected_top", list(QUERIES.items()))
def test_relevant_doc_ranks_first(idx, query, expected_top):
    res = topk_exhaustive(idx, query, 3).collect()
    assert res and res[0]["doc_id"] == expected_top, [
        (r["doc_id"], r["score"]) for r in res
    ]
    bmw = topk_bmw(idx, query, 3).collect()
    assert bmw[0]["doc_id"] == expected_top


def test_stemming_unifies_morphology(idx):
    # query 'heated stagnating' stems to 'heat stagnat' — must still
    # retrieve doc 3 ('heating', 'stagnation') via shared stems
    res = topk_exhaustive(idx, "heated stagnating vehicles", 2).collect()
    assert res and res[0]["doc_id"] == 3


def test_f3_two_doc_golden(spark, tmp_path):
    # FIXTURES.md F3 (reference test/sql/scoring1.sql): smallest case
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "goodbye cruel world")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "f3")
    build_index(spark, docs, d, config="english", n_buckets=2)
    idx = BM25Index(spark, d)
    hello = topk_exhaustive(idx, "hello", 2).collect()
    assert [r["doc_id"] for r in hello] == [1]
    # reference golden score 0.7549 for k1=1.2 b=0.75 at 4 decimals
    assert abs(hello[0]["score"] - 0.7549) < 5e-4, hello[0]["score"]
    cruel = topk_exhaustive(idx, "cruel", 2).collect()
    assert [r["doc_id"] for r in cruel] == [2]


def test_empty_doc_counts_in_corpus_stats(spark, tmp_path):
    # a doc whose text tokenizes to nothing still occupies a doc_id and
    # contributes to N (reference docmap registers every indexed row)
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "!!! ..."), (3, "hello again")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "empty")
    build_index(spark, docs, d, config="ascii", n_buckets=2)
    idx = BM25Index(spark, d)
    assert idx.num_docs == 3
    dl = {r["doc_id"]: (r["doc_len"], r["fieldnorm"])
          for r in idx.doclen().collect()}
    assert dl[2] == (0, 0)
    assert idx.total_tokens == 4
    res = topk_exhaustive(idx, "hello", 3).collect()
    assert {r["doc_id"] for r in res} == {1, 3}


def test_custom_k1_b_options(spark, tmp_path):
    # k1/b are per-index options (reference: handler.c:129-150); verify
    # a non-default build against the closed-form formula
    import math

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"), (3, "banana date")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "kb")
    k1, b = 0.9, 0.4
    build_index(spark, docs, d, config="ascii", n_buckets=2, k1=k1, b=b)
    idx = BM25Index(spark, d)
    assert (idx.k1, idx.b) == (k1, b)
    res = topk_exhaustive(idx, "apple", 3).collect()
    # hand-computed: N=3, df(apple)=2, avgdl=7/3; dl quantized == raw here
    idf = math.log1p((3 - 2 + 0.5) / (2 + 0.5))
    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (7 / 3)))
    want = sorted(
        [(1, score(2, 3)), (2, score(1, 2))], key=lambda x: -x[1]
    )
    got = [(r["doc_id"], r["score"]) for r in res]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9


def test_empty_corpus_index(spark, tmp_path):
    # degenerate but must not crash: build over zero docs, query it
    docs = spark.createDataFrame([], "doc_id long, text string")
    d = str(tmp_path / "empty_corpus")
    build_index(spark, docs, d, config="ascii", n_buckets=4)
    idx = BM25Index(spark, d)
    assert idx.num_docs == 0
    assert topk_exhaustive(idx, "hello", 5).collect() == []
    from pg_textsearch_spark.operators.bmw import topk_bmw

    assert topk_bmw(idx, "hello", 5).collect() == []


# ---------------------------------------------------------------------------
# Cranfield subset vs the reference's PUBLISHED scores — the real-text
# ranking-quality check (reference: test/sql/aerodocs.sql + its
# expected output). The reference validates its engine on these exact
# 10 abstracts and 3 queries; we replay them through our full engine
# (pg_english config: the PG default-parser token classes matter — the
# corpus is dense with hyphenated compounds like 'boundary-layer') and
# require per-rank score agreement within 1e-3 of the published
# numbers — the reference's own acceptance rule against its SQL
# oracle. The round-2 residual (~1e-3, worst 1.05e-3) was traced to a
# single corpus-wide token: PG's hyphenated-word classes accept
# digit-LEADING compounds, so doc 7's unique '12-in.' must emit
# numhword '12-in' + parts (2 surviving lexemes), not uint 12 alone.
# With that class fixed the worst residual is 3.5e-5 — inside the
# published scores' own 4-decimal rounding.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cranfield_idx(spark, tmp_path_factory):
    rows = [(doc[0], full_text(doc)) for doc in CRANFIELD_DOCS]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("cranfield") / "idx")
    build_index(spark, docs, d, config="pg_english", n_buckets=4)
    return BM25Index(spark, d)


@pytest.mark.parametrize("query", sorted(GOLDEN))
def test_cranfield_matches_reference_published_ranking(cranfield_idx, query):
    want = GOLDEN[query]
    got = topk_exhaustive(cranfield_idx, query, k=len(want)).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, ref_score) in zip(got, want):
        assert abs(r["score"] - ref_score) <= 1e-3, (query, r, ref_score)


def test_cranfield_bmw_parity(cranfield_idx):
    for query in GOLDEN:
        exh = topk_exhaustive(cranfield_idx, query, 10).collect()
        bmw = topk_bmw(cranfield_idx, query, 10).collect()
        assert [(r["rank"], r["doc_id"]) for r in exh] == [
            (r["rank"], r["doc_id"]) for r in bmw
        ]


def test_cranfield_mrr_at_10_vs_reference():
    # MRR@10 treating the reference's published rank-1 doc as the
    # relevant one (the reference has no qrels in-repo; its own quality
    # bar is rank/score agreement). Computed over the pure-python
    # oracle so the number is pinned exactly.
    from pg_textsearch_spark.functions.fieldnorm import (
        FIELDNORM_DECODE_TABLE,
        encode_fieldnorm,
    )
    from pg_textsearch_spark.functions.tokenizer import (
        tokenize,
        tokenize_query,
    )
    import math

    import numpy as np

    full = {doc[0]: full_text(doc) for doc in CRANFIELD_DOCS}
    tfs = {d: tokenize(t, "pg_english") for d, t in full.items()}
    n = len(tfs)
    dls = {d: sum(v.values()) for d, v in tfs.items()}
    avgdl = sum(dls.values()) / n

    def rank(query):
        qtf = tokenize_query(query, "pg_english")
        dfc = {t: sum(1 for d in tfs if t in tfs[d]) for t in qtf}
        scores = {}
        for d in tfs:
            dl = float(
                FIELDNORM_DECODE_TABLE[
                    int(encode_fieldnorm(np.array([dls[d]]))[0])
                ]
            )
            s = 0.0
            for t, qf in qtf.items():
                if dfc.get(t, 0) == 0 or t not in tfs[d]:
                    continue
                idf = math.log1p((n - dfc[t] + 0.5) / (dfc[t] + 0.5))
                s += idf * tfs[d][t] * 2.2 / (
                    tfs[d][t] + 1.2 * (0.25 + 0.75 * dl / avgdl)
                ) * qf
            if s > 0:
                scores[d] = s
        return [d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))]

    rr = []
    for query, want in GOLDEN.items():
        ranked = rank(query)[:10]
        rel = want[0][0]
        rr.append(1.0 / (ranked.index(rel) + 1) if rel in ranked else 0.0)
    mrr = sum(rr) / len(rr)
    assert mrr == 1.0, rr  # pinned quality number (see BASELINE.md)
