"""Golden query sweep: a persisted ~200-query TSV over the synthetic
sf0.001 documents corpus, mirroring the shape of the reference's
MS MARCO validation set (benchmarks/datasets/msmarco/
validate_queries.sql: per-query per-rank doc + score ground truth,
checked at 1e-3). The reference's 691-query set is network-blocked
here, so the sweep is generated deterministically from the corpus
vocabulary and the expected rankings come from the pure-python oracle
(tokenize + quantized-dl BM25 — the same arithmetic the engine's
conformance fixtures pin).

Regenerate with:  python tests/golden_sweep.py
(only needed if the corpus, tokenizer semantics, or BM25 constants
consciously change — the TSV is a frozen artifact like the parser
fixtures).
"""

from __future__ import annotations

import math
import os
import random

import numpy as np

DOCS_PARQUET = "/root/testdata/sf0.001/documents.parquet"
TSV_PATH = os.path.join(os.path.dirname(__file__), "golden_queries.tsv")
CONFIG = "ascii"
K = 10
N_QUERIES = 200
SEED = 20260816
K1, B = 1.2, 0.75


def load_corpus():
    import pyarrow.parquet as pq

    t = pq.read_table(DOCS_PARQUET, columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def corpus_stats(docs: dict):
    from pg_textsearch_spark.functions.tokenizer import tokenize

    tfs = {d: tokenize(t, CONFIG) for d, t in docs.items()}
    dls = {d: sum(v.values()) for d, v in tfs.items()}
    return tfs, dls


def oracle_topk(tfs, dls, query: str, k: int = K):
    """Pure-python BM25 top-k with quantized doc lengths — identical
    per-term arithmetic to the engine and the DuckDB oracle."""
    from pg_textsearch_spark.functions.fieldnorm import (
        FIELDNORM_DECODE_TABLE,
        encode_fieldnorm,
    )
    from pg_textsearch_spark.functions.tokenizer import tokenize_query

    qtf = tokenize_query(query, CONFIG)
    n = len(tfs)
    total = sum(dls.values())
    avgdl = total / n if n else 0.0
    dfc = {t: sum(1 for d in tfs if t in tfs[d]) for t in qtf}
    scores: dict[int, float] = {}
    for d in tfs:
        dl = float(
            FIELDNORM_DECODE_TABLE[
                int(encode_fieldnorm(np.asarray([dls[d]], dtype=np.int64))[0])
            ]
        )
        s = 0.0
        hit = False
        for t, qf in qtf.items():
            df = dfc.get(t, 0)
            if df == 0 or t not in tfs[d]:
                continue
            hit = True
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            tf = tfs[d][t]
            s += idf * tf * (K1 + 1.0) / (
                tf + K1 * ((1.0 - B) + B * dl / avgdl)
            ) * qf
        if hit:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def gen_queries(tfs) -> dict[str, str]:
    """Deterministic mixed-shape query set over the corpus vocabulary:
    1-4 terms, df-weighted sampling (head AND tail terms), plus
    repeated-term and absent-term variants."""
    dfc: dict[str, int] = {}
    for v in tfs.values():
        for t in v:
            dfc[t] = dfc.get(t, 0) + 1
    vocab = sorted(dfc)
    weights = [dfc[t] for t in vocab]
    rng = random.Random(SEED)
    queries: dict[str, str] = {}
    i = 0
    while len(queries) < N_QUERIES:
        shape = i % 10
        if shape < 2:
            terms = rng.choices(vocab, weights=weights, k=1)
        elif shape < 5:
            terms = rng.choices(vocab, weights=weights, k=2)
        elif shape < 7:
            terms = rng.choices(vocab, weights=weights, k=3)
        elif shape < 8:
            terms = rng.choices(vocab, weights=weights, k=4)
        elif shape == 8:  # repeated term (query_freq multiplier)
            t = rng.choice(vocab)
            terms = [t, t, rng.choice(vocab)]
        else:  # tail terms + one absent term
            terms = [rng.choice(vocab[:200]), "zzabsentterm"]
        queries[f"g{i:03d}"] = " ".join(terms)
        i += 1
    return queries


def main() -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    docs = load_corpus()
    tfs, dls = corpus_stats(docs)
    queries = gen_queries(tfs)
    lines = ["query_id\tquery\trank\tdoc_id\tscore"]
    for qid in sorted(queries):
        for rank, (doc, score) in enumerate(
            oracle_topk(tfs, dls, queries[qid]), start=1
        ):
            lines.append(f"{qid}\t{queries[qid]}\t{rank}\t{doc}\t{score:.12g}")
    with open(TSV_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {TSV_PATH}: {len(queries)} queries, {len(lines) - 1} rows")


if __name__ == "__main__":
    main()
