"""Synthetic Common-Crawl-style ``pages`` corpus + HTML->text extraction.

The BASELINE input_hint fixes the input shape: an Iceberg table
``pages(url, warc_ts, html, text, lang)`` with the per-row invariant
"byte-identical extracted text per url". The reference's benchmark
corpora are pre-extracted TSVs (reference:
benchmarks/datasets/msmarco/load.sql:26-52), so HTML extraction is our
front-end addition, implemented as a vectorized pandas UDF.

Generation is fully distributed and deterministic: ``spark.range``
over doc ids -> ``mapInPandas`` where each row's content derives only
from (seed, doc_id) — independent of partitioning, ordering, or
cluster size. Vocabulary is Zipf-distributed (~head terms get huge
posting lists, exercising the salted-run skew path) with per-doc
unique tail terms (exercising the long dictionary tail), doc lengths
log-normal around the reference's MS MARCO mean of ~29 lexemes with a
tail past 39 so fieldnorm quantization is exercised
(FIXTURES.md F1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy mix


_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized counter-based PRNG step (splitmix64, public domain
    algorithm). Content derives purely from the input counter, so the
    corpus is identical under any partitioning or cluster size."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
        return x ^ (x >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


class _VocabModel:
    """Zipf(1.15) vocabulary with precomputed inverse CDF + term strings."""

    def __init__(self, vocab_size: int):
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        w = ranks ** -1.15
        self.cdf = np.cumsum(w) / w.sum()
        self.terms = np.array([f"t{i}" for i in range(vocab_size)])


_VOCAB_CACHE: dict[int, _VocabModel] = {}


def _batch_texts(seed: int, ids: np.ndarray, vocab_size: int) -> list[str]:
    """Deterministic texts for a batch of doc ids — fully vectorized.

    Per doc: length ~ lognormal(ln 29, 0.7) via Box-Muller over two
    counter-based uniforms; tokens ~ bounded Zipf via inverse CDF;
    ~10% of docs append 1-2 globally-unique tail terms.
    """
    vm = _VOCAB_CACHE.setdefault(vocab_size, _VocabModel(vocab_size))
    ids = ids.astype(np.uint64)
    np.seterr(over="ignore")  # uint64 counter arithmetic wraps by design
    base = np.uint64((seed * 0xA24BAED4963EE407) & 0xFFFFFFFFFFFFFFFF)
    # doc lengths
    u1 = _u01(base ^ (ids * np.uint64(3)))
    u2 = _u01(base ^ (ids * np.uint64(3) + np.uint64(1)))
    z = np.sqrt(-2.0 * np.log(u1 + 1e-18)) * np.cos(2.0 * np.pi * u2)
    n = np.maximum(3, np.exp(np.log(29.0) + 0.7 * z).astype(np.int64))
    # token ranks, flat over all docs in the batch
    doc_rep = np.repeat(ids, n)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    pos = np.arange(int(n.sum()), dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), n
    )
    u = _u01(base ^ (doc_rep * np.uint64(0x9E3779B1)) ^ (pos * np.uint64(0x85EBCA77)))
    ranks = np.searchsorted(vm.cdf, u, side="left")
    words = vm.terms[np.minimum(ranks, vocab_size - 1)]
    # unique-tail terms for ~10% of docs
    u_tail = _u01(base ^ (ids * np.uint64(7) + np.uint64(5)))
    bounds = np.cumsum(n)
    out = []
    word_lists = np.split(words, bounds[:-1])
    for i, wl in enumerate(word_lists):
        s = " ".join(wl)
        if u_tail[i] < 0.1:
            extra = 1 + (int(ids[i]) & 1)
            s += "".join(f" u{int(ids[i])}x{j}" for j in range(extra))
        out.append(s)
    return out


def _wrap_html(url: str, text: str) -> bytes:
    return (
        f"<html><head><title>{url}</title></head>\n"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 50_000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic distributed pages corpus (no driver-side data)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            urls = [f"https://example.org/doc/{i:012d}" for i in ids]
            texts = _batch_texts(seed, ids, vocab_size)
            langs = [_LANGS[int(i) % len(_LANGS)] for i in ids]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.to_datetime(
                        (1_600_000_000 + ids * 17) * 1_000_000_000
                    ),
                    "html": [
                        _wrap_html(u, t) for u, t in zip(urls, texts)
                    ],
                    "text": texts,
                    "lang": langs,
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def extract_text_udf():
    """pandas UDF: html binary -> extracted text (operator I5).

    Deterministic and byte-identical per url (input_hint invariant):
    strip tags, collapse whitespace. Real-world extraction (trafilatura
    etc.) would slot in here; the Spark-side plumbing (binary column in,
    Arrow batches, string column out) is the contract.
    """
    import re

    tag_re = re.compile(rb"<[^>]*>")
    ws_re = re.compile(rb"\s+")

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            stripped = tag_re.sub(b" ", bytes(b))
            return ws_re.sub(b" ", stripped).strip().decode("utf-8", "ignore")

        return html.map(one)

    return _extract


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """pages(html,...) -> + extracted_text column."""
    return pages.withColumn("extracted_text", extract_text_udf()(F.col("html")))
