"""BM25 scoring math — the one formula everything else serves.

Reference semantics:
- IDF = ln(1 + (N - df + 0.5) / (df + 0.5)), always >= 0
  (reference: src/scoring/bm25.c:28-35).
- per-(doc,term) score = idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
  multiplied by the query-term frequency; doc score = sum over query
  terms (reference: bmw.c:382-396,1450-1457).
- dl is the *quantized* doc length decode(encode(doc_len));
  avgdl = total_len / N over *raw* lengths (reference:
  bm25.c:155-191, query.c:863-944, segment/scan.c:392).
- defaults k1=1.2, b=0.75 (reference: src/constants.h:78-80).
- index-scan arithmetic is float32 (reference: bmw.c:382-396); the
  reference's own acceptance tolerance is 1e-3 absolute per rank.

Two implementations, same formula:
- numpy float32 kernels (reference-parity path, used inside scoring
  UDFs and the pandas oracle);
- Spark Column expressions in float64 (oracle-gated SQL-parity path —
  DuckDB computes in float64, so the gated queries do too).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:  # pragma: no cover — annotations only
    from pyspark.sql import Column

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


# ---------------------------------------------------------------------------
# numpy float32 kernels (reference parity)
# ---------------------------------------------------------------------------


def idf32(n_docs: int, df) -> np.ndarray:
    """IDF in float32, vectorized over df."""
    dfv = np.asarray(df, dtype=np.float32)
    n = np.float32(n_docs)
    return np.log1p((n - dfv + np.float32(0.5)) / (dfv + np.float32(0.5))).astype(
        np.float32
    )


def bm25_term_score32(
    tf,
    dl,
    idf,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> np.ndarray:
    """Per-posting BM25 contribution in float32 (no query_freq factor)."""
    tfv = np.asarray(tf, dtype=np.float32)
    dlv = np.asarray(dl, dtype=np.float32)
    idfv = np.asarray(idf, dtype=np.float32)
    k1f = np.float32(k1)
    bf = np.float32(b)
    norm = k1f * (np.float32(1.0) - bf + bf * dlv / np.float32(avgdl))
    return (idfv * tfv * (k1f + np.float32(1.0)) / (tfv + norm)).astype(np.float32)


# ---------------------------------------------------------------------------
# Spark Column expressions (float64, mirrors the DuckDB oracle exactly)
# ---------------------------------------------------------------------------


def idf_expr(n_docs: Column, df: Column) -> Column:
    from pyspark.sql import functions as F

    return F.log1p((n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))


def bm25_score_expr(
    tf: Column,
    dl: Column,
    idf: Column,
    avgdl: Column,
    query_freq: Column,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> Column:
    from pyspark.sql import functions as F

    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    return idf * tf * F.lit(k1 + 1.0) / (tf + norm) * query_freq


def bm25_score_sql(
    tf: str,
    dl: str,
    idf: str,
    avgdl: str,
    query_freq: str,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> str:
    """The identical formula as an ANSI-SQL string (for the DuckDB oracle)."""
    return (
        f"({idf}) * ({tf}) * {k1 + 1.0!r} / "
        f"(({tf}) + {k1!r} * ({1.0 - b!r} + {b!r} * ({dl}) / ({avgdl}))) * ({query_freq})"
    )


def idf_sql(n_docs: str, df: str) -> str:
    return f"ln(1.0 + (({n_docs}) - ({df}) + 0.5) / (({df}) + 0.5))"
