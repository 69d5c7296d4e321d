"""Fieldnorm quantization: doc length -> 1 byte, Lucene SmallFloat style.

Reference semantics: pg_textsearch stores one fieldnorm byte per doc
and scores BM25 with ``dl = decode(encode(raw_doc_len))``
(reference: src/segment/fieldnorm.c:17-335, src/types/query.c:936-944,
src/segment/scan.c:392). The 256-entry decode table is Lucene
``SmallFloat.byte4ToInt``: ids 0..39 decode exactly to 0..39, then each
successive group of 8 ids advances by a doubling step (40,42,..54 |
56,60,..84 | ...). We *generate* the table rather than copy it; the
test suite pins every entry against frozen fixture values.

encode(length) = largest id i with table[i] <= length
(binary search in the reference, ``np.searchsorted(side='right')-1``
here — identical result, vectorized).
"""

from __future__ import annotations

import numpy as np


def _build_decode_table() -> np.ndarray:
    vals = list(range(40))  # ids 0..39: exact
    step = 2
    v = 40
    while len(vals) < 256:
        for _ in range(8):
            if len(vals) == 256:
                break
            vals.append(v)
            v += step
        step *= 2
    return np.asarray(vals, dtype=np.int64)


#: decode table, FIELDNORM_DECODE_TABLE[id] -> quantized doc length
FIELDNORM_DECODE_TABLE: np.ndarray = _build_decode_table()


def encode_fieldnorm(lengths) -> np.ndarray:
    """Vectorized doc-length -> fieldnorm-id (uint8).

    Largest table index whose value <= length; negative lengths clamp
    to 0.
    """
    arr = np.asarray(lengths, dtype=np.int64)
    ids = np.searchsorted(FIELDNORM_DECODE_TABLE, arr, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def decode_fieldnorm(ids) -> np.ndarray:
    """Vectorized fieldnorm-id -> quantized doc length (int64)."""
    arr = np.asarray(ids, dtype=np.int64)
    return FIELDNORM_DECODE_TABLE[arr]


def quantize_doc_len(lengths) -> np.ndarray:
    """decode(encode(len)) — the dl actually used in BM25 scoring."""
    return decode_fieldnorm(encode_fieldnorm(lengths))


def fieldnorm_encode_col(doc_len_col):
    """JVM Column expression computing ``encode_fieldnorm(doc_len)`` —
    ``size(filter(table, v -> v <= len)) - 1`` over the constant
    256-entry decode table (the same element_at-on-literal-table
    pattern as operators/score_expr).

    NOT used in the index build: higher-order array functions are
    interpreted and disable whole-stage codegen for their stage, which
    measured +33% on the 2M-page build (the tokenizer projection in
    the same stage loses codegen). The build uses the Arrow-batched
    UDF (builder._fieldnorm_udf); this expression exists for pure-SQL
    pipelines that cannot run Python workers at all."""
    from pyspark.sql import functions as F

    table = F.array(*[F.lit(int(v)) for v in FIELDNORM_DECODE_TABLE])
    idx = F.size(F.filter(table, lambda v: v <= doc_len_col)) - 1
    return F.greatest(idx, F.lit(0)).cast("int")


def fieldnorm_encode_expr(doc_len_col):
    """Whole-stage-codegen JVM expression for ``encode_fieldnorm``.

    Unlike ``fieldnorm_encode_col`` (a higher-order ``filter`` lambda,
    interpreted, disables codegen for its stage) this is a plain
    27-branch CASE over the table's exponent groups plus integer
    arithmetic, derived FROM the decode table itself: ids 0..39 are
    exact; past 40 each group of 8 ids advances by a doubling step, so
    ``id = 40 + 8*g + (len - start_g) / step_g`` within group g.
    Byte-identical to ``encode_fieldnorm`` for every int64 input
    (pinned by test_fieldnorm). Replaces the Arrow-batched UDF in the
    index build — the base-build stage then runs as ONE codegen span
    with no Python worker round trip (round 8, guide §4.1)."""
    from pyspark.sql import functions as F

    tbl = FIELDNORM_DECODE_TABLE
    L = doc_len_col.cast("long")
    # groups of 8 ids from id 40 on: (first_id, start_value, step)
    groups = []
    gid = 40
    while gid < 256:
        start = int(tbl[gid])
        step = int(tbl[gid + 1] - tbl[gid]) if gid + 1 < 256 else 1
        groups.append((gid, start, step))
        gid += 8
    # first-match-wins chain: identity range, then groups top-down.
    # (L - start) / step stays exact in the double division: doc_len
    # comes from array size / token counts, far below 2^53.
    expr = F.when(L < F.lit(40), F.greatest(L, F.lit(0)).cast("int"))
    for first_id, start, step in reversed(groups):
        expr = expr.when(
            L >= F.lit(start),
            F.least(
                F.lit(first_id)
                + F.floor((L - F.lit(start)) / F.lit(step)).cast("int"),
                F.lit(255),
            ),
        )
    return expr.otherwise(F.lit(0)).cast("int")


def fieldnorm_case_sql(col: str = "doc_len") -> str:
    """ANSI-SQL expression computing ``decode(encode(col))``.

    Emits a searched CASE over the 256 quantization boundaries so a
    DuckDB oracle can reproduce the quantized dl exactly. Used by
    ``__spark_entry__.oracle_sql`` — keeps the oracle self-contained.
    """
    tbl = FIELDNORM_DECODE_TABLE
    # decode(encode(L)) = tbl[i] for tbl[i] <= L < tbl[i+1]
    parts = ["CASE"]
    for i in range(255, 0, -1):
        parts.append(f"WHEN {col} >= {int(tbl[i])} THEN {int(tbl[i])}")
    parts.append("ELSE 0 END")
    return " ".join(parts)
