"""Streaming exact dedup — custom stateful operator on
``applyInPandasWithState``.

A training-data ingest pipeline dedups continuously, not just in bulk:
each arriving document must be flagged against every text ever seen,
across micro-batches. That is cross-batch keyed state — exactly what
Structured Streaming's ``applyInPandasWithState`` provides (state store
checkpointing, exactly-once per trigger).

Semantics match the batch operator (operators/dedup.dedup_exact): the
dedup key is (xxhash64(text), length(text)) — the 12-byte shuffle key,
never the body — and the canonical doc is the first occurrence (lowest
doc_id within its arrival micro-batch; earlier batches always win).
Output: one row per input doc, ``is_duplicate`` False only for the
first occurrence of each distinct text in stream order.

State per distinct text is ONE boolean — at 100 TB the state store
holds one entry per distinct document seen, sharded by the group key
across executors, RocksDB-backed on a real cluster.

Not SQL-expressible (stateful streaming) -> pytest-pinned
(tests/test_streaming.py) with a two-micro-batch file-source run
asserting state survives the batch boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    events: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming docs -> streaming (doc_id, is_duplicate).

    ``events`` must be a streaming DataFrame. Use ``is_duplicate =
    false`` rows as the deduped feed; the flagged rows remain available
    for audit/metrics.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = events.select(
        F.xxhash64(F.col(text_col)).alias("_h"),
        F.length(F.col(text_col)).alias("_len"),
        F.col(id_col).cast("long").alias("doc_id"),
    )

    def flag(key, pdf_iter, state):
        ids: list[int] = []
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()  # lowest id in this batch is the in-batch canonical
        seen_before = state.exists
        if not seen_before:
            state.update((True,))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "is_duplicate": [seen_before or i > 0 for i in range(len(ids))],
            }
        )

    return keyed.groupBy("_h", "_len").applyInPandasWithState(
        flag,
        outputStructType="doc_id long, is_duplicate boolean",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
