"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship BM25 top-k over sf0.001 documents.
``queries()``      — implemented operators (SURVEY.md §2), each
                     (spark, sf_dir) -> DataFrame running the real
                     engine (on-disk inverted index + query layer).
``oracle_sql()``   — index-free ANSI-SQL ground truth per query,
                     mirroring the reference's own validation strategy
                     (reference: test/sql/validation.sql:186-205).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_textsearch_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return harness.q_bm25_topk(harness.QUERY_MULTI)(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return harness.harness_queries()


def oracle_sql() -> dict[str, str]:
    return harness.harness_oracle_sql()
