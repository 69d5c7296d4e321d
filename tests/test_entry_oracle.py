"""Replicates the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at sf0.01; compare
row-count, schema-ish, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, ddb, name):
    import __spark_entry__ as entry

    qfn = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    sdf = qfn(spark, SF_DIR)

    if sql is None:
        # rows-only contract: runs, returns rows, stable schema
        rows = sdf.collect()
        assert len(rows) >= 0 and len(sdf.columns) > 0
        return

    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]

    ores = ddb.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = [dict(zip(ocols, row)) for row in ores.fetchall()]

    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    got = _norm(srows, scols)
    want = _norm(orows, ocols)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"rank", "doc_id", "score"} <= set(df.columns)
