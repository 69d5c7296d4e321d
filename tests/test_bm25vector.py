"""bm25vector type I/O parity (reference: src/types/vector.c,
test/sql/vector.sql, test/sql/binary_io.sql)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_textsearch_spark.functions.bm25vector import (
    BM25VectorError,
    bm25vector_eq,
    decode_bm25vector,
    encode_bm25vector,
    format_bm25vector,
    parse_bm25vector,
    to_bm25vector,
)


def test_parse_and_canonical_output():
    # vector.sql:33 — entries come back sorted by lexeme
    name, es = parse_bm25vector("docs_vector_idx:{world:1,hello:2}")
    assert name == "docs_vector_idx"
    assert es == [("hello", 2), ("world", 1)]
    assert (
        format_bm25vector(name, es) == "docs_vector_idx:{hello:2,world:1}"
    )


def test_empty_vector():
    # vector.sql:34 — 'idx:{}' is valid and stays empty
    name, es = parse_bm25vector("docs_vector_idx:{}")
    assert (name, es) == ("docs_vector_idx", [])
    assert format_bm25vector(name, es) == "docs_vector_idx:{}"


def test_eq_is_order_insensitive():
    # vector.sql:54-55
    assert bm25vector_eq(
        "docs_vector_idx:{hello:1,world:2}",
        "docs_vector_idx:{hello:1,world:2}",
    )
    assert bm25vector_eq(
        "docs_vector_idx:{hello:1,world:2}",
        "docs_vector_idx:{world:2,hello:1}",
    )
    assert not bm25vector_eq(
        "docs_vector_idx:{hello:1,world:2}",
        "docs_vector_idx:{hello:1,world:3}",
    )
    assert not bm25vector_eq(
        "a:{hello:1}", "b:{hello:1}"
    )  # name is part of the value


@pytest.mark.parametrize(
    "bad",
    [
        "no_colon_anywhere",          # tpvector_in: missing ':'
        "idx:hello:1",                # entries not braced
        "idx:{hello}",                # entry without ':freq'
        "idx:{hello:x}",              # non-integer freq
        "idx:{hello:-1}",             # negative freq rejected explicitly
        "idx:{",                      # unterminated braces
    ],
)
def test_parse_errors(bad):
    with pytest.raises(BM25VectorError):
        parse_bm25vector(bad)


def test_entry_colon_must_precede_comma():
    # tpvector_in: "!entry_colon_pos || entry_colon_pos > comma_pos"
    with pytest.raises(BM25VectorError):
        parse_bm25vector("idx:{hello,world:1}")


def test_duplicates_kept_like_reference():
    # create_tpvector_from_strings sorts but never merges duplicates
    name, es = parse_bm25vector("idx:{b:1,a:2,b:3}")
    assert es == [("a", 2), ("b", 1), ("b", 3)]


def test_binary_layout_header():
    buf = encode_bm25vector("idx", {"hello": 2})
    assert buf[4:8] == b"BM25"          # magic
    assert buf[8] == 2                  # version
    assert buf[9:12] == b"\x00\x00\x00"  # reserved
    total = int.from_bytes(buf[:4], "big")
    assert total == len(buf)
    # index_name_len / entry_count little-endian host ints
    assert int.from_bytes(buf[12:16], "little") == 3
    assert int.from_bytes(buf[16:20], "little") == 1
    # name NUL-terminated and MAXALIGN(8)-padded: entries start at 28
    assert buf[20:24] == b"idx\x00"
    # entry: varint freq=2, varint len=5, b"hello"; then the 4 slack
    # bytes of MAXALIGN(sizeof(TpVector)) = 24 vs the packed 20-byte
    # header (tpvector_send sizing) trail the entry stream
    assert buf[28:] == bytes([2, 5]) + b"hello" + b"\x00" * 4


def test_binary_roundtrip_and_eq():
    # binary_io.sql: export -> import -> values compare equal
    vecs = [
        ("binary_io_idx", {"hello": 1, "world": 2, "test": 1}),
        ("binary_io_idx", {}),
        ("x" * 64, {"a" * 300: 1, "b": 200}),  # >127 lexeme len varint
    ]
    for name, entries in vecs:
        buf = encode_bm25vector(name, entries)
        got_name, got_entries = decode_bm25vector(buf)
        assert bm25vector_eq((got_name, got_entries), (name, entries))
        # re-encode is byte-identical (canonical form)
        assert encode_bm25vector(got_name, got_entries) == buf


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b[:5], "too small"),
        (lambda b: b[:4] + b"XXXX" + b[8:], "magic"),
        (lambda b: b[:8] + bytes([9]) + b[9:], "version"),
        (lambda b: b[:-1], "does not match buffer length"),
        (
            # cut past the 4 trailing slack bytes into the entry stream
            lambda b: (len(b) - 8).to_bytes(4, "big") + b[4:-8],
            "truncated|beyond buffer",
        ),
    ],
)
def test_binary_validation_errors(mutate, msg):
    import re

    buf = encode_bm25vector("idx", {"hello": 2, "compression": 1})
    with pytest.raises(BM25VectorError, match=msg) as exc:
        decode_bm25vector(mutate(buf))
    assert re.search(msg, str(exc.value))


@settings(max_examples=200, deadline=None)
@given(
    name=st.text(
        # valid UTF-8 only (PG text excludes lone surrogates)
        alphabet=st.characters(
            blacklist_characters=":",
            blacklist_categories=("Cs",),
            min_codepoint=33,
        ),
        min_size=1,
        max_size=40,
    ),
    entries=st.dictionaries(
        st.text(
            alphabet=st.characters(
                blacklist_characters=":,{}",
                blacklist_categories=("Cs",),
                min_codepoint=33,
            ),
            min_size=1,
            max_size=50,
        ),
        st.integers(min_value=0, max_value=2**31 - 1),
        max_size=20,
    ),
)
def test_text_and_binary_roundtrip_fuzz(name, entries):
    txt = format_bm25vector(name, entries)
    pname, pentries = parse_bm25vector(txt)
    assert bm25vector_eq((pname, pentries), (name, entries))
    buf = encode_bm25vector(name, entries)
    assert decode_bm25vector(buf) == (
        name,
        parse_bm25vector(txt)[1],
    )


def test_to_bm25vector_uses_text_config():
    # english config: stopwords dropped, stemming applied
    name, es = to_bm25vector(
        "running and the runner runs", "english", "docs_idx"
    )
    assert name == "docs_idx"
    d = dict(es)
    assert "and" not in d and "the" not in d
    assert d.get("run", 0) >= 2  # running + runs stem together


def test_spark_columns_roundtrip(spark):
    from pyspark.sql import functions as F

    from pg_textsearch_spark.functions.bm25vector import (
        bm25vector_binary_col,
        bm25vector_text_col,
        parse_bm25vector_col,
    )

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "database search"), (3, None)],
        "id int, content string",
    )
    out = df.select(
        "id",
        bm25vector_text_col("english", "docs_idx")("content").alias("txt"),
        bm25vector_binary_col("english", "docs_idx")("content").alias("bin"),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["txt"] == "docs_idx:{hello:2,world:1}"
    assert decode_bm25vector(bytes(rows[1]["bin"])) == (
        "docs_idx",
        [("hello", 2), ("world", 1)],
    )
    assert rows[3]["txt"] is None and rows[3]["bin"] is None
    back = out.where(F.col("txt").isNotNull()).select(
        "id", parse_bm25vector_col()("txt").alias("vec")
    )
    got = {r["id"]: [(e["term"], e["tf"]) for e in r["vec"]]
           for r in back.collect()}
    assert got[1] == [("hello", 2), ("world", 1)]
