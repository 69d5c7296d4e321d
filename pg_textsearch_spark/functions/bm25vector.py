"""bm25vector type I/O: text form, equality, and the v2 wire format.

The reference's ``bm25vector`` is its tsvector analog — a tokenized
document ``(lexeme, frequency)*`` tagged with the owning index's name.
This module re-specifies its three I/O surfaces over the engine's
native representation (a ``{term: tf}`` dict / ``array<struct<term,
tf>>`` column):

- **text form** ``'index_name:{lexeme:freq,...}'`` — parse
  (``tpvector_in``, reference src/types/vector.c:236-352) and
  canonical output (``tpvector_out``, vector.c:493-558; entries in
  bytewise-sorted lexeme order, the ``qsort(strcmp)`` at
  vector.c:771).
- **equality** — order-insensitive because both sides canonicalize
  (``tpvector_eq``, vector.c:626-692; test/sql/vector.sql:54-55).
- **v2 wire format** (``tpvector_send``/``tpvector_recv``,
  vector.c:562-624; layout spec vector.h:7-54): a 4-byte big-endian
  total size (the ``pq_sendint32`` framing, which on receive becomes
  the varlena ``vl_len_``), then magic ``"BM25"``, version byte 2,
  3 reserved zero bytes, int32 ``index_name_len``, int32
  ``entry_count`` (struct fields in little-endian host order, as a
  memory image of the varlena), the NUL-terminated index name padded
  to MAXALIGN(8), then per entry LEB128 varints ``frequency`` and
  ``lexeme_len`` followed by the raw lexeme bytes
  (``tpvector_varint_encode``, vector.c:57-69).

Construction sorts entries by lexeme bytes and keeps duplicates,
exactly like ``create_tpvector_from_strings`` (vector.c:739-838);
validation mirrors ``tpvector_validate_v2`` (vector.c:172-233): magic,
version, name-length bound (TP_MAX_INDEX_NAME_LENGTH=1024,
constants.h:123), non-negative counts, and entry-stream bounds.

Spark columns: ``to_bm25vector_col`` / ``bm25vector_text_col`` /
``bm25vector_binary_col`` are lazily-created pandas UDFs (module
import never touches a SparkContext).
"""

import struct

import pandas as pd

MAGIC = b"BM25"
VERSION = 2
MAXALIGN = 8
MAX_INDEX_NAME_LENGTH = 1024
#: struct TpVector header bytes after the 4-byte size: magic(4) +
#: version(1) + reserved(3) + index_name_len(4) + entry_count(4)
_HEADER = 16
#: the reference allocates MAXALIGN(sizeof(TpVector)) = MAXALIGN(20)
#: bytes for the header (vector.c sizing), leaving 4 slack bytes that
#: physically trail the entry stream in send output
MAXALIGN_HEADER = -(4 + _HEADER) % MAXALIGN + (4 + _HEADER)


class BM25VectorError(ValueError):
    """Invalid bm25vector text or binary representation."""


def _varint_encode(v: int) -> bytes:
    if v < 0 or v >= 1 << 32:
        raise BM25VectorError(f"varint out of uint32 range: {v}")
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0xFF) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _varint_decode(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while pos < end and buf[pos] & 0x80:
        result |= (buf[pos] & 0x7F) << shift
        shift += 7
        pos += 1
        if shift >= 32:
            raise BM25VectorError("bm25vector varint exceeds 32 bits")
    if pos >= end:
        raise BM25VectorError("bm25vector varint truncated")
    result |= buf[pos] << shift
    return result, pos + 1


def canonical_entries(entries) -> list[tuple[str, int]]:
    """Sort (lexeme, freq) pairs by lexeme BYTES (the reference's
    ``qsort(strcmp)`` over UTF-8 C strings — Python's code-point sort
    gives the same order because UTF-8 preserves it). Duplicates are
    kept, like create_tpvector_from_strings."""
    if isinstance(entries, dict):
        entries = entries.items()
    out = []
    for lex, freq in entries:
        freq = int(freq)
        if freq < 0:
            raise BM25VectorError(
                f"negative frequency in tpvector entry: {freq}"
            )
        out.append((str(lex), freq))
    out.sort(key=lambda p: p[0])
    return out


def parse_bm25vector(text: str) -> tuple[str, list[tuple[str, int]]]:
    """``'index_name:{lexeme:freq,...}'`` -> (index_name, sorted
    entries). Error behavior mirrors tpvector_in: a colon separates
    the name (everything before the FIRST colon) from the braced
    entry list; each entry's colon must precede its comma; negative
    frequencies are rejected."""
    colon = text.find(":")
    if colon < 0:
        raise BM25VectorError(
            f'invalid input syntax for type tpvector: "{text}" '
            '(expected "index_name:{lexeme:freq,...}")'
        )
    index_name = text[:colon]
    entries_str = text[colon + 1:]
    if (
        len(entries_str) < 2
        or not entries_str.startswith("{")
        or not entries_str.endswith("}")
    ):
        raise BM25VectorError(
            f'invalid tpvector format: "{text}" '
            "(entries must be enclosed in braces)"
        )
    body = entries_str[1:-1]
    entries: list[tuple[str, int]] = []
    if body:
        for part in body.split(","):
            ec = part.find(":")
            if ec < 0:
                raise BM25VectorError(
                    f'invalid entry format in tpvector: "{part}"'
                )
            try:
                freq = int(part[ec + 1:], 10)
            except ValueError as exc:
                raise BM25VectorError(
                    f'invalid frequency in tpvector entry: "{part}"'
                ) from exc
            entries.append((part[:ec], freq))
    return index_name, canonical_entries(entries)


def format_bm25vector(index_name: str, entries) -> str:
    """Canonical text output (tpvector_out): sorted entries, no
    whitespace: ``index_name:{a:1,b:2}``."""
    es = canonical_entries(entries)
    return index_name + ":{" + ",".join(f"{t}:{f}" for t, f in es) + "}"


def bm25vector_eq(a, b) -> bool:
    """Order-insensitive equality: index names AND canonicalized
    entry lists must match (tpvector_eq)."""
    an, ae = a if isinstance(a, tuple) else parse_bm25vector(a)
    bn, be = b if isinstance(b, tuple) else parse_bm25vector(b)
    return an == bn and canonical_entries(ae) == canonical_entries(be)


def encode_bm25vector(index_name: str, entries) -> bytes:
    """(index_name, entries) -> v2 wire bytes, including the 4-byte
    big-endian total-size framing (what COPY BINARY carries; the
    receiver reinterprets it as the varlena length)."""
    name_b = index_name.encode("utf-8")
    if len(name_b) > MAX_INDEX_NAME_LENGTH:
        raise BM25VectorError(
            f"invalid index name length in bm25vector: {len(name_b)}"
        )
    es = canonical_entries(entries)
    pad = -(len(name_b) + 1) % MAXALIGN
    body = bytearray()
    body += MAGIC
    body += bytes([VERSION, 0, 0, 0])
    body += struct.pack("<ii", len(name_b), len(es))
    body += name_b + b"\x00" + b"\x00" * pad
    for lex, freq in es:
        lex_b = lex.encode("utf-8")
        body += _varint_encode(freq)
        body += _varint_encode(len(lex_b))
        body += lex_b
    # the reference sizes the value as MAXALIGN(sizeof(TpVector)) = 24
    # (not the packed 20 bytes of header fields), so its send output
    # carries 4 slack bytes after the entry stream — emit them for
    # byte-for-byte wire parity (decode walks entries by count and
    # tolerates the trailing slack either way)
    body += b"\x00" * (MAXALIGN_HEADER - (4 + _HEADER))
    return struct.pack(">I", len(body) + 4) + bytes(body)


def decode_bm25vector(buf: bytes) -> tuple[str, list[tuple[str, int]]]:
    """v2 wire bytes -> (index_name, entries); validation mirrors
    tpvector_validate_v2 (magic, version, name bound, entry-stream
    bounds) with the same error messages."""
    if len(buf) < 4 + _HEADER:
        raise BM25VectorError(f"v2 bm25vector too small: {len(buf)}")
    (total,) = struct.unpack(">I", buf[:4])
    if total != len(buf):
        raise BM25VectorError(
            f"bm25vector varlena length {total} does not match buffer "
            f"length {len(buf)}"
        )
    if buf[4:8] != MAGIC:
        raise BM25VectorError("bm25vector buffer has wrong magic bytes")
    if buf[8] != VERSION:
        raise BM25VectorError(f"unsupported bm25vector version: {buf[8]}")
    name_len, entry_count = struct.unpack("<ii", buf[12:20])
    if name_len < 0 or name_len > MAX_INDEX_NAME_LENGTH:
        raise BM25VectorError(
            f"invalid index name length in bm25vector: {name_len}"
        )
    if entry_count < 0:
        raise BM25VectorError(
            f"invalid entry count in bm25vector: {entry_count}"
        )
    name_end = 4 + _HEADER + name_len
    if name_end > len(buf):
        raise BM25VectorError("bm25vector header overruns varlena")
    index_name = buf[4 + _HEADER: name_end].decode("utf-8")
    pos = 4 + _HEADER + (name_len + 1 + (-(name_len + 1) % MAXALIGN))
    end = len(buf)
    entries: list[tuple[str, int]] = []
    for i in range(entry_count):
        if pos >= end:
            raise BM25VectorError(f"v2 bm25vector entry {i} truncated")
        freq, pos = _varint_decode(buf, pos, end)
        lex_len, pos = _varint_decode(buf, pos, end)
        if pos + lex_len > end:
            raise BM25VectorError(
                f"v2 bm25vector entry {i} lexeme extends beyond buffer"
            )
        entries.append((buf[pos: pos + lex_len].decode("utf-8"), freq))
        pos += lex_len
    return index_name, entries


def to_bm25vector(
    text: str, config: str = "english", index_name: str = ""
) -> tuple[str, list[tuple[str, int]]]:
    """Tokenize with the index's text config and canonicalize — the
    reference's ``to_bm25vector(text, index_name)`` (it resolves the
    config from the named index; here the config is passed since an
    index handle is optional)."""
    from pg_textsearch_spark.functions.tokenizer import tokenize

    return index_name, canonical_entries(tokenize(text, config))


# ---------------------------------------------------------------------------
# Spark columns (lazy pandas UDFs — no SparkContext at import time)
# ---------------------------------------------------------------------------


def bm25vector_text_col(config: str = "english", index_name: str = ""):
    """pandas UDF: text column -> canonical bm25vector text form."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _f(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None
            if t is None
            else format_bm25vector(*to_bm25vector(t, config, index_name))
        )

    return _f


def bm25vector_binary_col(config: str = "english", index_name: str = ""):
    """pandas UDF: text column -> v2 wire bytes (tpvector_send)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _f(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            name, es = to_bm25vector(t, config, index_name)
            return encode_bm25vector(name, es)

        return texts.map(one)

    return _f


def parse_bm25vector_col():
    """pandas UDF: bm25vector text-form column ->
    array<struct<term:string, tf:int>> (the engine's native tokenized
    shape), dropping the index-name tag."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<term:string,tf:int>>")
    def _f(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            _name, es = parse_bm25vector(t)
            return [{"term": lex, "tf": f} for lex, f in es]

        return texts.map(one)

    return _f
