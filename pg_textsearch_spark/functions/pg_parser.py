"""PG-default-parser-flavored tokenizer: typed token classes for web text.

The reference inherits PostgreSQL's *default* text-search parser: a
state machine that emits TYPED tokens — URLs, emails, hosts, file
paths, version numbers, numbers, and hyphenated compounds (which emit
the compound AND its parts) — and the text-search config then maps
each token type to a dictionary chain (stem+stopwords for word
classes, pass-through 'simple' for the rest). On real web text this
differs from a plain word-split on every line containing a URL or a
hyphenated word. References: the reference delegates to
``to_tsvector`` (src/access/build.c:734-788, README.md:581-629); the
token-class taxonomy is PostgreSQL's public documentation of the
default parser (textsearch-parsers: asciiword, word, numword,
asciihword/hword/numhword + their parts, email, url, host, url_path,
file, int, uint, float, sfloat, version, tag, entity, protocol,
blank).

This module re-specifies that taxonomy as a regex-alternation scanner.
It is a *documented approximation*, pinned by frozen fixtures in
tests/test_pg_parser.py — not bug-for-bug with Postgres (there is no
Postgres in this environment to diff against); divergences live at
rare punctuation edges, not in the class structure.

Emission rules (mirroring ts_debug output shape):

- ``http://example.com/a/b``  -> url "example.com/a/b", host
  "example.com", url_path "/a/b" (protocol head dropped — PG maps
  'protocol' to no dictionary).
- ``www.example.com`` / ``example.com`` -> host.
- ``user@example.com``        -> email (kept whole).
- ``/usr/local/lib``          -> file.
- ``state-of-the-art``        -> hword compound + one part per word.
- ``tapir-1.4``               -> numhword compound + parts.
- ``12-in``                   -> numhword compound + parts (PG's
  hyphenated-word classes accept digit-LEADING compounds as long as a
  letter appears somewhere — pinned by the Cranfield replay's
  ``12-in.`` token; all-digit pairs like ``1985-1990`` stay
  uint + int, and ``2e-3`` stays sfloat because sfloat outranks
  hword).
- ``1.2.3`` -> version; ``3.14`` -> float; ``1e-10`` -> sfloat;
  ``42`` -> uint; ``-1234`` / ``+7`` -> int (PG's signed-integer
  class — the sign binds only when freestanding: ``x-5`` is still a
  numhword compound); ``-3.14`` -> float, ``-2e-3`` -> sfloat.
- ``<div class="x">`` and ``&amp;`` -> skipped (tag/entity); quoted
  attribute values may contain ``>`` (``<img alt="x > y">`` is one
  tag) and ``<!-- ... -->`` comments are skipped whole; a bare
  protocol head (``http://`` with no host) is a 'protocol' token,
  also mapped to no dictionary.
- underscores separate words (PG behavior: foo_bar -> foo, bar).
- internal apostrophes stay in the word (PG behavior:
  ``to_tsvector('english', 'john''s')`` = 'john' — the parser emits
  the word WITH the apostrophe and Porter2 step 0 strips the
  possessive; splitting would leak a spurious ``s`` lexeme and
  inflate doc_len).

Class -> dictionary mapping (PG 'english' config): letter-only word
classes (word, hword, hword_part) get stopword removal + stemming;
everything else (numword, numhword, hword_numpart, email, url, host,
url_path, file, uint, float, sfloat, version) is lowercased verbatim.
"""

from __future__ import annotations

import re

#: token classes whose lexemes run through the stop+stem chain in an
#: english-style config (PG maps these to english_stem); all other
#: classes map to the pass-through 'simple' dictionary
PG_STEM_CLASSES = frozenset({"word", "hword", "hword_part"})

#: the tag class, shared verbatim with the fast path's TAG_SUB_RE:
#: an HTML comment (PG's wparser_def.c has a dedicated in-comment
#: state — the body may contain '>' freely), or a tag whose quoted
#: attribute values may contain '>' (the in-tag state machine
#: respects quotes: <img alt="x > y"> is ONE tag token). XML
#: declarations follow PG's TPS_InXMLBegin state exactly: after
#: ``<?`` only a literal lowercase ``x`` enters the in-tag state
#: (wparser_def.c: "Right now this accepts <?xZ"), so ``<?xml ...?>``
#: is a skipped tag while ``<?php echo ?>`` is NOT a tag — the ``?``
#: is a blank and ``php``/``echo`` tokenize as words.
TAG_PATTERN = (
    r"<!--(?:[^-]|-(?!->)){0,2047}-->"
    r"""|<(?:[/!]?[A-Za-z]|\?x)(?:[^<>"']|"[^"]*"|'[^']*'){0,1023}>"""
)

#: one alternation per token class, tried in priority order — the
#: scanner is leftmost-first, so longer/structured classes come first
_TOKEN_RE = re.compile(
    "(?P<tag>" + TAG_PATTERN + ")\n" + r"""
| (?P<entity>&\#?[A-Za-z0-9]{1,32};)
| (?P<url>
     [A-Za-z][A-Za-z0-9+.-]*://                    # protocol (dropped)
     (?P<u_host>[A-Za-z0-9](?:[A-Za-z0-9.-]*[A-Za-z0-9])?)
     (?P<u_path>/[^\s<>"'`]*)?
  )
| (?P<protocol>[A-Za-z][A-Za-z0-9+.-]*://)         # bare head: ts_debug
                                                   # maps 'protocol' to
                                                   # no dictionary
| (?P<email>[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+)
| (?P<hosturl>                                     # url without protocol
     (?P<h_host>[A-Za-z0-9][A-Za-z0-9-]*(?:\.[A-Za-z0-9-]+)+)
     (?P<h_path>/[^\s<>"'`]*)
  )
| (?P<host>[A-Za-z0-9][A-Za-z0-9-]*(?:\.[A-Za-z][A-Za-z0-9-]*)+)
| (?P<file>/[\w.-]+(?:/[\w.-]+)+/? | [\w.-]+(?:/[\w.-]+)+/?)
| (?P<sfloat>[+-]?\d+(?:\.\d+)?[eE][+-]?\d+(?![^\W_]))
| (?P<version>\d+(?:\.\d+){2,}(?![^\W_]))
| (?P<hword>(?=(?:[^\W_]|-)*[^\W\d_])[^\W_]+(?:-[^\W_]+)+)
| (?P<float>[+-]?\d+\.\d+(?![^\W_]))
| (?P<int>[+-]\d+(?![^\W_]))
| (?P<uint>\d+(?![^\W_]))
| (?P<numword>(?=[^\W_]*\d)[^\W_]+)
| (?P<word>[^\W\d_]+(?:'[^\W\d_]+)*)
""",
    re.VERBOSE | re.UNICODE,
)

_SKIP = ("tag", "entity", "protocol")
_HAS_DIGIT = re.compile(r"\d")

#: fast-path support (used by tokenizer._pg_token_stream): tags are the
#: ONLY class that can span whitespace, and no other class ever consumes
#: '<', so removing leftmost tag matches up front is exactly the
#: scanner's tag-skip; after that, tokenization is independent per
#: whitespace field. Two field shapes then avoid the 14-alternation
#: scan entirely:
#:
#: 1. no structural char (. @ / : & < > -) and no digit -> only plain
#:    `word` tokens are possible (every structured class needs one of
#:    those chars); a 1-class findall splits on anything else.
#:    ('_' is not structural: the word classes exclude it, so it just
#:    splits; '%'/'+' only matter inside an email, which needs '@'.)
#: 2. no structural char, >= 1 digit, and fully alphanumeric
#:    (str.isalnum, no '_') -> the scanner provably emits exactly ONE
#:    token: the whole field, as uint (all digits), sfloat (d+[eE]d+),
#:    or numword (anything else — its lookahead grabs the full run).
#:    All three are non-stem classes, so the lexeme is just
#:    field.lower() regardless of which.
TAG_SUB_RE = re.compile(TAG_PATTERN)
STRUCT_RE = re.compile(r"[.@/:&<>-]")
DIGIT_RE = re.compile(r"\d")
PLAIN_WORD_RE = re.compile(r"[^\W\d_]+(?:'[^\W\d_]+)*")

#: constant-time class dispatch: map every group index (incl. inner
#: groups like u_host, which is always the LAST matched group of its
#: alternative) to the outer token class — m.lastindex then resolves
#: the class without probing 14 named groups per token
_CLASS_OF_GROUP = {}
for _name, _idx in _TOKEN_RE.groupindex.items():
    _outer = {
        "u_host": "url", "u_path": "url",
        "h_host": "hosturl", "h_path": "hosturl",
    }.get(_name, _name)
    _CLASS_OF_GROUP[_idx] = _outer


def pg_scan(text: str):
    """Yield (token_class, token_text) over raw (non-lowercased) text.

    Compound classes emit multiple tokens: a url emits (url, host[,
    url_path]); a hyphenated word emits the compound then each part.
    """
    for m in _TOKEN_RE.finditer(text):
        kind = _CLASS_OF_GROUP[m.lastindex]
        if kind in _SKIP:
            continue
        if kind == "url":
            host = m.group("u_host")
            path = m.group("u_path")
            yield ("url", host + (path or ""))
            yield ("host", host)
            if path:
                yield ("url_path", path)
        elif kind == "hosturl":
            host = m.group("h_host")
            path = m.group("h_path")
            yield ("url", host + path)
            yield ("host", host)
            yield ("url_path", path)
        elif kind == "hword":
            tok = m.group("hword")
            compound_cls = "numhword" if _HAS_DIGIT.search(tok) else "hword"
            yield (compound_cls, tok)
            for part in tok.split("-"):
                part_cls = (
                    "hword_numpart" if _HAS_DIGIT.search(part) else "hword_part"
                )
                yield (part_cls, part)
        else:
            yield (kind, m.group(kind))
