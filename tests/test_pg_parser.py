"""Frozen conformance fixtures for the PG-default-parser token classes
(functions/pg_parser.py) — the reference's actual tokenizer contract
on web text (it delegates to Postgres's default parser; reference:
src/access/build.c:734-788, README.md:581-629). These fixtures ARE the
spec: any change to the scanner must consciously update them.
"""

import pytest

from pg_textsearch_spark.functions.pg_parser import pg_scan
from pg_textsearch_spark.functions.tokenizer import (
    tokenize,
    token_stream,
)


def scan(text):
    return list(pg_scan(text))


# ---------------------------------------------------------------------------
# token-class fixtures (ts_debug-shaped)
# ---------------------------------------------------------------------------


def test_url_with_protocol_decomposes():
    assert scan("see http://example.com/a/b?q=1 now") == [
        ("word", "see"),
        ("url", "example.com/a/b?q=1"),
        ("host", "example.com"),
        ("url_path", "/a/b?q=1"),
        ("word", "now"),
    ]


def test_url_without_path_still_emits_url_and_host():
    assert scan("https://example.com") == [
        ("url", "example.com"),
        ("host", "example.com"),
    ]


def test_url_without_protocol():
    assert scan("www.example.com/about") == [
        ("url", "www.example.com/about"),
        ("host", "www.example.com"),
        ("url_path", "/about"),
    ]


def test_bare_host():
    assert scan("visit example.com today") == [
        ("word", "visit"),
        ("host", "example.com"),
        ("word", "today"),
    ]


def test_email_kept_whole():
    assert scan("mail First.Last+tag@sub.example.com please") == [
        ("word", "mail"),
        ("email", "First.Last+tag@sub.example.com"),
        ("word", "please"),
    ]


def test_file_paths():
    assert scan("/usr/local/lib/libfoo.so.1") == [
        ("file", "/usr/local/lib/libfoo.so.1"),
    ]
    assert scan("src/access/build.c") == [("file", "src/access/build.c")]


def test_hyphenated_word_emits_compound_and_parts():
    assert scan("state-of-the-art") == [
        ("hword", "state-of-the-art"),
        ("hword_part", "state"),
        ("hword_part", "of"),
        ("hword_part", "the"),
        ("hword_part", "art"),
    ]


def test_numeric_hyphenated_word():
    assert scan("tapir-1x4") == [
        ("numhword", "tapir-1x4"),
        ("hword_part", "tapir"),
        ("hword_numpart", "1x4"),
    ]


def test_numbers_versions_floats():
    assert scan("v1 1.2.3 3.14 42 1.5e-10") == [
        ("numword", "v1"),
        ("version", "1.2.3"),
        ("float", "3.14"),
        ("uint", "42"),
        ("sfloat", "1.5e-10"),
    ]


def test_tags_and_entities_skipped():
    assert scan('<div class="x">a &amp; b</div>') == [
        ("word", "a"),
        ("word", "b"),
    ]


def test_underscore_splits_words():
    assert scan("foo_bar") == [("word", "foo"), ("word", "bar")]


def test_numword():
    assert scan("beta1 2fast") == [("numword", "beta1"), ("numword", "2fast")]


def test_unicode_words():
    assert scan("café über naïve") == [
        ("word", "café"),
        ("word", "über"),
        ("word", "naïve"),
    ]


# ---------------------------------------------------------------------------
# config-level behavior (class -> dictionary mapping)
# ---------------------------------------------------------------------------


def test_pg_english_stems_word_classes_only():
    tf = tokenize(
        "The runners visited http://Example.COM/Running today", "pg_english"
    )
    # word classes: stopwords removed ('the'), Porter2 applied
    assert "runner" in tf and "the" not in tf and "runners" not in tf
    assert tf["today"] == 1
    # url classes: lowercased verbatim, never stemmed
    assert tf["example.com/running"] == 1
    assert tf["example.com"] == 1
    assert tf["/running"] == 1


def test_pg_english_hyphen_compound_and_parts_scored():
    tf = tokenize("a state-of-the-art system", "pg_english")
    # compound kept whole (not a stopword), stemmed as one lexeme;
    # parts go through stop+stem: 'of'/'the' drop, 'state'/'art' stay
    assert tf["state-of-the-art"] == 1
    assert tf["state"] == 1 and tf["art"] == 1
    assert "of" not in tf and "the" not in tf


def test_pg_simple_keeps_stopwords_and_case_folds():
    tf = tokenize("The THE the", "pg_simple")
    assert tf == {"the": 3}


def test_pg_email_tf_counts():
    tf = tokenize("a@b.com wrote to a@b.com", "pg_simple")
    assert tf["a@b.com"] == 2


def test_token_stream_order_pg():
    assert token_stream("foo-bar baz", "pg_simple") == [
        "foo-bar", "foo", "bar", "baz",
    ]


def test_pg_doclen_counts_all_emitted_lexemes():
    # doc_len = sum tf over ALL lexemes incl. compound + parts (the
    # reference's doc_len is POSDATALEN over the full tsvector)
    tf = tokenize("state-of-the-art", "pg_simple")
    assert sum(tf.values()) == 5  # compound + 4 parts


# ---------------------------------------------------------------------------
# distributed path == oracle path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("config", ["pg_simple", "pg_english"])
def test_spark_pg_tokenizer_matches_python(spark, config):
    from pg_textsearch_spark.functions.tokenizer import spark_token_table
    from pg_textsearch_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    rows = [
        (1, "Visit http://example.com/a-b and mail me@x.org"),
        (2, "state-of-the-art results: 99.9% at v2.0.1"),
        (3, "<p>HTML &amp; tags stripped</p> /var/log/app.log"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in spark_token_table(df, "doc_id", "text", config).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    for doc_id, text in rows:
        expect = tokenize(text, config) if text else {}
        assert got.get(doc_id, {}) == expect, (doc_id, got.get(doc_id), expect)


def test_pg_index_end_to_end(spark, tmp_path):
    # build + query through the full engine with the pg_english config
    from pg_textsearch_spark.index.builder import build_index
    from pg_textsearch_spark.operators.bmw import topk_bmw
    from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive

    rows = [
        (0, "read the docs at http://docs.example.com/guide now"),
        (1, "state-of-the-art search engine"),
        (2, "contact admin@example.com about example.com downtime"),
        (3, "unrelated filler text about cats"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "pg_idx")
    build_index(spark, docs, d, config="pg_english", n_buckets=4)
    idx = BM25Index(spark, d)

    # querying a host token finds exactly the docs carrying that host
    res = topk_exhaustive(idx, "example.com", 4).collect()
    assert {r["doc_id"] for r in res} == {2}
    res_sub = topk_exhaustive(idx, "docs.example.com", 4).collect()
    assert {r["doc_id"] for r in res_sub} == {0}
    # hyphenated query matches compound+parts the same way the doc did
    res2 = topk_exhaustive(idx, "state-of-the-art", 4).collect()
    assert res2[0]["doc_id"] == 1
    # BMW parity holds under the pg tokenizer too
    exh = topk_exhaustive(idx, "example.com search", 4).collect()
    bmw = topk_bmw(idx, "example.com search", 4).collect()
    assert [(r["rank"], r["doc_id"]) for r in exh] == [
        (r["rank"], r["doc_id"]) for r in bmw
    ]


# ---------------------------------------------------------------------------
# fast-path equivalence: the whitespace-field fast paths in
# tokenizer._pg_token_stream (tag pre-strip, plain-word fields, alnum
# single-token fields, field memo) must be indistinguishable from the
# pure pg_scan scanner over the whole chunk
# ---------------------------------------------------------------------------


def _pure_scanner_stream(text, cfg):
    """The round-2 implementation: pg_scan over each whole chunk."""
    from pg_textsearch_spark.functions.pg_parser import (
        PG_STEM_CLASSES,
        pg_scan,
    )
    from pg_textsearch_spark.functions.tokenizer import (
        TOKEN_MAX_CHARS,
        _chunk_boundaries,
    )

    stem_fn = cfg.stem_fn() if cfg.do_stem else None
    out = []
    for chunk in _chunk_boundaries(text):
        for cls, tok in pg_scan(chunk):
            tok = tok.lower()
            if len(tok) > TOKEN_MAX_CHARS:
                continue
            if cls in PG_STEM_CLASSES:
                if tok in cfg.stopwords:
                    continue
                out.append(stem_fn(tok) if stem_fn else tok)
            else:
                out.append(tok)
    return out


FAST_PATH_ADVERSARIAL = [
    "t123 45 1e10 5e3x 123abc abc123def x² １２３",
    "foo_1 can't123 50% a+b 12e e12 55e66e77 1E5 2e-3 Hello WORLD",
    '<div class="x">inside</div> a<b>c &amp; &#39; <unclosed tag',
    "state-of-the-art tapir-1.4 e.g. /usr/local/lib www.x.com/y a.b.c.d",
    "café naïve слово 中文123",
    "UPPER123 Mixed1Case2 ...dots... -lead trail- -5 +7 1.2.3.4.5",
    "a_b_c 1_2 the and of THE The nbsp sep",
    "", " ", "x", "9", "e", "<", "&", "-", "_",
    "see http://example.com/a/b and user@test.org v1.2.3 or 3.14",
]


def test_fast_path_equivalence_fixed_and_random():
    import random

    from pg_textsearch_spark.functions.tokenizer import (
        get_config,
        token_stream,
    )

    rng = random.Random(42)
    pieces = (
        "hello world the-quick brown_fox 123 t45 1e9 v2.0.1 a.b.com "
        "x/y/z u@v.org <b>bold</b> &amp; state-of-the-art café 50%% "
        "UPPER miXed ５ 中文"
    ).split()
    random_docs = [
        " ".join(rng.choice(pieces) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    for name in ("pg_english", "pg_simple"):
        cfg = get_config(name)
        memo: dict = {}
        for t in FAST_PATH_ADVERSARIAL + random_docs:
            assert token_stream(t, cfg, _memo=memo) == _pure_scanner_stream(
                t, cfg
            ), (name, t)


# ---------------------------------------------------------------------------
# round-3 class extensions: signed numbers (PG's `int` class),
# possessive apostrophes, digit-leading hyphen compounds
# (extending the fixtures from PG's documented ts_debug taxonomy:
# int "Signed integer" example -1234; the parser keeps internal
# apostrophes — to_tsvector('english', 'john''s') = 'john')
# ---------------------------------------------------------------------------


def test_signed_integer_class():
    assert scan("at -1234 and +7 degrees") == [
        ("word", "at"),
        ("int", "-1234"),
        ("word", "and"),
        ("int", "+7"),
        ("word", "degrees"),
    ]


def test_signed_float_and_sfloat():
    assert scan("-3.14 +0.5 -2e-3 2e-3") == [
        ("float", "-3.14"),
        ("float", "+0.5"),
        ("sfloat", "-2e-3"),
        ("sfloat", "2e-3"),
    ]


def test_sign_binds_only_when_freestanding():
    # a hyphen after a word is a compound, never a sign
    assert scan("x-5") == [
        ("numhword", "x-5"),
        ("hword_part", "x"),
        ("hword_numpart", "5"),
    ]
    # digit ranges split as uint + int (no letter -> not a compound)
    assert scan("1985-1990") == [("uint", "1985"), ("int", "-1990")]


def test_possessive_apostrophe_stays_in_word():
    assert scan("prandtl's law o'brien's") == [
        ("word", "prandtl's"),
        ("word", "law"),
        ("word", "o'brien's"),
    ]
    # porter2 step 0 strips the possessive in english configs
    assert token_stream("prandtl's law", "pg_english") == ["prandtl", "law"]
    # leading/trailing apostrophes never join
    assert scan("'quoted' rock'") == [
        ("word", "quoted"),
        ("word", "rock"),
    ]


def test_digit_leading_hyphen_compound():
    # the Cranfield '12-in.' token: digit-leading compounds are
    # numhword as long as a letter appears somewhere
    assert scan("12-in. tunnel") == [
        ("numhword", "12-in"),
        ("hword_numpart", "12"),
        ("hword_part", "in"),
        ("word", "tunnel"),
    ]


# ---------------------------------------------------------------------------
# PG documentation examples (textsearch-parsers / ts_debug docs) —
# round-3 extension per the verdict: fixtures extended from the
# documented default-parser behavior, frozen here.
# ---------------------------------------------------------------------------


def test_pgdocs_protocol_url_decomposition():
    # ts_debug('http://example.com/stuff/index.html'): protocol is
    # mapped to no dictionary (dropped), then url + host + url_path
    assert scan("http://example.com/stuff/index.html") == [
        ("url", "example.com/stuff/index.html"),
        ("host", "example.com"),
        ("url_path", "/stuff/index.html"),
    ]


def test_pgdocs_hyphenated_with_numeric_part_is_numhword():
    # 'foo-bar-beta1': any digit-bearing part makes the compound a
    # numhword; alphabetic parts stay hword_part, digit-bearing parts
    # are hword_numpart
    assert scan("foo-bar-beta1") == [
        ("numhword", "foo-bar-beta1"),
        ("hword_part", "foo"),
        ("hword_part", "bar"),
        ("hword_numpart", "beta1"),
    ]


def test_pgdocs_file_path():
    assert scan("/usr/local/foo.txt") == [("file", "/usr/local/foo.txt")]


def test_pgdocs_tags_and_entities_are_blank():
    # tag and entity map to no dictionary in the default config
    assert scan("&amp; <html> &#38;") == []


def test_pgdocs_dotted_filename_is_host():
    # PG's famous quirk: 'readme.txt' scans as host
    assert scan("readme.txt") == [("host", "readme.txt")]


def test_pgdocs_number_classes():
    assert scan("3.14 1e-10 -42 +7 5.10.1 1.2e+3") == [
        ("float", "3.14"),
        ("sfloat", "1e-10"),
        ("int", "-42"),
        ("int", "+7"),
        ("version", "5.10.1"),
        ("sfloat", "1.2e+3"),
    ]


# ---------------------------------------------------------------------------
# round-4 tail fixtures: tag attribute grammar, comments, protocol
# tokens (PostgreSQL's public ts_debug documentation examples), and a
# real public-domain web page (tests/webtext_fixture.py)
# ---------------------------------------------------------------------------


def test_tag_with_attributes_skipped():
    # ts_debug documentation example: <a href="dictionaries.html"> is
    # one tag token (mapped to no dictionary)
    assert scan('read <a href="dictionaries.html">this</a> now') == [
        ("word", "read"),
        ("word", "this"),
        ("word", "now"),
    ]


def test_tag_quoted_attribute_may_contain_gt():
    # the in-tag state machine respects quoted attribute values: a '>'
    # inside quotes does not terminate the tag
    assert scan('<img alt="x > y" src="a.png"> done') == [("word", "done")]
    assert scan("<img alt='x > y'> done") == [("word", "done")]


def test_html_comment_skipped_whole():
    # wparser_def.c treats <!-- ... --> as one skipped token; the
    # comment body must not leak tokens even across '>' characters
    assert scan("a <!-- hidden words > here --> b") == [
        ("word", "a"),
        ("word", "b"),
    ]


def test_bare_protocol_head_skipped():
    # ts_debug('http://...') emits a 'protocol' token mapped to no
    # dictionary; a bare protocol head (no host) must vanish rather
    # than leak a 'http' word
    assert scan("use http:// or https:// mirrors") == [
        ("word", "use"),
        ("word", "or"),
        ("word", "mirrors"),
    ]


def test_ts_debug_documented_class_examples():
    # the class examples from PostgreSQL's textsearch-parsers table
    assert scan("up-to-date") == [
        ("hword", "up-to-date"),
        ("hword_part", "up"),
        ("hword_part", "to"),
        ("hword_part", "date"),
    ]
    assert scan("postgresql-beta1") == [
        ("numhword", "postgresql-beta1"),
        ("hword_part", "postgresql"),
        ("hword_numpart", "beta1"),
    ]
    assert scan("-1.234e56") == [("sfloat", "-1.234e56")]
    assert scan("-1.234") == [("float", "-1.234")]
    assert scan("-1234") == [("int", "-1234")]
    assert scan("1234") == [("uint", "1234")]
    assert scan("8.3.0") == [("version", "8.3.0")]
    assert scan("lógico-matemática") == [
        ("hword", "lógico-matemática"),
        ("hword_part", "lógico"),
        ("hword_part", "matemática"),
    ]


def test_webtext_fixture_markup_never_leaks():
    from tests.webtext_fixture import WEBTEXT_HTML

    toks = scan(WEBTEXT_HTML)
    words = {t for _c, t in toks}
    # attribute names/values, entity names, comment bodies, protocol
    # heads: none may surface as tokens
    for leaked in ("href", "charset", "utf", "amp", "mdash", "lang",
                   "stylesheet", "viewport", "device-width", "hidden",
                   "http", "https", "DOCTYPE", "300dpi", "nav"):
        assert leaked not in words, leaked
    # real content IS tokenized
    assert "unanimous" in words
    assert ("hword", "self-evident") in toks
    assert ("word", "Nature's") in toks
    assert ("email", "inquire@archives.gov") in toks
    assert ("host", "www.archives.gov") in toks
    assert (
        "url_path", "/founding-docs/declaration-transcript"
    ) in toks
    assert ("file", "/archives/founding/transcripts/declaration.txt") in toks
    assert ("version", "1.0.2") in toks


def test_webtext_fixture_frozen_stream():
    # the full (class, token) stream is pinned by hash — any scanner
    # change on real markup-dense text is a conscious fixture update
    import hashlib

    from tests.webtext_fixture import WEBTEXT_HTML

    toks = scan(WEBTEXT_HTML)
    digest = hashlib.sha256(
        "\x1e".join(f"{c}\x1f{t}" for c, t in toks).encode()
    ).hexdigest()
    assert len(toks) == WEBTEXT_N_TOKENS, len(toks)
    assert digest == WEBTEXT_STREAM_SHA256, digest


# pinned by running the scanner once at fixture-freeze time (round 4)
WEBTEXT_N_TOKENS = 242
WEBTEXT_STREAM_SHA256 = "bd9781abc463847529898aa1a3b0304c853f64ab40a41db9cb8878c50753ef8d"


# ---------------------------------------------------------------------------
# round-5 tail fixtures: entity-dense and nested-markup grammar (the
# remaining contract tail per the round-4 verdict). Expected streams
# derive from PostgreSQL's documented default-parser behavior
# (textsearch-parsers docs + wparser_def.c state machine): entities
# need a terminating ';', '<' opens a tag only before tag-grammar
# characters, tags/entities are token boundaries and never tokenize.
# ---------------------------------------------------------------------------


def test_entity_dense_text():
    assert scan("Tom &amp; Jerry &#38; friends") == [
        ("word", "Tom"),
        ("word", "Jerry"),
        ("word", "friends"),
    ]


def test_entity_numeric_and_named_forms():
    # decimal, hex, and named entities all skip whole
    assert scan("a &#8212; b &#x2014; c &mdash; d") == [
        ("word", "a"),
        ("word", "b"),
        ("word", "c"),
        ("word", "d"),
    ]


def test_entity_unterminated_is_not_entity():
    # no ';' -> '&' is punctuation and the name tokenizes as a word
    assert scan("fish &amp chips") == [
        ("word", "fish"),
        ("word", "amp"),
        ("word", "chips"),
    ]
    assert scan("a & b") == [("word", "a"), ("word", "b")]


def test_entity_adjacent_to_token():
    # '&lt;3' = entity then uint; entities break the token like a tag
    assert scan("score &lt;3 points") == [
        ("word", "score"),
        ("uint", "3"),
        ("word", "points"),
    ]


def test_nested_tags_skip_each_level():
    assert scan("<div><b><i>deep</i></b> text</div>") == [
        ("word", "deep"),
        ("word", "text"),
    ]


def test_tag_attribute_containing_entity():
    # '&' inside a quoted attribute value stays inside the one tag
    assert scan('<a title="a &amp; b">z</a>') == [("word", "z")]


def test_lt_before_non_tag_char_is_not_tag():
    # tag opens only on '<'+name/'/'/'!'/'?' — a comparison stays text
    assert scan("1 < 2 but 3 > 1") == [
        ("uint", "1"),
        ("uint", "2"),
        ("word", "but"),
        ("uint", "3"),
        ("uint", "1"),
    ]


def test_tags_break_words_without_whitespace():
    assert scan("a<b>c</b>d") == [
        ("word", "a"),
        ("word", "c"),
        ("word", "d"),
    ]


def test_webtext_fixture2_markup_never_leaks():
    from tests.webtext_fixture import WEBTEXT_HTML_2

    toks = scan(WEBTEXT_HTML_2)
    words = {t for _c, t in toks}
    # attribute names/values, entity names (named, decimal, hex),
    # class names: none may surface
    for leaked in ("border", "mdash", "x2014", "8212", "quot", "amp",
                   "speech", "meta", "footer", "notes", "charset",
                   "blockquote"):
        assert leaked not in words, leaked
    # real content IS tokenized, across the new grammar features
    assert ("word", "Four") in toks              # blockquote body
    assert ("hword", "battle-field") in toks     # hyphenated compound
    assert ("uint", "272") in toks               # table cell
    assert ("version", "2.1.0") in toks
    assert ("word", "Bliss") in toks             # between &quot; entities
    assert ("email", "curator@example.org") in toks
    assert ("file", "/library/speeches/gettysburg/copies.txt") in toks
    # AT&T: no terminating ';' after '&T', so '&' is punctuation
    assert ("word", "AT") in toks and ("word", "T") in toks


def test_webtext_fixture2_frozen_stream():
    import hashlib

    from tests.webtext_fixture import WEBTEXT_HTML_2

    toks = scan(WEBTEXT_HTML_2)
    digest = hashlib.sha256(
        "\x1e".join(f"{c}\x1f{t}" for c, t in toks).encode()
    ).hexdigest()
    assert len(toks) == WEBTEXT2_N_TOKENS, len(toks)
    assert digest == WEBTEXT2_STREAM_SHA256, digest


# pinned by running the scanner once at fixture-freeze time (round 5)
WEBTEXT2_N_TOKENS = 172
WEBTEXT2_STREAM_SHA256 = "db21265f678ba836a7a80381b248c6659b12605a734d4b4d529df8ba60dc8984"


# ---------------------------------------------------------------------------
# round-6 real-page fixtures 3-5 (verdict task #6: forms/entity-dense,
# non-Latin, script-style bodies)
# ---------------------------------------------------------------------------


def test_webtext_fixture3_forms_and_entities():
    from tests.webtext_fixture import WEBTEXT_HTML_3

    toks = scan(WEBTEXT_HTML_3)
    words = {t for _c, t in toks}
    # form machinery never leaks: attribute names/values, option
    # values, entity names (named, decimal, hex) all stay markup
    for leaked in ("placeholder", "textarea", "submit", "selected",
                   "sect", "nbsp", "eacute", "mdash", "ldquo", "rarr",
                   "167", "x00A7", "9733", "amp", "get", "era"):
        assert leaked not in words, leaked
    # element BODIES are text: option labels, button label, textarea
    # default content all tokenize
    assert ("word", "Constitutional") in toks
    assert ("word", "Go") in toks
    assert ("file", "/help/transcription/guide.txt") in toks
    # &nbsp; is a blank: the words around it stay separate tokens
    assert ("word", "United") in toks and ("word", "States") in toks
    # an entity mid-word splits it (PG class structure: word, entity,
    # word): R&eacute;sum&eacute; -> R + sum
    assert ("word", "R") in toks and ("word", "sum") in toks
    assert ("word", "Tranquility") in toks  # preamble body reached


def test_webtext_fixture4_non_latin_scripts():
    from tests.webtext_fixture import WEBTEXT_HTML_4

    toks = scan(WEBTEXT_HTML_4)
    # Cyrillic letter runs are plain 'word' tokens (Unicode classes)
    assert ("word", "счастливые") in toks
    assert ("word", "Толстой") in toks
    # Cyrillic hyphenated compound behaves exactly like Latin ones
    assert ("hword", "по-своему") in toks
    assert ("hword_part", "по") in toks
    assert ("hword_part", "своему") in toks
    # mixed-script compound
    assert ("hword", "Толстой-Tolstoy") in toks
    assert ("hword_part", "Tolstoy") in toks
    # polytonic Greek (combining diacritics are letters)
    assert ("word", "ἄνδρα") in toks
    assert ("word", "πολύτροπον") in toks
    # markup attributes in Russian (title="часть первая") never leak
    words = {t for _c, t in toks}
    assert "часть" not in words and "первая" not in words
    # structured classes still fire inside non-Latin prose
    assert ("url", "lib.ru/LITRA/TOLSTOJ/") in toks
    assert ("uint", "1877") in toks


def test_webtext_fixture5_script_style_bodies_are_text():
    from tests.webtext_fixture import WEBTEXT_HTML_5

    toks = scan(WEBTEXT_HTML_5)
    # contract corner: PG's default parser has NO element-content
    # awareness — script/style BODIES tokenize (only tags skip)
    assert ("word", "var") in toks          # script body
    assert ("word", "pageId") in toks
    assert ("hword", "small-caps") in toks  # style body
    # <pre>/<code> indentation does not perturb tokenization
    assert ("word", "grep") in toks
    assert ("uint", "1685") in toks
    # underscore splits; the trailing half then reads as a host
    # (documented file-vs-host ambiguity: moby_dick.txt)
    assert ("word", "moby") in toks
    assert ("host", "dick.txt") in toks
    # definition-list bodies reached; possessive apostrophe kept
    assert ("word", "Melville's") in toks
    assert ("hword", "school-and-college") in toks
    assert ("hword_part", "college") in toks


def test_webtext_fixtures345_frozen_streams():
    import hashlib

    from tests.webtext_fixture import (
        WEBTEXT_HTML_3,
        WEBTEXT_HTML_4,
        WEBTEXT_HTML_5,
    )

    for html, n_want, sha_want in (
        (WEBTEXT_HTML_3, WEBTEXT3_N_TOKENS, WEBTEXT3_STREAM_SHA256),
        (WEBTEXT_HTML_4, WEBTEXT4_N_TOKENS, WEBTEXT4_STREAM_SHA256),
        (WEBTEXT_HTML_5, WEBTEXT5_N_TOKENS, WEBTEXT5_STREAM_SHA256),
    ):
        toks = scan(html)
        digest = hashlib.sha256(
            "\x1e".join(f"{c}\x1f{t}" for c, t in toks).encode()
        ).hexdigest()
        assert len(toks) == n_want, len(toks)
        assert digest == sha_want, digest


# pinned by running the scanner once at fixture-freeze time (round 6)
WEBTEXT3_N_TOKENS = 99
WEBTEXT3_STREAM_SHA256 = "934f199fd2b76911dc29657b27e646859168fabecb72cea6094f391b07a4c0f7"
WEBTEXT4_N_TOKENS = 67
WEBTEXT4_STREAM_SHA256 = "a17fde66b35c12d19dab450a849f678e65da15307df4450284eea9dda905551e"
WEBTEXT5_N_TOKENS = 106
WEBTEXT5_STREAM_SHA256 = "d3cc3d26e989917ecde3f661520e7369f84790ddfb14aa25e7253e22245b74c2"


# ---------------------------------------------------------------------------
# round-7 real-page fixtures 6-7 (verdict task #6: RSS/XML-ish + broken
# markup, mixed-script CJK)
# ---------------------------------------------------------------------------


def test_webtext_fixture6_rss_xml_and_broken_markup():
    from tests.webtext_fixture import WEBTEXT_HTML_6

    toks = scan(WEBTEXT_HTML_6)
    words = {t for _c, t in toks}
    # <?xml ...?> IS a tag (PG TPS_InXMLBegin: '<?' + literal 'x'
    # enters the in-tag state): declaration attrs never tokenize
    for leaked in ("version", "encoding", "utf"):
        assert leaked not in words, leaked
    # <?php ... ?> is NOT a tag ('<?' + 'p' pops): the PHP source
    # tokenizes exactly as to_tsvector does
    assert ("word", "php") in toks and ("word", "echo") in toks
    assert ("word", "footer") in toks
    # <![CDATA[ is NOT a tag ('<!' + '[' pops): the literal token
    # CDATA leaks as a word and the section BODY tokenizes
    assert ("word", "CDATA") in toks
    assert ("word", "midnight") in toks      # CDATA body reached
    assert ("word", "Archive") in toks       # title CDATA body
    # namespaced self-closing tag is an ordinary tag: its attribute
    # values (an mp3 url, a mime type) never leak
    for leaked in ("audio", "mpeg", "media", "mp3"):
        assert leaked not in words, leaked
    assert "raven.mp3" not in {t for c, t in toks if c == "host"}
    # entity stays markup; attribute value of <guid> never leaks but
    # its BODY does (numhword with parts)
    assert "mdash" not in words and "false" not in words
    assert ("numhword", "raven-1845-001") in toks
    assert ("hword_numpart", "001") in toks
    # broken markup: freestanding '<' followed by non-letter is a
    # blank ('renders < 5 ms' keeps both sides)
    assert ("word", "renders") in toks and ("uint", "5") in toks
    # unclosed tag at EOF rewinds: its name and attr tokenize
    assert ("word", "em") in toks
    assert ("hword", "broken-unclosed") in toks
    # plain RSS element bodies are text (url decomposes, file class)
    assert ("url", "poems.example.org/feed/raven") in toks
    assert ("file", "/var/log/feeds/raven.log") in toks


def test_webtext_fixture7_mixed_script_cjk():
    from tests.webtext_fixture import WEBTEXT_HTML_7

    toks = scan(WEBTEXT_HTML_7)
    words = {t for _c, t in toks}
    # PG's default parser does NOT segment CJK: a letter run unbroken
    # by spaces/punctuation is ONE 'word' token
    assert ("word", "學而時習之") in toks       # Analects clause
    assert ("word", "吾輩は猫である") in toks    # Japanese clause
    assert ("word", "나랏말싸미") in toks        # Korean (Hangul) word
    # full-width punctuation （，。：「」？） is a blank: clauses on
    # either side stay separate tokens
    assert ("word", "子曰") in toks and ("word", "不亦樂乎") in toks
    assert ("word", "名前はまだ無い") in toks
    # digit-embedded CJK runs take numword — class structure, not
    # script, drives the pipeline (era dates, 年 counters)
    assert ("numword", "明治38年") in toks
    assert ("numword", "1905年") in toks
    assert ("numword", "平成30年") in toks
    # mixed-script hyphen compounds behave exactly like Latin ones
    assert ("hword", "東京-Tokyo") in toks
    assert ("hword_part", "東京") in toks
    assert ("hword_part", "Tokyo") in toks
    # CJK attribute values (title="古典文本", lang attrs) never leak
    assert "古典文本" not in words
    assert "zh-Hant" not in words and "ja" not in words
    # url with a CJK path still decomposes
    assert ("host", "zh.wikisource.org") in toks
    assert ("url_path", "/wiki/論語/學而第一") in toks


def test_webtext_fixtures67_frozen_streams():
    import hashlib

    from tests.webtext_fixture import WEBTEXT_HTML_6, WEBTEXT_HTML_7

    for html, n_want, sha_want in (
        (WEBTEXT_HTML_6, WEBTEXT6_N_TOKENS, WEBTEXT6_STREAM_SHA256),
        (WEBTEXT_HTML_7, WEBTEXT7_N_TOKENS, WEBTEXT7_STREAM_SHA256),
    ):
        toks = scan(html)
        digest = hashlib.sha256(
            "\x1e".join(f"{c}\x1f{t}" for c, t in toks).encode()
        ).hexdigest()
        assert len(toks) == n_want, len(toks)
        assert digest == sha_want, digest


# pinned by running the scanner once at fixture-freeze time (round 7)
WEBTEXT6_N_TOKENS = 87
WEBTEXT6_STREAM_SHA256 = "86cdb216ac8589599091cc6ebfcf1666793223242e38c8816598fd5553bdecab"
WEBTEXT7_N_TOKENS = 49
WEBTEXT7_STREAM_SHA256 = "6dbe8a29c2fea15d7ab0657777c7e8825144fe4dff2356a7072be1d701341344"


def test_webtext_fixture8_numeric_commerce_page():
    from tests.webtext_fixture import WEBTEXT_HTML_8

    toks = scan(WEBTEXT_HTML_8)
    words = {t for _c, t in toks}
    # markup never leaks: tag names, attribute names/values, charset
    for leaked in ("charset", "utf", "td", "tr", "table", "en",
                   "DOCTYPE", "html", "head", "meta"):
        assert leaked not in words, leaked
    # numeric classes, composed in running prose:
    assert ("version", "2.4.1") in toks          # 3-part dotted
    assert ("numword", "v2") in toks             # letter+digit run
    assert ("float", "37.5") in toks             # '%' is a blank
    assert ("sfloat", "1.5e-9") in toks          # scientific
    assert ("sfloat", "6.02e23") in toks
    assert ("int", "-3") in toks                 # signed int
    # a dashed date is NOT one token: uint then two signed ints
    i = toks.index(("uint", "2026"))
    assert toks[i : i + 3] == [
        ("uint", "2026"), ("int", "-08"), ("int", "-18")]
    # a phone number decomposes the same way (+1 -800 -555 -0199)
    assert ("int", "+1") in toks and ("int", "-0199") in toks
    # numhword: letter part + digit part
    assert ("numhword", "RFC-7541") in toks
    assert ("hword_part", "RFC") in toks
    assert ("hword_numpart", "7541") in toks
    # email with hyphenated domain kept whole
    assert ("email", "sales@tapir-search.example.com") in toks
    # url with query string: entities are NOT decoded inside url
    # tokens — '&amp;' rides along as literal characters
    assert ("host", "get.tapir.example.com") in toks
    assert ("url_path", "/dl?ver=2.4.1&amp;arch=x86_64") in toks
    # bare host (no scheme, no path)
    assert ("host", "ftp.tapir.example.org") in toks
    # documented numeric file-vs-host ambiguity: '$19.99/mo' ('$' is
    # a blank) reads as url '19.99/mo' with numeric host '19.99'
    assert ("url", "19.99/mo") in toks
    assert ("host", "19.99") in toks
    # the file class swallows a sentence-final period
    assert ("file", "/pub/releases/sha256sums.txt.") in toks


def test_webtext_fixture8_frozen_stream():
    import hashlib

    from tests.webtext_fixture import WEBTEXT_HTML_8

    toks = scan(WEBTEXT_HTML_8)
    digest = hashlib.sha256(
        "\x1e".join(f"{c}\x1f{t}" for c, t in toks).encode()
    ).hexdigest()
    assert len(toks) == WEBTEXT8_N_TOKENS, len(toks)
    assert digest == WEBTEXT8_STREAM_SHA256, digest


# pinned by running the scanner once at fixture-freeze time (round 7)
WEBTEXT8_N_TOKENS = 87
WEBTEXT8_STREAM_SHA256 = "1f74177c62446c90af95e88a7a658c858b2b35bf5f593adaa818435de791c7df"
