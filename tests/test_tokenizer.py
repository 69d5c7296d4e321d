"""Tokenizer + stemmer conformance (SURVEY.md §5 rebuild plan (a))."""

import pytest

from pg_textsearch_spark.functions.stemmer import stem
from pg_textsearch_spark.functions.stopwords import ENGLISH_STOPWORDS
from pg_textsearch_spark.functions.tokenizer import (
    CHUNK_BYTES,
    _chunk_boundaries,
    tokenize,
    tokenize_query,
    token_stream,
)

# Porter2 pairs from the published algorithm description / sample
# vocabulary (snowballstem.org) — pins our from-spec implementation.
PORTER2_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "tie", "cries": "cri",
    "gaps": "gap", "gas": "gas", "kiwis": "kiwi", "this": "this",
    "running": "run", "hopping": "hop", "hoped": "hope", "agreed": "agre",
    "dying": "die", "lying": "lie", "tying": "tie", "news": "news",
    "skies": "sky", "skis": "ski", "early": "earli", "only": "onli",
    "generalization": "general", "national": "nation", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "format", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "communism", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    "sky": "sky", "bias": "bias", "ugly": "ugli",
}


def test_porter2_pairs():
    bad = {w: (stem(w), want) for w, want in PORTER2_PAIRS.items() if stem(w) != want}
    assert not bad, bad


def test_stem_idempotent_on_outputs():
    # not guaranteed by the algorithm in general, but holds for our
    # fixture set — a useful regression canary
    for w in PORTER2_PAIRS.values():
        assert stem(stem(w)) == stem(w)


def test_stopword_count():
    assert len(ENGLISH_STOPWORDS) == 127  # the PG english.stop list


def test_tokenize_simple_tf():
    assert tokenize("Hello, hello world!", "simple") == {"hello": 2, "world": 1}


def test_tokenize_ascii_matches_simple_on_ascii():
    t = "The Quick Brown fox-jumped over 2 lazy_dogs."
    # ascii splits on '_' too; simple treats [^\W_]+ runs
    assert tokenize(t, "ascii") == {
        "the": 1, "quick": 1, "brown": 1, "fox": 1, "jumped": 1,
        "over": 1, "2": 1, "lazy": 1, "dogs": 1,
    }


def test_tokenize_english_stop_and_stem():
    got = tokenize("The runners were running quickly over the hills", "english")
    assert got == {"runner": 1, "run": 1, "quick": 1, "hill": 1}


def test_doc_len_is_post_stopword():
    # doc_len = sum tf over *surviving* lexemes (reference: build.c:781)
    counts = tokenize("the the the cat", "english")
    assert sum(counts.values()) == 1


def test_token_cap():
    long_tok = "a" * 3000
    assert tokenize(f"hello {long_tok} world", "ascii") == {"hello": 1, "world": 1}


def test_query_freq_multiplier_fixture():
    # FIXTURES.md F6: 'waves waves waves waves' pins query_freq
    q = tokenize_query("waves waves waves waves", "english")
    assert q == {"wave": 4}


def test_chunking_equivalence():
    # a doc > 256 KB tokenizes identically chunked vs whole
    base = ("alpha beta gamma delta epsilon " * 20000).strip()  # ~620 KB
    assert len(base.encode()) > 2 * CHUNK_BYTES
    chunks = list(_chunk_boundaries(base))
    assert len(chunks) >= 2
    assert all(len(c.encode()) <= CHUNK_BYTES for c in chunks)
    # no token split across a boundary: chunked == unchunked multiset
    whole = {}
    for c in chunks:
        for t in token_stream(c, "ascii"):
            whole[t] = whole.get(t, 0) + 1
    assert whole == tokenize(base, "ascii")


def test_chunking_no_whitespace_fallback():
    blob = "x" * (CHUNK_BYTES + 100)
    chunks = list(_chunk_boundaries(blob))
    assert "".join(chunks) == blob


def test_register_custom_config():
    from pg_textsearch_spark.functions.tokenizer import register_config

    register_config("english_plus", base="english",
                    extra_stopwords={"spark", "hadoop"})
    got = tokenize("The Spark runners were running", "english_plus")
    assert got == {"runner": 1, "run": 1}
    # base config unaffected
    assert "spark" in tokenize("spark spark", "english")


def test_jvm_python_tokenizer_parity_unicode(spark):
    # the index build tokenizes on the JVM (split/explode); queries
    # tokenize in Python. They MUST agree or query terms miss the index.
    from pg_textsearch_spark.functions.tokenizer import spark_token_table
    from pg_textsearch_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    texts = [
        (1, "Über die Brücke: größere Straßen führen zum Fluß."),
        (2, "北京 大学 的 图书馆 非常 大。"),
        (3, "naïve café — résumé's élan; 3.14 Ωmega"),
        (4, "Здравствуйте, мир! Ёлка ёжик"),
        (5, "mixed ASCII und Ünïcödé tokens_with_underscore"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for cfg in ("simple", "english", "ascii"):
        jvm = {}
        for r in spark_token_table(df, "doc_id", "text", cfg).collect():
            jvm.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
        for did, t in texts:
            assert tokenize(t, cfg) == jvm.get(did, {}), (cfg, did)
