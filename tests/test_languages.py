"""Per-language config conformance (reference: README.md:184-191 —
french/german/spanish text-search configs ship with Postgres).

Two layers of pins: inflection-collapse properties (the *purpose* of a
stemmer — plural==singular, verb forms collapse) and frozen outputs
(the spec; changing the stemmer must consciously update them).
"""

import pytest

from pg_textsearch_spark.functions.languages import (
    FRENCH_STOPWORDS,
    GERMAN_STOPWORDS,
    SPANISH_STOPWORDS,
    french_stem,
    german_stem,
    spanish_stem,
)
from pg_textsearch_spark.functions.tokenizer import get_config, tokenize

# ---------------------------------------------------------------------------
# collapse properties: all forms in a group share one stem
# ---------------------------------------------------------------------------

FR_GROUPS = [
    ["continu", "continua", "continuait"],
    ["nationale", "nationaux"],
    ["chevaux", "cheval"],
    ["animaux", "animal"],
    ["mangées", "manger", "mangeait"],
    ["possibilité", "possibilités"],
    ["heureuse", "heureux"],
    ["connaissance", "connaissances"],
]

DE_GROUPS = [
    ["aufgabe", "aufgaben"],
    ["haus", "häuser", "häusern"],
    ["laufen", "läufst"],
    ["kategorie", "kategorien"],
    ["ergebnis", "ergebnisse"],
    ["schnell", "schneller", "schnellsten"],
    ["freundlich", "freundlichkeit"],
    ["bedeutung", "bedeutungen"],
    ["möglichkeit", "möglichkeiten"],
    ["kinder", "kindern"],
]

ES_GROUPS = [
    ["corriendo", "correr", "corre"],
    ["niño", "niños", "niña", "niñas"],
    ["nacional", "nacionales"],
    ["nación", "naciones"],
    ["importante", "importantes"],
    ["posibilidad", "posibilidades"],
    ["cantando", "cantaba", "cantaron", "cantándolo"],
    ["libros", "libro", "librería"],
    ["generosidad", "generoso"],
]


@pytest.mark.parametrize("group", FR_GROUPS)
def test_french_collapse(group):
    stems = {french_stem(w) for w in group}
    assert len(stems) == 1, (group, stems)


@pytest.mark.parametrize("group", DE_GROUPS)
def test_german_collapse(group):
    stems = {german_stem(w) for w in group}
    assert len(stems) == 1, (group, stems)


@pytest.mark.parametrize("group", ES_GROUPS)
def test_spanish_collapse(group):
    stems = {spanish_stem(w) for w in group}
    assert len(stems) == 1, (group, stems)


# ---------------------------------------------------------------------------
# frozen outputs (the spec)
# ---------------------------------------------------------------------------

FR_PINS = {
    "majestueusement": "majestu",
    "rapidement": "rapid",
    "habituellement": "habituel",
    "importante": "import",
    "nation": "nation",
    "chevaux": "cheval",
}

DE_PINS = {
    "häusern": "haus",
    "ergebnisse": "ergebnis",
    "freundlichkeit": "freundlich",
    "wissenschaftlich": "wissenschaft",
    "möglichkeiten": "moglich",
    "schnellsten": "schnell",
}

ES_PINS = {
    "dándoselo": "dand",
    "rápidamente": "rapid",
    "generosidad": "gener",
    "naciones": "nacion",
    "corriendo": "corr",
    "quedarse": "qued",
}


def test_frozen_outputs():
    for w, s in FR_PINS.items():
        assert french_stem(w) == s, (w, french_stem(w), s)
    for w, s in DE_PINS.items():
        assert german_stem(w) == s, (w, german_stem(w), s)
    for w, s in ES_PINS.items():
        assert spanish_stem(w) == s, (w, spanish_stem(w), s)


def test_stemmers_are_idempotent_enough():
    # a stem must not blow up when re-stemmed (stability property used
    # by the query path: queries are tokenized with the same config)
    for fn, pins in ((french_stem, FR_PINS), (german_stem, DE_PINS),
                     (spanish_stem, ES_PINS)):
        for w in pins:
            s = fn(w)
            assert fn(s) is not None and len(fn(s)) >= 1


# ---------------------------------------------------------------------------
# config level
# ---------------------------------------------------------------------------


def test_language_configs_registered():
    for name in ("french", "german", "spanish",
                 "pg_french", "pg_german", "pg_spanish"):
        cfg = get_config(name)
        assert cfg.do_stem and cfg.stopwords


def test_config_tokenize_applies_stops_and_stem():
    # french: 'les' is a stopword, plural collapses
    tf = tokenize("les chevaux et le cheval", "french")
    assert "les" not in tf and "le" not in tf and "et" not in tf
    assert tf["cheval"] == 2
    # german: 'die' stopword, umlaut plural collapses
    tf = tokenize("die Häuser und das Haus", "german")
    assert "die" not in tf and "und" not in tf
    assert tf["haus"] == 2
    # spanish: 'los' stopword, plural collapses
    tf = tokenize("los niños y el niño", "spanish")
    assert "los" not in tf and "el" not in tf
    assert tf["niñ"] == 2


def test_stopword_lists_are_lowercase_and_nonempty():
    for lst in (FRENCH_STOPWORDS, GERMAN_STOPWORDS, SPANISH_STOPWORDS):
        assert len(lst) > 80
        assert all(w == w.lower() for w in lst)


def test_pg_french_web_text():
    # typed classes compose with language stemming
    tf = tokenize("voir http://exemple.fr/chevaux les chevaux", "pg_french")
    assert tf["cheval"] == 1            # word class stemmed
    assert tf["exemple.fr/chevaux"] == 1  # url class verbatim
    assert tf["exemple.fr"] == 1
    assert "les" not in tf


# ---------------------------------------------------------------------------
# end-to-end index variant (mirrors the english-config variant test)
# ---------------------------------------------------------------------------


def test_language_index_end_to_end(spark, tmp_path):
    from pg_textsearch_spark.index.builder import build_index
    from pg_textsearch_spark.operators.topk import BM25Index, topk_exhaustive
    from pg_textsearch_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    rows = [
        (0, "les chevaux galopent dans le pré"),
        (1, "un cheval blanc"),
        (2, "la maison est grande"),
        (3, "texte sans rapport aucun"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "fr_idx")
    build_index(spark, docs, d, config="french", n_buckets=4)
    idx = BM25Index(spark, d)
    # singular query matches the plural doc through the shared stem
    res = topk_exhaustive(idx, "cheval", 4).collect()
    assert {r["doc_id"] for r in res} == {0, 1}
    # stopword-only query returns nothing
    assert topk_exhaustive(idx, "les le la", 4).collect() == []
