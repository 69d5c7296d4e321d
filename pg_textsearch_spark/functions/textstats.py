"""Text-analysis column functions for training-data pipelines.

All four are pure Column expressions (whole-stage codegen, zero
Python) with exactly-matching ANSI-SQL forms for the DuckDB oracle:

- token_count       : surviving-token count under the ascii config
- quality_score     : length/alpha/digit/stopword-ratio heuristic
- lang_id           : stopword-hit-ratio heuristic over {en,de,fr,es}
                      + CJK codepoint detection
- doc_fingerprint   : order-sensitive polynomial rolling hash over
                      tokens (mod 1e9+7, overflow-safe in BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, fixed per-language stopword marker sets (heuristic markers,
# not the full stopword lists)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "que", "una", "con"],
}

_TOKEN_SPLIT = r"[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    toks = F.split(F.lower(text), _TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def token_count_sql(col: str = "text") -> str:
    return (
        f"len(list_filter(regexp_split_to_array(lower({col}), "
        f"'{_TOKEN_SPLIT}'), t -> t <> ''))::BIGINT"
    )


def quality_score(text: Column) -> Column:
    """0..1 heuristic: penalize extreme lengths, non-alpha soup, and
    stopword-free or stopword-only token streams."""
    n_chars = F.length(text).cast("double")
    toks = tokens_col(text)
    n_toks = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z ]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(LANG_MARKERS["en"]))
    ).cast("double")
    len_ok = F.when((n_toks >= 5) & (n_toks <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0))
    score = len_ok + F.least(alpha_ratio, F.lit(1.0)) * 0.4 + F.least(
        stop_ratio * 4.0, F.lit(1.0)
    ) * 0.2
    return F.round(score, 6)


def quality_score_sql(col: str = "text") -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower({col}), '{_TOKEN_SPLIT}'),"
        " t -> t <> '')"
    )
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS["en"])
    return f"""
round(
  (CASE WHEN len({toks}) BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END)
  + least(
      CASE WHEN length({col}) > 0
           THEN length(regexp_replace(lower({col}), '[^a-z ]', '', 'g'))::DOUBLE
                / length({col})
           ELSE 0.0 END, 1.0) * 0.4
  + least(
      CASE WHEN len({toks}) > 0
           THEN len(list_filter({toks}, t -> t IN ({markers})))::DOUBLE
                / len({toks})
           ELSE 0.0 END * 4.0, 1.0) * 0.2
, 6)"""


def lang_id(text: Column) -> Column:
    """Pick the language whose marker-hit ratio is highest; 'zh' when
    CJK codepoints present; 'unknown' when nothing scores > 0."""
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    best_lang = F.lit("unknown")
    best_score = F.lit(0.0)
    for lang in ("en", "de", "fr", "es"):  # fixed order; ties keep earlier
        hits = F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))
        score = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    # literal CJK range chars: portable across Java regex and RE2
    cjk = f"[^{chr(0x4E00)}-{chr(0x9FFF)}]"
    has_cjk = F.length(F.regexp_replace(text, cjk, "")) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


def lang_id_sql(col: str = "text") -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower({col}), '{_TOKEN_SPLIT}'),"
        " t -> t <> '')"
    )
    ratio = {}
    for lang, words in LANG_MARKERS.items():
        marks = ", ".join(f"'{w}'" for w in words)
        ratio[lang] = (
            f"(CASE WHEN len({toks}) > 0 THEN "
            f"len(list_filter({toks}, t -> t IN ({marks})))::DOUBLE / len({toks}) "
            f"ELSE 0.0 END)"
        )
    # same fixed evaluation order as the Column version
    expr = "'unknown'"
    best = "0.0"
    for lang in ("en", "de", "fr", "es"):
        expr = f"(CASE WHEN {ratio[lang]} > {best} THEN '{lang}' ELSE {expr} END)"
        best = f"greatest({ratio[lang]}, {best})"
    cjk = f"[^{chr(0x4E00)}-{chr(0x9FFF)}]"
    return (
        f"CASE WHEN length(regexp_replace({col}, '{cjk}', '', 'g')) > 0 "
        f"THEN 'zh' ELSE {expr} END"
    )


_FP_MOD = 1_000_000_007
_FP_MUL = 131


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive token-stream fingerprint, stable across engines:
    per token feat = len*7 + ascii(first)*31 + ascii(last); fingerprint
    = sum((pos+1) * feat) mod 1e9+7 (position-weighted so permuted
    docs differ; bounded so BIGINT never overflows in either engine).
    """
    toks = tokens_col(text)
    feats = F.transform(
        toks,
        lambda t, i: (
            (i + 1)
            * (
                F.length(t).cast("long") * 7
                + F.ascii(t).cast("long") * 31
                + F.ascii(F.substring(t, -1, 1)).cast("long")
            )
        ),
    )
    return F.aggregate(feats, F.lit(0).cast("long"), lambda a, x: a + x) % _FP_MOD


def doc_fingerprint_sql(col: str = "text") -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower({col}), '{_TOKEN_SPLIT}'),"
        " t -> t <> '')"
    )
    # DuckDB list_transform index lambda is 1-based; Spark's is 0-based
    return (
        f"coalesce(list_sum(list_transform({toks}, (t, i) -> "
        f"i::BIGINT * (length(t)*7 + ascii(t)*31 + ascii(t[-1])))), 0)::BIGINT "
        f"% {_FP_MOD}"
    )
