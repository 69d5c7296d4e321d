"""Per-language text configs: Snowball stemmers + stopword lists.

The reference supports any Postgres text-search configuration —
``french``, ``german``, ``spanish`` ship with Postgres and are called
out in its docs (reference: README.md:184-191, 694-732). This module
reimplements the published Snowball algorithms for those languages
(https://snowballstem.org/algorithms/) from their public
specifications — no code taken from any stemmer implementation — plus
compact versions of the standard Snowball stopword lists (public word
lists).

Like stemmer.py (Porter2), these run inside pandas UDFs on *unique*
terms per Arrow batch, so pure-Python speed is fine. Every stemmer is
lru-cached.

Conformance: fixture-pinned in tests/test_languages.py. The pins are
inflection-collapse properties (plural == singular stem, verb forms
collapse) plus frozen outputs; this environment has no Snowball
binary to diff against, so the fixtures are the spec.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# shared region helpers (Snowball R1/R2 definition)
# ---------------------------------------------------------------------------


def _r1_pos(word: str, vowels: frozenset[str]) -> int:
    """Position after the first non-vowel following a vowel."""
    for i in range(len(word) - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            return i + 2
    return len(word)


def _r2_pos(word: str, vowels: frozenset[str]) -> int:
    r1 = _r1_pos(word, vowels)
    return r1 + _r1_pos(word[r1:], vowels) if r1 < len(word) else len(word)


def _ends_in(word: str, suffix: str, region_start: int) -> bool:
    """suffix matches AND lies entirely inside the region."""
    return word.endswith(suffix) and len(word) - len(suffix) >= region_start


# ===========================================================================
# German (https://snowballstem.org/algorithms/german/stemmer.html)
# ===========================================================================

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_ENDING = frozenset("bdfghklmnrt")
_DE_ST_ENDING = frozenset("bdfghklmnt")


def _de_prelude(word: str) -> str:
    word = word.replace("ß", "ss")
    out = []
    n = len(word)
    for i, ch in enumerate(word):
        if (
            ch in "uy"
            and 0 < i < n - 1
            and word[i - 1] in _DE_VOWELS
            and word[i + 1] in _DE_VOWELS
        ):
            out.append(ch.upper())
        else:
            out.append(ch)
    return "".join(out)


def _de_regions(word: str) -> tuple[int, int]:
    r1 = _r1_pos(word, _DE_VOWELS)
    r2 = _r2_pos(word, _DE_VOWELS)
    # R1 is adjusted so that the region before it has at least 3 letters
    r1 = max(r1, 3)
    return r1, r2


@lru_cache(maxsize=1 << 16)
def german_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = _de_prelude(word)
    r1, r2 = _de_regions(w)

    # step 1: longest of (a) em/ern/er (b) e/en/es (c) s after s-ending
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if _ends_in(w, suf, r1):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if _ends_in(w, suf, r1):
                    w = w[: -len(suf)]
                    # ergebnisse -> ergebniss -> ergebnis
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and _ends_in(w, "s", r1)
                and len(w) >= 2
                and w[-2] in _DE_S_ENDING
            ):
                w = w[:-1]

    # step 2: longest of (a) en/er/est (b) st after st-ending, 3+ letters
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if _ends_in(w, suf, r1):
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and _ends_in(w, "st", r1)
            and len(w) >= 6
            and w[-3] in _DE_ST_ENDING
        ):
            w = w[:-2]

    # step 3: d-suffixes
    if w.endswith(("end", "ung")):
        if _ends_in(w, w[-3:], r2):
            w = w[:-3]
            if (
                w.endswith("ig")
                and _ends_in(w, "ig", r2)
                and not w.endswith("eig")
            ):
                w = w[:-2]
    elif w.endswith(("isch", "ig", "ik")):
        suf = "isch" if w.endswith("isch") else w[-2:]
        if _ends_in(w, suf, r2) and w[-len(suf) - 1 : -len(suf)] != "e":
            w = w[: -len(suf)]
    elif w.endswith(("lich", "heit")):
        if _ends_in(w, w[-4:], r2):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and _ends_in(w, pre, r1):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if _ends_in(w, "keit", r2):
            w = w[:-4]
            if w.endswith("lich") and _ends_in(w, "lich", r2):
                w = w[:-4]
            elif w.endswith("ig") and _ends_in(w, "ig", r2):
                w = w[:-2]

    # postlude: unmark, fold umlauts
    return (
        w.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )


# ===========================================================================
# French (https://snowballstem.org/algorithms/french/stemmer.html)
# ===========================================================================

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _fr_prelude(word: str) -> str:
    out = list(word)
    n = len(word)
    for i, ch in enumerate(word):
        prev_v = i > 0 and word[i - 1] in _FR_VOWELS
        next_v = i < n - 1 and word[i + 1] in _FR_VOWELS
        if ch in "ui" and prev_v and next_v:
            out[i] = ch.upper()
        elif ch == "y" and (prev_v or next_v):
            out[i] = "Y"
        elif ch == "u" and i > 0 and word[i - 1] == "q":
            out[i] = "U"
    return "".join(out)


def _fr_rv(word: str) -> int:
    n = len(word)
    if n >= 3 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS:
        return 3
    if word[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if word[i] in _FR_VOWELS:
            return i + 1
    return n


@lru_cache(maxsize=1 << 16)
def french_stem(word: str) -> str:  # noqa: C901 — spec transcription
    if len(word) <= 2:
        return word
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    r1 = _r1_pos(w, _FR_VOWELS)
    r2 = _r2_pos(w, _FR_VOWELS)
    orig = w
    step1_done = False
    ment_removed = False

    def in_r2(suf):
        return _ends_in(w, suf, r2)

    def in_r1(suf):
        return _ends_in(w, suf, r1)

    def in_rv(suf):
        return _ends_in(w, suf, rv)

    # ---- step 1: standard suffix removal (longest match) ----
    sufs = sorted(
        [
            "ance", "iqUe", "isme", "able", "iste", "eux", "ances",
            "iqUes", "ismes", "ables", "istes",
            "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
            "logie", "logies", "usion", "ution", "usions", "utions",
            "ence", "ences", "ement", "ements", "ité", "ités",
            "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
            "issement", "issements", "amment", "emment", "ment", "ments",
        ],
        key=len,
        reverse=True,
    )
    matched = next((s for s in sufs if w.endswith(s)), None)
    if matched:
        m = matched
        if m in ("ance", "iqUe", "isme", "able", "iste", "eux",
                 "ances", "iqUes", "ismes", "ables", "istes"):
            if in_r2(m):
                w = w[: -len(m)]
                step1_done = True
        elif m in ("atrice", "ateur", "ation", "atrices", "ateurs",
                   "ations"):
            if in_r2(m):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("ic"):
                    if _ends_in(w, "ic", r2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif m in ("logie", "logies"):
            if in_r2(m):
                w = w[: -len(m)] + "log"
                step1_done = True
        elif m in ("usion", "ution", "usions", "utions"):
            if in_r2(m):
                w = w[: -len(m)] + "u"
                step1_done = True
        elif m in ("ence", "ences"):
            if in_r2(m):
                w = w[: -len(m)] + "ent"
                step1_done = True
        elif m in ("ement", "ements"):
            if in_rv(m):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("iv") and _ends_in(w, "iv", r2):
                    w = w[:-2]
                    if w.endswith("at") and _ends_in(w, "at", r2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if _ends_in(w, "eus", r2):
                        w = w[:-3]
                    elif _ends_in(w, "eus", r1):
                        w = w[:-1] + "x"
                elif (w.endswith("abl") and _ends_in(w, "abl", r2)) or (
                    w.endswith("iqU") and _ends_in(w, "iqU", r2)
                ):
                    w = w[:-3]
                elif (w.endswith("ièr") and _ends_in(w, "ièr", rv)) or (
                    w.endswith("Ièr") and _ends_in(w, "Ièr", rv)
                ):
                    w = w[:-3] + "i"
        elif m in ("ité", "ités"):
            if in_r2(m):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("abil"):
                    if _ends_in(w, "abil", r2):
                        w = w[:-4]
                    else:
                        w = w[:-2] + "l"  # abil -> abl
                elif w.endswith("ic"):
                    if _ends_in(w, "ic", r2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and _ends_in(w, "iv", r2):
                    w = w[:-2]
        elif m in ("if", "ive", "ifs", "ives"):
            if in_r2(m):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("at") and _ends_in(w, "at", r2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if _ends_in(w, "ic", r2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif m == "eaux":
            w = w[:-1]  # eaux -> eau
            step1_done = True
        elif m == "aux":
            if in_r1(m):
                w = w[:-2] + "l"  # aux -> al
                step1_done = True
        elif m in ("euse", "euses"):
            if in_r2(m):
                w = w[: -len(m)]
                step1_done = True
            elif in_r1(m):
                w = w[: -len(m)] + "eux"
                step1_done = True
        elif m in ("issement", "issements"):
            if in_r1(m) and len(w) > len(m) and w[-len(m) - 1] not in _FR_VOWELS:
                w = w[: -len(m)]
                step1_done = True
        elif m == "amment":
            if in_rv(m):
                w = w[:-6] + "ant"
                ment_removed = True
        elif m == "emment":
            if in_rv(m):
                w = w[:-6] + "ent"
                ment_removed = True
        elif m in ("ment", "ments"):
            pre = len(w) - len(m) - 1
            if pre >= 0 and w[pre] in _FR_VOWELS and pre >= rv:
                w = w[: -len(m)]
                ment_removed = True

    # ---- step 2a: verb suffixes beginning i ----
    step2_done = False
    if not step1_done or ment_removed:
        sufs2a = sorted(
            [
                "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
                "irai", "iraIent", "irais", "irait", "iras", "irent",
                "irez", "iriez", "irions", "irons", "iront", "is",
                "issaIent", "issais", "issait", "issant", "issante",
                "issantes", "issants", "isse", "issent", "isses",
                "issez", "issiez", "issions", "issons", "it",
            ],
            key=len,
            reverse=True,
        )
        removed_2a = False
        for s in sufs2a:
            if w.endswith(s):
                pre = len(w) - len(s) - 1
                if (
                    _ends_in(w, s, rv)
                    and pre >= rv
                    and pre >= 0
                    and w[pre] not in _FR_VOWELS
                    and w[pre] != "H"
                ):
                    w = w[: -len(s)]
                    removed_2a = True
                    step2_done = True
                break
        if not removed_2a:
            # ---- step 2b: other verb suffixes ----
            sufs2b = sorted(
                [
                    "ions",
                    "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
                    "eraIent", "erais", "erait", "eras", "erez", "eriez",
                    "erions", "erons", "eront", "ez", "iez",
                    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais",
                    "ait", "ant", "ante", "antes", "ants", "as", "asse",
                    "assent", "asses", "assiez", "assions",
                ],
                key=len,
                reverse=True,
            )
            for s in sufs2b:
                if w.endswith(s):
                    if s == "ions":
                        if _ends_in(w, s, r2) and _ends_in(w, s, rv):
                            w = w[: -len(s)]
                            step2_done = True
                    elif s in (
                        "é", "ée", "ées", "és", "èrent", "er", "era",
                        "erai", "eraIent", "erais", "erait", "eras",
                        "erez", "eriez", "erions", "erons", "eront",
                        "ez", "iez",
                    ):
                        if _ends_in(w, s, rv):
                            w = w[: -len(s)]
                            step2_done = True
                    else:
                        if _ends_in(w, s, rv):
                            w = w[: -len(s)]
                            step2_done = True
                            if w.endswith("e") and _ends_in(w, "e", rv):
                                w = w[:-1]
                    break

    # ---- step 3 / step 4 ----
    if step1_done or step2_done or ment_removed:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        if w.endswith("ion") and _ends_in(w, "ion", r2):
            pre = len(w) - 4
            if pre >= rv and pre >= 0 and w[pre] in "st":
                w = w[:-3]
        else:
            for s, rep in (("Ière", "i"), ("ière", "i"), ("Ier", "i"),
                           ("ier", "i")):
                if w.endswith(s) and _ends_in(w, s, rv):
                    w = w[: -len(s)] + rep
                    break
            else:
                if w.endswith("e") and _ends_in(w, "e", rv):
                    w = w[:-1]

    # ---- step 5: undouble ----
    for s in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(s):
            w = w[:-1]
            break

    # ---- step 6: un-accent ----
    i = len(w) - 1
    seen_nonvowel = 0
    while i >= 0 and w[i] not in _FR_VOWELS and w[i] not in "éè":
        seen_nonvowel += 1
        i -= 1
    if i >= 0 and seen_nonvowel >= 1 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1 :]

    w = w.replace("I", "i").replace("U", "u").replace("Y", "y")
    return w if w else orig


# ===========================================================================
# Spanish (https://snowballstem.org/algorithms/spanish/stemmer.html)
# ===========================================================================

_ES_VOWELS = frozenset("aeiouáéíóúü")
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _ES_VOWELS:
        # next vowel after position 1
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                return i + 1
        return n
    if word[0] in _ES_VOWELS and word[1] in _ES_VOWELS:
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


@lru_cache(maxsize=1 << 16)
def spanish_stem(word: str) -> str:  # noqa: C901 — spec transcription
    if len(word) <= 2:
        return word
    w = word
    rv = _es_rv(w)
    r1 = _r1_pos(w, _ES_VOWELS)
    r2 = _r2_pos(w, _ES_VOWELS)

    # ---- step 0: attached pronouns ----
    pronouns = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo")
    pre_a = ("iéndo", "ándo", "ár", "ér", "ír")
    pre_b = ("iendo", "ando", "ar", "er", "ir")
    for p in pronouns:
        if not w.endswith(p):
            continue
        # the pronoun itself must lie in RV; the verb ending before it
        # only has to string-match (dándoselo: RV starts inside ándo)
        if not _ends_in(w, p, rv):
            break
        base = w[: -len(p)]
        done = False
        for pa, pb in zip(pre_a, pre_b):
            if base.endswith(pa):
                w = base[: -len(pa)] + pb  # delete pronoun, drop accent
                done = True
                break
        if not done:
            for pb in pre_b:
                if base.endswith(pb):
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") and base[:-5].endswith("u"):
            w = base
            done = True
        if done:
            rv = _es_rv(w)
            r1 = _r1_pos(w, _ES_VOWELS)
            r2 = _r2_pos(w, _ES_VOWELS)
        break

    # ---- step 1: standard suffixes (longest match) ----
    step1_done = False
    sufs = sorted(
        [
            "anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
            "ismos", "able", "ables", "ible", "ibles", "ista", "istas",
            "oso", "osa", "osos", "osas", "amiento", "amientos",
            "imiento", "imientos",
            "adora", "ador", "ación", "adoras", "adores", "aciones",
            "ante", "antes", "ancia", "ancias",
            "logía", "logías", "ución", "uciones", "encia", "encias",
            "amente", "mente", "idad", "idades",
            "iva", "ivo", "ivas", "ivos",
        ],
        key=len,
        reverse=True,
    )
    m = next((s for s in sufs if w.endswith(s)), None)
    if m:
        if m in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "able", "ables", "ible", "ibles", "ista",
                 "istas", "oso", "osa", "osos", "osas", "amiento",
                 "amientos", "imiento", "imientos"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)]
                step1_done = True
        elif m in ("adora", "ador", "ación", "adoras", "adores",
                   "aciones", "ante", "antes", "ancia", "ancias"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("ic") and _ends_in(w, "ic", r2):
                    w = w[:-2]
        elif m in ("logía", "logías"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)] + "log"
                step1_done = True
        elif m in ("ución", "uciones"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)] + "u"
                step1_done = True
        elif m in ("encia", "encias"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)] + "ente"
                step1_done = True
        elif m == "amente":
            if _ends_in(w, m, r1):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("iv") and _ends_in(w, "iv", r2):
                    w = w[:-2]
                    if w.endswith("at") and _ends_in(w, "at", r2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")):
                    if _ends_in(w, w[-2:], r2):
                        w = w[:-2]
        elif m == "mente":
            if _ends_in(w, m, r2):
                w = w[: -len(m)]
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and _ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif m in ("idad", "idades"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)]
                step1_done = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and _ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if _ends_in(w, m, r2):
                w = w[: -len(m)]
                step1_done = True
                if w.endswith("at") and _ends_in(w, "at", r2):
                    w = w[:-2]

    # ---- step 2a: verb suffixes beginning y ----
    if not step1_done:
        removed = False
        for s in sorted(["ya", "ye", "yan", "yen", "yeron", "yendo",
                         "yo", "yó", "yas", "yes", "yais", "yamos"],
                        key=len, reverse=True):
            if w.endswith(s) and _ends_in(w, s, rv):
                pre = len(w) - len(s) - 1
                if pre >= 0 and w[pre] == "u":
                    w = w[: -len(s)]
                    removed = True
                break
        # ---- step 2b: other verb suffixes ----
        if not removed:
            gu_group = ("en", "es", "éis", "emos")
            big = [
                "arían", "arías", "arán", "arás", "aríais", "aría",
                "aréis", "aríamos", "aremos", "ará", "aré", "erían",
                "erías", "erán", "erás", "eríais", "ería", "eréis",
                "eríamos", "eremos", "erá", "eré", "irían", "irías",
                "irán", "irás", "iríais", "iría", "iréis", "iríamos",
                "iremos", "irá", "iré", "aba", "ada", "ida", "ía",
                "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
                "iste", "an", "aban", "ían", "aran", "ieran", "asen",
                "iesen", "aron", "ieron", "ado", "ido", "ando",
                "iendo", "ió", "ar", "er", "ir", "as", "abas", "adas",
                "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
                "áis", "abais", "íais", "arais", "ierais", "aseis",
                "ieseis", "asteis", "isteis", "ados", "idos", "amos",
                "ábamos", "íamos", "imos", "áramos", "iéramos",
                "iésemos", "ásemos",
            ]
            allv = sorted(set(big) | set(gu_group), key=len, reverse=True)
            for s in allv:
                if w.endswith(s) and _ends_in(w, s, rv):
                    w = w[: -len(s)]
                    if s in gu_group and w.endswith("gu"):
                        w = w[:-1]
                    break

    # ---- step 3: residual ----
    for s in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(s) and _ends_in(w, s, rv):
            w = w[: -len(s)]
            break
    else:
        if w.endswith(("e", "é")) and _ends_in(w, w[-1], rv):
            w = w[:-1]
            if w.endswith("gu") and _ends_in(w, "u", rv):
                w = w[:-1]

    return w.translate(_ES_UNACCENT)


# ===========================================================================
# stopword lists (standard Snowball lists, as shipped with Postgres)
# ===========================================================================

FRENCH_STOPWORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que
qui sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l à
m n s t y été étée étées étés étant suis es est sommes êtes sont serai seras
sera serons serez seront serais serait serions seriez seraient étais était
étions étiez étaient fus fut fûmes fûtes furent sois soit soyons soyez
soient fusse fusses fût fussions fussiez fussent ayant eu eue eues eus ai
as avons avez ont aurai auras aura aurons aurez auront aurais aurait
aurions auriez auraient avais avait avions aviez avaient eut eûmes eûtes
eurent aie aies ait ayons ayez aient eusse eusses eût eussions eussiez
eussent
""".split())

GERMAN_STOPWORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das dass daß derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn derer dessen dich dir du dies diese diesem
diesen dieser dieses doch dort durch ein eine einem einen einer eines einig
einige einigem einigen einiger einiges einmal er ihn ihm es etwas euer eure
eurem euren eurer eures für gegen gewesen hab habe haben hat hatte hatten
hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer ihres euch im in
indem ins ist jede jedem jeden jeder jedes jene jenem jenen jener jenes
jetzt kann kein keine keinem keinen keiner keines können könnte machen man
manche manchem manchen mancher manches mein meine meinem meinen meiner
meines mit muss musste nach nicht nichts noch nun nur ob oder ohne sehr
sein seine seinem seinen seiner seines selbst sich sie ihnen sind so solche
solchem solchen solcher solches soll sollte sondern sonst über um und uns
unse unsem unsen unser unses unter viel vom von vor während war waren warst
was weg weil weiter welche welchem welchen welcher welches wenn werde
werden wie wieder will wir wird wirst wo wollen wollte würde würden zu zum
zur zwar zwischen
""".split())

SPANISH_STOPWORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre también
me hasta hay donde quien desde todo nos durante todos uno les ni contra
otros ese eso ante ellos e esto mí antes algunos qué unos yo otro otras
otra él tanto esa estos mucho quienes nada muchos cual poco ella estar
estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras vosotros
vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya suyos suyas
nuestro nuestra nuestros nuestras vuestro vuestra vuestros vuestras esos
esas estoy estás está estamos estáis están esté estés estemos estéis estén
estaré estarás estará estaremos estaréis estarán estaría estarías
estaríamos estaríais estarían estaba estabas estábamos estabais estaban
estuve estuviste estuvo estuvimos estuvisteis estuvieron estuviera
estuvieras estuviéramos estuvierais estuvieran estuviese estuvieses
estuviésemos estuvieseis estuviesen estando estado estada estados estadas
estad he has ha hemos habéis han haya hayas hayamos hayáis hayan habré
habrás habrá habremos habréis habrán habría habrías habríamos habríais
habrían había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran hubiese
hubieses hubiésemos hubieseis hubiesen habiendo habido habida habidos
habidas soy eres es somos sois son sea seas seamos seáis sean seré serás
será seremos seréis serán sería serías seríamos seríais serían era eras
éramos erais eran fui fuiste fue fuimos fuisteis fueron fuera fueras
fuéramos fuerais fueran fuese fueses fuésemos fueseis fuesen siendo sido
tengo tienes tiene tenemos tenéis tienen tenga tengas tengamos tengáis
tengan tendré tendrás tendrá tendremos tendréis tendrán tendría tendrías
tendríamos tendríais tendrían tenía tenías teníamos teníais tenían tuve
tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras tuviéramos
tuvierais tuvieran tuviese tuvieses tuviésemos tuvieseis tuviesen teniendo
tenido tenida tenidos tenidas tened
""".split())


_STEMMERS = {
    "french": french_stem,
    "german": german_stem,
    "spanish": spanish_stem,
}


def get_stemmer(name: str):
    try:
        return _STEMMERS[name]
    except KeyError:
        raise ValueError(f"unknown stemmer {name!r}; have {sorted(_STEMMERS)}")
