"""English Snowball stemmer (Porter2), pure Python.

Implemented from the public Snowball algorithm specification — the same
algorithm the reference compiles from
`xapian-core/languages/english.sbl` (Snowball declarative source); this is
a from-scratch re-implementation of the algorithm, not a translation of
the generated C.

Used at DICTIONARY level: the per-batch cache means each distinct token is
stemmed once per Arrow batch, so the per-row cost inside the inverter UDF
is one dict lookup.
"""

from __future__ import annotations

from functools import lru_cache

_VOW = frozenset("aeiouy")
_V_WXY = frozenset("aeiouywxY")
_VALID_LI = frozenset("cdeghkmnrt")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EXCEPTION1 = {
    # special changes
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    # special -LY cases
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTION2 = frozenset(
    (
        "inning",
        "outing",
        "canning",
        "herring",
        "earring",
        "proceed",
        "exceed",
        "succeed",
    )
)

# (suffix, replacement, extra) — longest-first; extra: None, "ogi" (needs
# preceding 'l'), "li" (needs preceding valid_LI char)
_STEP2 = (
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "ogi"),
    ("li", "", "li"),
)

_STEP3 = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ative", "", True),  # True: additionally requires R2
    ("ical", "ic", False),
    ("ness", "", False),
    ("ful", "", False),
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # special: needs preceding s/t
    "al",
    "er",
    "ic",
)


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def region_after(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOW:
            i += 1
        if i == n:
            return n
        i += 1  # past the vowel
        while i < n and w[i] in _VOW:
            i += 1
        if i == n:
            return n
        return i + 1  # past the non-vowel

    p1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        p1 = region_after(0)
    p2 = region_after(p1)
    return p1, p2


def _shortv(w: str, c: int) -> bool:
    """Snowball shortv tested with (backward) cursor at index c."""
    if c >= 3 and w[c - 1] not in _V_WXY and w[c - 2] in _VOW and w[c - 3] not in _VOW:
        return True
    if c == 2 and w[c - 1] not in _VOW and w[c - 2] in _VOW:
        return True
    return False


@lru_cache(maxsize=1 << 17)
def stem_en(word: str) -> str:
    """Stem one (already-lowercased) word."""
    ex = _EXCEPTION1.get(word)
    if ex is not None:
        return ex
    if len(word) < 3:
        return word

    w = word
    # prelude: strip one leading apostrophe; mark consonant-y as 'Y'
    if w[0] == "'":
        w = w[1:]
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOW:
            chars[i] = "Y"
    w = "".join(chars)

    p1, p2 = _mark_regions(w)

    # ---- Step 1a -------------------------------------------------------
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        pre = w[:-3]
        w = pre + ("i" if len(pre) > 1 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        # delete if a vowel exists before the char preceding the 's'
        if any(ch in _VOW for ch in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # ---- Step 1b -------------------------------------------------------
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            if suf in ("eedly", "eed"):
                if len(w) - len(suf) >= p1:
                    w = w[: -len(suf)] + "ee"
            else:
                pre = w[: -len(suf)]
                if any(ch in _VOW for ch in pre):
                    w = pre
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif p1 == len(w) and _shortv(w, len(w)):
                        w += "e"
            break

    # ---- Step 1c -------------------------------------------------------
    if len(w) >= 3 and w[-1] in "yY" and w[-2] not in _VOW:
        w = w[:-1] + "i"

    # ---- Step 2 (suffix must start within R1) --------------------------
    for suf, rep, extra in _STEP2:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if start >= p1:
                if extra == "ogi":
                    if start >= 1 and w[start - 1] == "l":
                        w = w[:start] + rep
                elif extra == "li":
                    if start >= 1 and w[start - 1] in _VALID_LI:
                        w = w[:start] + rep
                else:
                    w = w[:start] + rep
            break  # longest-match only; no retry on shorter suffixes

    # ---- Step 3 (R1; 'ative' also needs R2) ----------------------------
    for suf, rep, need_r2 in _STEP3:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if start >= p1 and (not need_r2 or start >= p2):
                w = w[:start] + rep
            break

    # ---- Step 4 (R2) ---------------------------------------------------
    for suf in _STEP4:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if start >= p2:
                if suf == "ion":
                    if start >= 1 and w[start - 1] in "st":
                        w = w[:start]
                else:
                    w = w[:start]
            break

    # ---- Step 5 --------------------------------------------------------
    if w.endswith("e"):
        start = len(w) - 1
        if start >= p2 or (start >= p1 and not _shortv(w, start)):
            w = w[:start]
    elif w.endswith("l"):
        start = len(w) - 1
        if start >= p2 and start >= 1 and w[start - 1] == "l":
            w = w[:start]

    return w.replace("Y", "y")


def stem_tokens(tokens: list[str]) -> list[str]:
    """Stem a token list (lru-cached per distinct token)."""
    return [stem_en(t) for t in tokens]


class Stemmer:
    """Language-dispatch facade mirroring Xapian::Stem (languages/stem.cc
    language table).  Each language is a from-scratch implementation of
    the published Snowball algorithm.  Validation status (see
    tests/test_stem_multilang.py and SURVEY/VERDICT): 25 variants are
    byte-exact on the full public Snowball vocabularies
    (xapian-data/stemming/<lang>); tamil, arabic, armenian and catalan
    ship no public vocabulary and are spec-derived from their .sbl
    sources with smoke tests."""

    _ALIASES = {
        "en": "english", "english": "english",
        "fr": "french", "french": "french",
        "de": "german", "german": "german",
        "de2": "german2", "german2": "german2",
        "ru": "russian", "russian": "russian",
        "da": "danish", "danish": "danish",
        # Snowball's norwegian covers nb and nn (norwegian.sbl alias note)
        "nb": "norwegian", "nn": "norwegian", "no": "norwegian",
        "norwegian": "norwegian",
        "sv": "swedish", "swedish": "swedish",
        "es": "spanish", "spanish": "spanish",
        "pt": "portuguese", "portuguese": "portuguese",
        "it": "italian", "italian": "italian",
        "nl": "dutch", "dutch": "dutch",
        "ro": "romanian", "romanian": "romanian",
        "id": "indonesian", "indonesian": "indonesian",
        "ga": "irish", "irish": "irish",
        "eu": "basque", "basque": "basque",
        "hu": "hungarian", "hungarian": "hungarian",
        "fi": "finnish", "finnish": "finnish",
        "porter": "porter", "earlyenglish": "earlyenglish",
        "lovins": "lovins", "kraaij_pohlmann": "kraaij_pohlmann",
        "lt": "lithuanian", "lithuanian": "lithuanian",
        "ne": "nepali", "nepali": "nepali",
        "tr": "turkish", "turkish": "turkish",
        "ta": "tamil", "tamil": "tamil",
        "ar": "arabic", "arabic": "arabic",
        "hy": "armenian", "armenian": "armenian",
        "ca": "catalan", "catalan": "catalan",
        "none": "none",
    }

    def __init__(self, language: str = "en"):
        lang = self._ALIASES.get(language)
        if lang is None:
            raise ValueError(f"unsupported stemmer language: {language}")
        self.language = lang
        if lang == "english":
            self._fn = stem_en
        elif lang == "french":
            from xapian_spark.text.stem_fr import stem_fr

            self._fn = stem_fr
        elif lang == "german":
            from xapian_spark.text.stem_de import stem_de

            self._fn = stem_de
        elif lang == "german2":
            from xapian_spark.text.stem_de import stem_de2

            self._fn = stem_de2
        elif lang == "russian":
            from xapian_spark.text.stem_ru import stem_ru

            self._fn = stem_ru
        elif lang == "spanish":
            from xapian_spark.text.stem_es import stem_es

            self._fn = stem_es
        elif lang == "portuguese":
            from xapian_spark.text.stem_pt import stem_pt

            self._fn = stem_pt
        elif lang == "italian":
            from xapian_spark.text.stem_it import stem_it

            self._fn = stem_it
        elif lang == "dutch":
            from xapian_spark.text.stem_nl import stem_nl

            self._fn = stem_nl
        elif lang == "romanian":
            from xapian_spark.text.stem_ro import stem_ro

            self._fn = stem_ro
        elif lang == "indonesian":
            from xapian_spark.text.stem_id import stem_id

            self._fn = stem_id
        elif lang == "irish":
            from xapian_spark.text.stem_ga import stem_ga

            self._fn = stem_ga
        elif lang == "basque":
            from xapian_spark.text.stem_eu import stem_eu

            self._fn = stem_eu
        elif lang == "hungarian":
            from xapian_spark.text.stem_hu import stem_hu

            self._fn = stem_hu
        elif lang == "finnish":
            from xapian_spark.text.stem_fi import stem_fi

            self._fn = stem_fi
        elif lang == "lithuanian":
            from xapian_spark.text.stem_lt import stem_lt

            self._fn = stem_lt
        elif lang == "nepali":
            from xapian_spark.text.stem_ne import stem_ne

            self._fn = stem_ne
        elif lang == "turkish":
            from xapian_spark.text.stem_tr import stem_tr

            self._fn = stem_tr
        elif lang == "tamil":
            from xapian_spark.text.stem_ta import stem_ta

            self._fn = stem_ta
        elif lang == "arabic":
            from xapian_spark.text.stem_ar import stem_ar

            self._fn = stem_ar
        elif lang == "armenian":
            from xapian_spark.text.stem_hy import stem_hy

            self._fn = stem_hy
        elif lang == "catalan":
            from xapian_spark.text.stem_ca import stem_ca

            self._fn = stem_ca
        elif lang == "lovins":
            from xapian_spark.text.stem_lovins import stem_lovins

            self._fn = stem_lovins
        elif lang == "kraaij_pohlmann":
            from xapian_spark.text.stem_kp import stem_kp

            self._fn = stem_kp
        elif lang in ("porter", "earlyenglish"):
            from xapian_spark.text import stem_porter as _sp

            self._fn = (_sp.stem_porter if lang == "porter"
                        else _sp.stem_earlyenglish)
        elif lang in ("danish", "norwegian", "swedish"):
            from xapian_spark.text import stem_scand

            self._fn = {
                "danish": stem_scand.stem_da,
                "norwegian": stem_scand.stem_no,
                "swedish": stem_scand.stem_sv,
            }[lang]
        else:
            self._fn = lambda w: w

    def __call__(self, word: str) -> str:
        return self._fn(word)

    @property
    def is_none(self) -> bool:
        return self.language == "none"
