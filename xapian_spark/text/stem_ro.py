"""Romanian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Romanian algorithm
(the same one the reference compiles from
`xapian-core/languages/romanian.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/romanian).

Special characters follow the .sbl: a-breve U+0103, s-cedilla U+015F,
t-cedilla U+0163 (not the comma-below forms).
"""

from __future__ import annotations

from functools import lru_cache

AB = "ă"   # ă
AC = "â"   # â
IC = "î"   # î
SC = "ş"   # ş
TC = "ţ"   # ţ

_V = frozenset("aeiou" + AC + IC + AB)


def _prelude(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        n = len(s)
        if s[i] in _V:
            if i + 2 < n and s[i + 1] == "u" and s[i + 2] in _V:
                s[i + 1] = "U"
                continue
            if i + 2 < n and s[i + 1] == "i" and s[i + 2] in _V:
                s[i + 1] = "I"
                continue
        i += 1
    return "".join(s)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = p1 = p2 = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    pv = j + 1
            else:
                j = 2
                while j < n and w[j] in _V:
                    j += 1
                if j < n:
                    pv = j + 1
        else:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    pv = j + 1
            else:
                if n >= 3:
                    pv = 3

    def gopast_v(j):
        while j < n and w[j] not in _V:
            j += 1
        return j + 1 if j < n else None

    def gopast_nonv(j):
        while j < n and w[j] in _V:
            j += 1
        return j + 1 if j < n else None

    j = gopast_v(0)
    if j is not None:
        j = gopast_nonv(j)
        if j is not None:
            p1 = j
            j = gopast_v(j)
            if j is not None:
                j = gopast_nonv(j)
                if j is not None:
                    p2 = j
    return pv, p1, p2


def _longest(w: str, lim: int, *groups):
    best = None
    avail = len(w) - lim
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


_STEP0 = [
    (("ul", "ului"), ""),
    (("aua",), "a"),
    (("ea", "ele", "elor"), "e"),
    (("ii", "iua", "iei", "iile", "iilor", "ilor"), "i"),
    (("ile",), "i"),          # not preceded by 'ab'
    (("atei",), "at"),
    ((f"a{TC}ie", f"a{TC}ia"), f"a{TC}i"),
]

_COMBO = [
    (("abilitate", "abilitati", f"abilit{AB}i", f"abilit{AB}{TC}i"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", f"ivit{AB}i", f"ivit{AB}{TC}i"), "iv"),
    ((
        "icitate", "icitati", f"icit{AB}i", f"icit{AB}{TC}i", "icator",
        "icatori", "iciv", "iciva", "icive", "icivi", f"iciv{AB}", "ical",
        "icala", "icale", "icali", f"ical{AB}",
    ), "ic"),
    ((
        "ativ", "ativa", "ative", "ativi", f"ativ{AB}", f"a{TC}iune",
        "atoare", "ator", "atori", f"{AB}toare", f"{AB}tor", f"{AB}tori",
    ), "at"),
    ((
        "itiv", "itiva", "itive", "itivi", f"itiv{AB}", f"i{TC}iune",
        "itoare", "itor", "itori",
    ), "it"),
]

_STD_DEL = (
    "at", "ata", f"at{AB}", "ati", "ate",
    "ut", "uta", f"ut{AB}", "uti", "ute",
    "it", "ita", f"it{AB}", "iti", "ite",
    "ic", "ica", "ice", "ici", f"ic{AB}",
    "abil", "abila", "abile", "abili", f"abil{AB}",
    "ibil", "ibila", "ibile", "ibili", f"ibil{AB}",
    "oasa", f"oas{AB}", "oase", "os", "osi", f"o{SC}i",
    "ant", "anta", "ante", "anti", f"ant{AB}",
    "ator", "atori",
    "itate", "itati", f"it{AB}i", f"it{AB}{TC}i",
    "iv", "iva", "ive", "ivi", f"iv{AB}",
)
_STD_IUNE = ("iune", "iuni")
_STD_IST = ("ism", "isme", "ist", "ista", "iste", "isti", f"ist{AB}",
            f"i{SC}ti")

_VERB_G1 = (
    "are", "ere", "ire", f"{AC}re",
    "ind", f"{AC}nd", "indu", f"{AC}ndu",
    "eze", f"easc{AB}",
    "ez", "ezi", f"eaz{AB}", "esc", f"e{SC}ti", f"e{SC}te",
    f"{AB}sc", f"{AB}{SC}ti", f"{AB}{SC}te",
    "am", "ai", "au",
    "eam", "eai", "ea", f"ea{TC}i", "eau",
    "iam", "iai", "ia", f"ia{TC}i", "iau",
    "ui",
    f"a{SC}i", f"ar{AB}m", f"ar{AB}{TC}i", f"ar{AB}",
    f"u{SC}i", f"ur{AB}m", f"ur{AB}{TC}i", f"ur{AB}",
    f"i{SC}i", f"ir{AB}m", f"ir{AB}{TC}i", f"ir{AB}",
    f"{AC}i", f"{AC}{SC}i", f"{AC}r{AB}m", f"{AC}r{AB}{TC}i", f"{AC}r{AB}",
    "asem", f"ase{SC}i", "ase", f"aser{AB}m", f"aser{AB}{TC}i", f"aser{AB}",
    "isem", f"ise{SC}i", "ise", f"iser{AB}m", f"iser{AB}{TC}i", f"iser{AB}",
    f"{AC}sem", f"{AC}se{SC}i", f"{AC}se", f"{AC}ser{AB}m",
    f"{AC}ser{AB}{TC}i", f"{AC}ser{AB}",
    "usem", f"use{SC}i", "use", f"user{AB}m", f"user{AB}{TC}i", f"user{AB}",
)
_VERB_G2 = (
    f"{AB}m", f"a{TC}i",
    "em", f"e{TC}i",
    "im", f"i{TC}i",
    f"{AC}m", f"{AC}{TC}i",
    f"se{SC}i", f"ser{AB}m", f"ser{AB}{TC}i", f"ser{AB}",
    "sei", "se",
    "sesem", f"sese{SC}i", "sese", f"seser{AB}m", f"seser{AB}{TC}i",
    f"seser{AB}",
)


@lru_cache(maxsize=1 << 17)
def stem_ro(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    # step 0 (R1)
    m = _longest(w, 0, *[sufs for sufs, _ in _STEP0])
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= p1:
            rep = _STEP0[gid][1]
            if not (gid == 4 and w[:start].endswith("ab")):  # 'ile' not ab-
                w = w[:start] + rep

    # standard_suffix: repeat combo, then R2 among
    removed = False
    while True:
        m = _longest(w, 0, *[sufs for sufs, _ in _COMBO])
        if m is None:
            break
        suf, gid = m
        start = len(w) - len(suf)
        if start < p1:
            break
        w = w[:start] + _COMBO[gid][1]
        removed = True
    m = _longest(w, 0, _STD_DEL, _STD_IUNE, _STD_IST)
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= p2:
            if gid == 0:
                w = w[:start]
                removed = True
            elif gid == 1:
                # 'iune'/'iuni' require a preceding t-cedilla -> 't'
                if start >= 1 and w[start - 1] == TC:
                    w = w[: start - 1] + "t"
                    removed = True
            else:
                w = w[:start] + "ist"
                removed = True

    if not removed:
        # setlimit wraps the whole among INCLUDING the non-v/'u'
        # precondition: that char must itself lie within RV
        m = _longest(w, pv, _VERB_G1, _VERB_G2)
        if m is not None:
            suf, gid = m
            start = len(w) - len(suf)
            if gid == 0:
                if (
                    start - 1 >= pv
                    and (w[start - 1] not in _V or w[start - 1] == "u")
                ):
                    w = w[:start]
            else:
                w = w[:start]

    # vowel_suffix: substring matched UNLIMITED (longest wins), RV is a
    # condition — 'anglie' keeps 'ie' rather than falling back to 'e'
    m = _longest(w, 0, ("a", "e", "i", "ie", AB))
    if m is not None and len(w) - len(m[0]) >= pv:
        w = w[: -len(m[0])]

    return w.replace("I", "i").replace("U", "u")
