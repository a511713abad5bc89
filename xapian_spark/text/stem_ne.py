"""Nepali Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Nepali algorithm
(the same one the reference compiles from
`xapian-core/languages/nepali.sbl`; Shrestha/Bartunov/Dhakal), validated
against the full public Snowball test vocabulary
(xapian-data/stemming/nepali).  Suffix tables are the sbl's Devanagari
composites decoded to literal strings.
"""

from __future__ import annotations

from functools import lru_cache

_C1_MAIN = (
    "मार्फत", "द्वारा", "सँगै", "संग", "सँग", "लाइ", "लाई", "पछि",
    "ले", "रत", "मै", "मा",
)
_C1_KA = ("को", "का", "कि", "की", "कै")
_C2_PRE = ("यौ", "छौ", "नौ", "थे")
_C3 = (
    "थिइस्", "हुनेछ", "हुन्छ", "नेछस्", "नेछन्", "इएकी", "इएका", "इएको",
    "िएकी", "िएका", "िएको", "इछन्", "िछन्", "इछस्", "िछस्", "एछन्",
    "ेछन्", "एछस्", "ेछस्", "छिन्", "छेस्", "छ्यौ", "थिन्", "थियो",
    "थियौ", "थिस्", "थ्यो", "थ्यौ", "दियो", "देखि", "देखी", "लान्",
    "माथि", "नेकै", "नेका", "नेको", "नेछौ", "होस्", "इन्छ", "िन्छ",
    "नेछु", "इछौ", "िछौ", "इस्", "िस्", "ियो", "इयो", "एका", "ेका",
    "एकी", "ेकी", "एकै", "ेकै", "एको", "ेको", "एछु", "ेछु", "एछौ",
    "ेछौ", "छन्", "छस्", "थिए", "पर्", "भयो", "हरु", "हरू", "िदा",
    "इदा", "िदो", "इदो", "िदै", "इदै", "नेछ", "इछ", "िछ", "एछ", "ेछ",
    "छु", "छे", "छौ", "थी", "थे", "दा", "दी", "दै", "दो", "नु", "ने",
    "यो", "यौ", "छ",
)


def _longest(w: str, *groups):
    best = None
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, gid)
    return best


@lru_cache(maxsize=1 << 17)
def stem_ne(word: str) -> str:
    w = word
    # category 1
    m = _longest(w, _C1_MAIN, _C1_KA)
    if m is not None:
        suf, gid = m
        base = w[: -len(suf)]
        if gid == 0:
            w = base
        else:
            # को/का/कि/की/कै kept after ए or े, deleted otherwise
            if not (base.endswith("ए") or base.endswith("े")):
                w = base
    # repeat: conditional category-2 removal, then a category-3 suffix
    while True:
        # do(check_category_2 and remove_category_2)
        if w.endswith(("ँ", "ं")):
            base = w[:-1]
            if base.endswith(_C2_PRE):
                w = base
        elif w.endswith("ै"):
            base = w[:-1]
            if base.endswith("त्र"):
                w = base
        m = _longest(w, _C3)
        if m is None:
            break
        w = w[: -len(m[0])]
    return w
