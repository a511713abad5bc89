"""Irish Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Irish algorithm
(the same one the reference compiles from
`xapian-core/languages/irish.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/irish).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouáéíóú")

# initial_morph: longest prefix pattern -> replacement ('' = delete)
_INITIAL = [
    ("d'fh", "f"), ("bhf", "f"),
    ("h-", ""), ("n-", ""), ("t-", ""), ("d'", ""), ("m'", ""), ("b'", ""),
    ("sh", "s"), ("mb", "b"), ("gc", "c"), ("nd", "d"), ("ng", "g"),
    ("bp", "p"), ("ts", "s"), ("dt", "t"), ("bh", "b"), ("ch", "c"),
    ("dh", "d"), ("fh", "f"), ("gh", "g"), ("mh", "m"), ("ph", "p"),
    ("th", "t"),
]

_NOUN_R1 = (
    "amh", "eamh", "abh", "eabh", "aibh", "ibh", "aimh", "imh",
    "aíocht", "íocht", "aíochta", "íochta",
)
_NOUN_R2 = ("ire", "irí", "aire", "airí")
_DERIV_R2 = (
    "acht", "eacht", "ach", "each", "eachtúil", "eachta", "achtúil",
    "achta",
)
_DERIV_REPL = [
    (("arcacht", "arcachtaí", "arcachta"), "arc"),
    (("gineach", "gineas", "ginis"), "gin"),
    (("grafaíoch", "grafaíocht", "grafaíochta", "grafaíochtaí"), "graf"),
    (("paite", "patach", "pataigh", "patacha"), "paite"),
    (("óideach", "óideacha", "óidigh"), "óid"),
]
_VERB_RV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_VERB_R1 = ("ain", "eadh", "adh", "áil", "tear", "tar")


def _longest(w: str, *groups):
    best = None
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, gid)
    return best


@lru_cache(maxsize=1 << 17)
def stem_ga(word: str) -> str:
    w = word
    # initial_morph (forward, longest prefix)
    best = None
    for pat, rep in _INITIAL:
        if w.startswith(pat) and (best is None or len(pat) > len(best[0])):
            best = (pat, rep)
    if best is not None:
        w = best[1] + w[len(best[0]):]

    n = len(w)
    pv = p1 = p2 = n
    j = 0
    while j < n and w[j] not in _V:
        j += 1
    if j < n:
        pv = j + 1
        k = pv
        while k < n and w[k] in _V:
            k += 1
        if k < n:
            p1 = k + 1
            k = p1
            while k < n and w[k] not in _V:
                k += 1
            if k < n:
                k += 1
                while k < n and w[k] in _V:
                    k += 1
                if k < n:
                    p2 = k + 1

    # noun_sfx
    m = _longest(w, _NOUN_R1, _NOUN_R2)
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if (gid == 0 and start >= p1) or (gid == 1 and start >= p2):
            w = w[:start]

    # deriv
    m = _longest(w, _DERIV_R2, *[sufs for sufs, _ in _DERIV_REPL])
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if gid == 0:
            if start >= p2:
                w = w[:start]
        else:
            w = w[:start] + _DERIV_REPL[gid - 1][1]

    # verb_sfx
    m = _longest(w, _VERB_RV, _VERB_R1)
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if (gid == 0 and start >= pv) or (gid == 1 and start >= p1):
            w = w[:start]
    return w
