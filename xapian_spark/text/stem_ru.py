"""Russian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Russian algorithm
(the same algorithm the reference compiles from
`xapian-core/languages/russian.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/russian, 49785 pairs).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("аеиоуыэюя")

# suffix groups; group-1 entries additionally require а/я immediately
# before the suffix (which stays)
_PERF_GERUND_1 = ("в", "вши", "вшись")
_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю",
    "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_REFLEXIVE = ("ся", "сь")
_VERB_1 = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
    "ют", "ны", "ть", "ешь", "нно",
)
_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
    "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
)
_DERIVATIONAL = ("ост", "ость")
_SUPERLATIVE = ("ейш", "ейше")


def _longest(w: str, lim: int, *groups: tuple[str, ...]):
    """Snowball `among` match: the longest suffix of w (not crossing the
    backward limit `lim`) drawn from any group; -> (suffix, group_index)
    or None.  Conditions run AFTER the match — a failing condition fails
    the whole among, it does not retry shorter suffixes."""
    best = None
    avail = len(w) - lim
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


def _aya_before(w: str, suf: str, lim: int) -> bool:
    i = len(w) - len(suf) - 1
    return i >= lim and w[i] in "ая"


@lru_cache(maxsize=1 << 17)
def stem_ru(word: str) -> str:
    w = word.replace("ё", "е")
    n = len(w)

    # -- mark_regions: pV after the first vowel; p2 the standard R2 -------
    pv = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i < n:
        pv = i + 1
        j = pv
        while j < n and w[j] in _V:       # gopast non-v
            j += 1
        if j < n:
            j += 1
            while j < n and w[j] not in _V:  # gopast v
                j += 1
            if j < n:
                j += 1
                while j < n and w[j] in _V:  # gopast non-v
                    j += 1
                if j < n:
                    p2 = j + 1
    rv = pv

    # -- step 1: perfective gerund, else (reflexive?; adjectival|verb|noun)
    done = False
    m = _longest(w, rv, _PERF_GERUND_1, _PERF_GERUND_2)
    if m is not None:
        suf, gid = m
        if gid == 1 or _aya_before(w, suf, rv):
            w = w[: -len(suf)]
            done = True
    if not done:
        m = _longest(w, rv, _REFLEXIVE)
        if m is not None:
            w = w[: -len(m[0])]
        m = _longest(w, rv, _ADJECTIVE)
        if m is not None:
            w = w[: -len(m[0])]
            m = _longest(w, rv, _PARTICIPLE_1, _PARTICIPLE_2)
            if m is not None:
                suf, gid = m
                if gid == 1:
                    w = w[: -len(suf)]
                elif _aya_before(w, suf, rv):
                    w = w[: -len(suf)]
        else:
            ok = False
            m = _longest(w, rv, _VERB_1, _VERB_2)
            if m is not None:
                suf, gid = m
                if gid == 1 or _aya_before(w, suf, rv):
                    w = w[: -len(suf)]
                    ok = True
            if not ok:
                m = _longest(w, rv, _NOUN)
                if m is not None:
                    w = w[: -len(m[0])]

    # -- step 2: trailing и ----------------------------------------------
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # -- step 3: derivational (R2) ---------------------------------------
    m = _longest(w, rv, _DERIVATIONAL)
    if m is not None and len(w) - len(m[0]) >= p2:
        w = w[: -len(m[0])]

    # -- step 4: tidy up --------------------------------------------------
    m = _longest(w, rv, _SUPERLATIVE, ("н",), ("ь",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
            if (
                w.endswith("нн")
                and len(w) - 2 >= rv
            ):
                w = w[:-1]
        elif gid == 1:
            if len(w) >= 2 and w[-2] == "н" and len(w) - 2 >= rv:
                w = w[:-1]
        else:
            w = w[:-1]
    return w
