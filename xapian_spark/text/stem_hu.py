"""Hungarian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Hungarian
algorithm (the same one the reference compiles from
`xapian-core/languages/hungarian.sbl`), validated against the full
public Snowball test vocabulary (xapian-data/stemming/hungarian).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouáéíóöőúüű")
_DIGRAPHS = ("dzs", "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
             "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_START_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz",
)


def _r1(w: str) -> int:
    n = len(w)
    if n == 0:
        return n
    if w[0] in _V:
        j = 1
        while j < n and w[j] in _V:
            j += 1
        if j >= n:
            return n
        # digraph cluster counts as one consonant unit
        for d in _START_DIGRAPHS:
            if w.startswith(d, j):
                return j + len(d)
        return j + 1
    j = 0
    while j < n and w[j] not in _V:
        j += 1
    return j + 1 if j < n else n


def _ends_double(w: str) -> bool:
    return w.endswith(_DOUBLES)


def _undouble(w: str) -> str:
    """Remove the second-to-last char (backward `next [hop 1] delete`)."""
    if len(w) >= 2:
        return w[:-2] + w[-1]
    return w


def _longest(w: str, entries):
    """entries: list of (suffix, action); longest suffix match wins."""
    best = None
    for s, act in entries:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, act)
    return best


_CASE = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
    "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként", "ként",
    "en", "on", "an", "ön", "n", "t",
)
_CASE_SPECIAL = [("ánként", "a"), ("én", "e"), ("án", "a")]
_CASE_OTHER = [
    ("astul", ""), ("estül", ""), ("ástul", "a"), ("éstül", "e"),
    ("stul", ""), ("stül", ""),
]
_PLURAL = [
    ("ák", "a"), ("ék", "e"), ("ök", ""), ("ak", ""), ("ok", ""),
    ("ek", ""), ("k", ""),
]
_OWNED = [
    ("oké", ""), ("öké", ""), ("aké", ""), ("eké", ""), ("éké", "e"),
    ("áké", "a"), ("ké", ""), ("ééi", "e"), ("áéi", "a"), ("éi", ""),
    ("éé", "e"), ("é", ""),
]
_SING_OWNER = [
    ("ünk", ""), ("unk", ""), ("ánk", "a"), ("énk", "e"), ("nk", ""),
    ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""), ("uk", ""),
    ("ük", ""), ("em", ""), ("om", ""), ("am", ""), ("ám", "a"),
    ("ém", "e"), ("m", ""), ("od", ""), ("ed", ""), ("ad", ""),
    ("öd", ""), ("ád", "a"), ("éd", "e"), ("d", ""), ("ja", ""),
    ("je", ""), ("a", ""), ("e", ""), ("o", ""), ("á", "a"), ("é", "e"),
]
_PLUR_OWNER = [
    ("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"), ("aim", ""),
    ("eim", ""), ("im", ""), ("jaid", ""), ("jeid", ""), ("áid", "a"),
    ("éid", "e"), ("aid", ""), ("eid", ""), ("id", ""), ("jai", ""),
    ("jei", ""), ("ái", "a"), ("éi", "e"), ("ai", ""), ("ei", ""),
    ("i", ""), ("jaink", ""), ("jeink", ""), ("eink", ""), ("aink", ""),
    ("áink", "a"), ("éink", "e"), ("ink", ""), ("jaitok", ""),
    ("jeitek", ""), ("aitok", ""), ("eitek", ""), ("áitok", "a"),
    ("éitek", "e"), ("itek", ""), ("jeik", ""), ("jaik", ""),
    ("aik", ""), ("eik", ""), ("áik", "a"), ("éik", "e"), ("ik", ""),
]


@lru_cache(maxsize=1 << 17)
def stem_hu(word: str) -> str:
    w = word
    p1 = _r1(w)

    def r1_ok(suf: str) -> bool:
        return len(w) - len(suf) >= p1

    # instrum: al/el preceded by a double consonant
    m = _longest(w, [("al", ""), ("el", "")])
    if m is not None and r1_ok(m[0]) and _ends_double(w[: -len(m[0])]):
        w = _undouble(w[: -len(m[0])])

    # case + v_ending
    m = _longest(w, [(s, "") for s in _CASE])
    if m is not None and r1_ok(m[0]):
        w = w[: -len(m[0])]
        if w.endswith("á") and len(w) - 1 >= p1:
            w = w[:-1] + "a"
        elif w.endswith("é") and len(w) - 1 >= p1:
            w = w[:-1] + "e"

    # case_special / case_other / factive / owned / owners / plural
    for entries in (_CASE_SPECIAL, _CASE_OTHER):
        m = _longest(w, entries)
        if m is not None and r1_ok(m[0]):
            w = w[: -len(m[0])] + m[1]

    # factive: á/é preceded by a double consonant
    m = _longest(w, [("á", ""), ("é", "")])
    if m is not None and r1_ok(m[0]) and _ends_double(w[:-1]):
        w = _undouble(w[:-1])

    for entries in (_OWNED, _SING_OWNER, _PLUR_OWNER, _PLURAL):
        m = _longest(w, entries)
        if m is not None and r1_ok(m[0]):
            w = w[: -len(m[0])] + m[1]
    return w
