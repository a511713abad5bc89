"""Dutch Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Dutch algorithm
(the same one the reference compiles from
`xapian-core/languages/dutch.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/dutch).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouyè")
_V_I = _V | {"I"}
_V_J = _V | {"j"}
_FOLD = {
    "ä": "a", "á": "a", "ë": "e", "é": "e", "ï": "i", "í": "i",
    "ö": "o", "ó": "o", "ü": "u", "ú": "u",
}


def _prelude(word: str) -> str:
    s = [(_FOLD.get(c, c)) for c in word]
    if s and s[0] == "y":
        s[0] = "Y"
    i = 0
    while i < len(s):
        n = len(s)
        if s[i] in _V:
            if i + 2 < n and s[i + 1] == "i" and s[i + 2] in _V:
                s[i + 1] = "I"
                continue
            if i + 1 < n and s[i + 1] == "y":
                s[i + 1] = "Y"
                continue
        i += 1
    return "".join(s)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n

    def gopast_v(j: int) -> int | None:
        while j < n and w[j] not in _V:
            j += 1
        return j + 1 if j < n else None

    def gopast_nonv(j: int) -> int | None:
        while j < n and w[j] in _V:
            j += 1
        return j + 1 if j < n else None

    j = gopast_v(0)
    if j is not None:
        j = gopast_nonv(j)
        if j is not None:
            p1 = max(j, 3)
            j2 = gopast_v(j)
            if j2 is not None:
                j2 = gopast_nonv(j2)
                if j2 is not None:
                    p2 = j2
    return p1, p2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


@lru_cache(maxsize=1 << 17)
def stem_nl(word: str) -> str:
    w = _prelude(word)
    p1, p2 = _regions(w)
    e_found = False

    def en_ending(w: str, suf_len: int) -> str:
        start = len(w) - suf_len
        if start < p1:
            return w
        if start < 1 or w[start - 1] in _V:
            return w
        if w[:start].endswith("gem"):
            return w
        return _undouble(w[:start])

    # step 1 — among: longest suffix wins; a failing condition does NOT
    # retry shorter suffixes ('heden' outside R1 must not strip 'en')
    best = None
    for s in ("heden", "ene", "en", "se", "s"):
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best == "heden":
        if len(w) - 5 >= p1:
            w = w[:-5] + "heid"
    elif best in ("ene", "en"):
        w = en_ending(w, len(best))
    elif best in ("se", "s"):
        start = len(w) - len(best)
        if start >= p1 and start >= 1 and w[start - 1] not in _V_J:
            w = w[:start]

    # step 2: e_ending
    if (
        w.endswith("e")
        and len(w) - 1 >= p1
        and len(w) >= 2
        and w[-2] not in _V
    ):
        w = _undouble(w[:-1])
        e_found = True

    # step 3a: heid (R2, not preceded by c), then en_ending
    if w.endswith("heid") and len(w) - 4 >= p2 and not w[:-4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            w = en_ending(w, 2)

    # step 3b: d-suffixes
    if w.endswith(("end", "ing")):
        start = len(w) - 3
        if start >= p2:
            w = w[:start]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and not w[:-2].endswith("e")
            ):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("ig"):
        start = len(w) - 2
        if start >= p2 and not w[:start].endswith("e"):
            w = w[:start]
    elif w.endswith("lijk"):
        start = len(w) - 4
        if start >= p2:
            w = w[:start]
            if (
                w.endswith("e")
                and len(w) - 1 >= p1
                and len(w) >= 2
                and w[-2] not in _V
            ):
                w = _undouble(w[:-1])
                e_found = True
    elif w.endswith("baar"):
        start = len(w) - 4
        if start >= p2:
            w = w[:start]
    elif w.endswith("bar"):
        start = len(w) - 3
        if start >= p2 and e_found:
            w = w[:start]

    # step 4: undouble vowel (...C vv C_end -> drop one vowel)
    if (
        len(w) >= 4
        and w[-1] not in _V_I
        and w[-3:-1] in ("aa", "ee", "oo", "uu")
        and w[-4] not in _V
    ):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")
