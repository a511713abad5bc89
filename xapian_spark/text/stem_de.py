"""German Snowball stemmer (german2 variant), pure Python.

From-scratch implementation of the published Snowball german2 algorithm
(the variant the reference compiles from
`xapian-core/languages/german2.sbl`: ae/oe/ue fold to umlauts except
after q, ss for eszett), validated against the full public Snowball test
vocabulary (xapian-data/stemming/german2, 35033 pairs).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")  # s_ending - 'r'


def _prelude(word: str) -> str:
    # pass 1: u/y between vowels -> U/Y (protected from the ue fold and
    # from the vowel group during suffix checks)
    s = list(word)
    n = len(s)
    i = 1
    while i < n - 1:
        if s[i] in "uy" and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = s[i].upper()
            i += 2  # cursor lands past the trailing vowel of the pattern
            continue
        i += 1
    # pass 2: ß -> ss, ae/oe/ue -> umlauts, qu protected
    out: list[str] = []
    i = 0
    w = "".join(s)
    n = len(w)
    while i < n:
        c = w[i]
        if c == "ß":
            out.append("ss")
            i += 1
        elif c == "q" and i + 1 < n and w[i + 1] == "u":
            # 'qu' (hop 2): the match consumes qu, then hops 2 MORE chars,
            # so the two characters after qu escape the ae/oe/ue fold
            out.append(w[i : i + 4])
            i += 4
        elif c in "aou" and i + 1 < n and w[i + 1] == "e":
            out.append({"a": "ä", "o": "ö", "u": "ü"}[c])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    if n < 3:
        return p1, p2  # test(hop 3) fails -> regions stay at limit

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
            p1 = max(j, 3)  # p1 at least 3 (setmark x)
            j2 = gopast_v(j)
            if j2 is not None:
                j2 = gopast_nonv(j2)
                if j2 is not None:
                    p2 = j2
    return p1, p2


def _longest(w: str, *groups: tuple[str, ...]):
    best = None
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, gid)
    return best


def _prelude_plain(word: str) -> str:
    """Plain `german` prelude (german.sbl:34-45): ß -> ss and u/y marking
    only — no ae/oe/ue folding, no qu protection.  (ß/ss are not vowels,
    so the fold-vs-mark order difference from german2 cannot matter.)"""
    s = list(word.replace("ß", "ss"))
    n = len(s)
    i = 1
    while i < n - 1:
        if s[i] in "uy" and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = s[i].upper()
            i += 2
            continue
        i += 1
    return "".join(s)


@lru_cache(maxsize=1 << 17)
def stem_de(word: str) -> str:
    """Plain German Snowball (german.sbl; Xapian::Stem("de")): identical
    to german2 except for the prelude."""
    return _steps(_prelude_plain(word))


@lru_cache(maxsize=1 << 17)
def stem_de2(word: str) -> str:
    return _steps(_prelude(word))


def _steps(w: str) -> str:
    p1, p2 = _regions(w)

    # -- step 1 (R1) ------------------------------------------------------
    m = _longest(w, ("em", "ern", "er"), ("e", "en", "es"), ("s",))
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= p1:
            if gid == 0:
                w = w[:start]
            elif gid == 1:
                w = w[:start]
                # try(['s'] 'nis' delete): ...niss -> ...nis
                if w.endswith("niss"):
                    w = w[:-1]
            else:  # 's': preceding char must be an s_ending
                if start >= 1 and w[start - 1] in _S_ENDING:
                    w = w[:start]

    # -- step 2 (R1) ------------------------------------------------------
    m = _longest(w, ("en", "er", "est"), ("st",))
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= p1:
            if gid == 0:
                w = w[:start]
            else:  # 'st': st_ending before it, and >= 3 more chars before
                if start >= 4 and w[start - 1] in _ST_ENDING:
                    w = w[:start]

    # -- step 3 (R2) ------------------------------------------------------
    m = _longest(
        w, ("end", "ung"), ("ig", "ik", "isch"), ("lich", "heit"), ("keit",)
    )
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= p2:
            if gid == 0:
                w = w[:start]
                # try(['ig'] not 'e' R2 delete)
                if (
                    w.endswith("ig")
                    and len(w) - 2 >= p2
                    and not w[: -2].endswith("e")
                ):
                    w = w[:-2]
            elif gid == 1:
                if not w[:start].endswith("e"):
                    w = w[:start]
            elif gid == 2:
                w = w[:start]
                # try(['er' or 'en'] R1 delete)
                m2 = _longest(w, ("er", "en"))
                if m2 is not None and len(w) - len(m2[0]) >= p1:
                    w = w[: -len(m2[0])]
            else:  # keit
                w = w[:start]
                m2 = _longest(w, ("lich", "ig"))
                if m2 is not None and len(w) - len(m2[0]) >= p2:
                    w = w[: -len(m2[0])]

    # -- postlude ---------------------------------------------------------
    return (
        w.replace("Y", "y").replace("U", "u")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )
