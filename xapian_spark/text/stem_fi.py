"""Finnish Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Finnish algorithm
(the same one the reference compiles from
`xapian-core/languages/finnish.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/finnish).
"""

from __future__ import annotations

from functools import lru_cache

_AEI = frozenset("aäei")
_C = frozenset("bcdfghjklmnpqrstvwxz")
_V1 = frozenset("aeiouyäö")
_V2 = frozenset("aeiouäö")
_PARTICLE_END = _V1 | {"n", "t"}
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def _regions(w: str) -> tuple[int, int]:
    n = len(w)

    def next_region(j: int) -> int | None:
        # goto V1 (position before first V1 at or after j), gopast non-V1
        while j < n and w[j] not in _V1:
            j += 1
        while j < n and w[j] in _V1:
            j += 1
        return j + 1 if j < n else None

    p1 = p2 = n
    j = next_region(0)
    if j is not None:
        p1 = j
        j = next_region(j)
        if j is not None:
            p2 = j
    return p1, p2


def _longest(w: str, lim: int, *groups):
    return _longest_excl(w, lim, frozenset(), *groups)


def _longest_excl(w: str, lim: int, excluded, *groups):
    best = None
    avail = len(w) - lim
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if s in excluded:
                continue
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


@lru_cache(maxsize=1 << 17)
def stem_fi(word: str) -> str:
    w = word
    p1, p2 = _regions(w)
    ending_removed = False

    # -- particle_etc -------------------------------------------------------
    m = _longest(
        w, p1,
        ("kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä"),
        ("sti",),
    )
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if gid == 0:
            if start >= 1 and w[start - 1] in _PARTICLE_END:
                w = w[:start]
        else:
            if start >= p2:
                w = w[:start]

    # -- possessive ---------------------------------------------------------
    m = _longest(
        w, p1,
        ("si",), ("ni",), ("nsa", "nsä", "mme", "nne"),
        ("an",), ("än",), ("en",),
    )
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if gid == 0:
            if not w[:start].endswith("k"):
                w = w[:start]
        elif gid == 1:
            w = w[:start]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif gid == 2:
            w = w[:start]
        elif gid == 3:
            if w[:start].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = w[:start]
        elif gid == 4:
            if w[:start].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = w[:start]
        else:
            if w[:start].endswith(("lle", "ine")):
                w = w[:start]

    # -- case_ending --------------------------------------------------------
    # siin/seen/den/tten carry ROUTINE conditions (VI/LONG): on failure
    # the among retries the remaining strings; the parenthesized action
    # conditions (h-forms, a/ä, tta/ttä) fail the among outright.
    _H = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hän": "ä",
          "hön": "ö"}
    excluded: set[str] = set()
    while True:
        m = _longest_excl(
            w, p1, excluded,
            tuple(_H), ("siin", "den", "tten"), ("seen",), ("n",),
            ("a", "ä"), ("tta", "ttä"),
            ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta",
             "ltä", "lle", "na", "nä", "ksi", "ine"),
        )
        if m is None:
            break
        suf, gid = m
        start = len(w) - len(suf)
        ok = False
        extra = 0
        base = w[:start]
        if gid == 0:
            ok = base.endswith(_H[suf])
        elif gid == 1:  # VI: ...V2 i before the suffix (routine: retry)
            ok = (
                len(base) >= 2 and base[-1] == "i" and base[-2] in _V2
            )
            if not ok:
                excluded.add(suf)
                continue
        elif gid == 2:  # LONG before (routine: retry)
            ok = base.endswith(_LONG)
            if not ok:
                excluded.add(suf)
                continue
        elif gid == 3:  # 'n': genitive/illative; LONG/'ie' eats one char
            ok = True
            if base.endswith(_LONG) or base.endswith("ie"):
                extra = 1
        elif gid == 4:  # a/ä: preceded by V1 preceded by C
            ok = (
                len(base) >= 2 and base[-1] in _V1 and base[-2] in _C
            )
        elif gid == 5:  # tta/ttä: preceded by e
            ok = base.endswith("e")
        else:
            ok = True
        if ok:
            w = w[: start - extra]
            ending_removed = True
        break

    # -- other_endings (R2) -------------------------------------------------
    m = _longest(
        w, p2,
        ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"),
        ("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä"),
    )
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if gid == 1 or not w[:start].endswith("po"):
            w = w[:start]

    # -- i_plural / t_plural ------------------------------------------------
    if ending_removed:
        m = _longest(w, p1, ("i", "j"))
        if m is not None:
            w = w[:-1]
    else:
        if (
            w.endswith("t") and len(w) - 1 >= p1
            and len(w) >= 2 and w[-2] in _V1
        ):
            w = w[:-1]
            m = _longest(w, p2, ("mma",), ("imma",))
            if m is not None:
                suf, gid = m
                start = len(w) - len(suf)
                if gid == 1 or not w[:start].endswith("po"):
                    w = w[:start]

    # -- tidy (condition chars also lie within the p1 limit) ---------------
    if len(w) - 2 >= p1 and w.endswith(_LONG):
        w = w[:-1]
    if (
        len(w) - 2 >= p1 and w and w[-1] in _AEI
        and len(w) >= 2 and w[-2] in _C
    ):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith("jo"):
        w = w[:-1]
    # undouble the rightmost consonant (no region limit): find the
    # rightmost non-V1 char; if it is a C equal to the char before it,
    # drop it
    i = len(w) - 1
    while i >= 0 and w[i] in _V1:
        i -= 1
    if i >= 1 and w[i] in _C and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w
