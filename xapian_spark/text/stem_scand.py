"""Danish, Norwegian, Swedish Snowball stemmers, pure Python.

From-scratch implementations of the published Snowball algorithms (the
same ones the reference compiles from `xapian-core/languages/danish.sbl`,
`norwegian.sbl`, `swedish.sbl`), validated against the full public
Snowball vocabularies (xapian-data/stemming/{danish,norwegian,swedish}).

All three share the region scheme: R1 = after the first non-vowel that
follows a vowel, but never before position 3 (and unset for words shorter
than 3 chars).
"""

from __future__ import annotations

from functools import lru_cache

_DA_V = frozenset("aeiouyæåø")
_DA_C = frozenset("bcdfghjklmnpqrstvwxz")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")

_NO_V = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")

_SV_V = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")


def _r1(w: str, vowels: frozenset[str]) -> int:
    n = len(w)
    if n < 3:
        return n  # test(hop 3) fails -> R1 stays at limit
    # goto v (cursor before first vowel), gopast non-v
    j = 0
    while j < n and w[j] not in vowels:
        j += 1
    while j < n and w[j] in vowels:
        j += 1
    if j >= n:
        return n
    return max(j + 1, 3)


def _longest_in_r1(w: str, p1: int, *groups: tuple[str, ...]):
    """among with setlimit tomark p1 for [substring]: the whole suffix
    must start at index >= p1; longest match wins, conditions after."""
    best = None
    avail = len(w) - p1
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


# -- Danish ------------------------------------------------------------------

_DA_MAIN = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret",
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")


def _da_consonant_pair(w: str, p1: int) -> str:
    m = _longest_in_r1(w, p1, _DA_PAIRS)
    if m is not None:
        return w[:-1]
    return w


@lru_cache(maxsize=1 << 17)
def stem_da(word: str) -> str:
    w = word
    p1 = _r1(w, _DA_V)

    # main_suffix
    m = _longest_in_r1(w, p1, _DA_MAIN, ("s",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
        else:  # 's': preceded by an s_ending char (no region limit)
            if len(w) >= 2 and w[-2] in _DA_S_END:
                w = w[:-1]

    # consonant_pair
    w = _da_consonant_pair(w, p1)

    # other_suffix
    if w.endswith("igst"):
        w = w[:-2]  # ['st'] 'ig' delete (unlimited)
    m = _longest_in_r1(w, p1, ("ig", "lig", "elig", "els"), ("løst",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
            w = _da_consonant_pair(w, p1)
        else:
            w = w[:-1]  # løst -> løs

    # undouble: double consonant with the final one in R1
    if (
        len(w) >= 2
        and w[-1] in _DA_C
        and w[-2] == w[-1]
        and len(w) - 1 >= p1
    ):
        w = w[:-1]
    return w


# -- Norwegian ---------------------------------------------------------------

_NO_MAIN = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_NO_OTHER = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


@lru_cache(maxsize=1 << 17)
def stem_no(word: str) -> str:
    w = word
    p1 = _r1(w, _NO_V)

    m = _longest_in_r1(w, p1, _NO_MAIN, ("s",), ("erte", "ert"))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
        elif gid == 1:
            # s_ending, or 'k' preceded by a non-vowel (no region limit)
            ok = len(w) >= 2 and w[-2] in _NO_S_END
            if not ok and len(w) >= 3 and w[-2] == "k" and w[-3] not in _NO_V:
                ok = True
            if ok:
                w = w[:-1]
        else:
            w = w[: -len(suf)] + "er"  # erte/ert -> er

    # consonant_pair: dt/vt in R1 -> drop last char
    if _longest_in_r1(w, p1, ("dt", "vt")) is not None:
        w = w[:-1]

    m = _longest_in_r1(w, p1, _NO_OTHER)
    if m is not None:
        w = w[: -len(m[0])]
    return w


# -- Swedish -----------------------------------------------------------------

_SV_MAIN = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast",
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


@lru_cache(maxsize=1 << 17)
def stem_sv(word: str) -> str:
    w = word
    p1 = _r1(w, _SV_V)

    m = _longest_in_r1(w, p1, _SV_MAIN, ("s",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
        else:
            if len(w) >= 2 and w[-2] in _SV_S_END:
                w = w[:-1]

    if _longest_in_r1(w, p1, _SV_PAIRS) is not None:
        w = w[:-1]

    m = _longest_in_r1(w, p1, ("lig", "ig", "els"), ("löst",), ("fullt",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            w = w[: -len(suf)]
        elif gid == 1:
            w = w[:-1]  # löst -> lös
        else:
            w = w[:-1]  # fullt -> full
    return w
