"""Classic Porter stemmer (1980) and the earlyenglish variant, pure
Python.

From-scratch implementations of the published Snowball `porter` and
`earlyenglish` algorithms (the ones the reference compiles from
`xapian-core/languages/porter.sbl` / `earlyenglish.sbl` — earlyenglish
additionally strips -est/-eth), validated against the full public
Snowball porter vocabulary (xapian-data/stemming/porter).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouy")
_V_WXY = frozenset("aeiouywxY")

_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("ousli", "ous"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("iviti", "ive"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("alli", "al"), ("ator", "ate"), ("eli", "e"),
]
_STEP3 = [
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic", "ou",
)
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _shortv(w: str, end: int) -> bool:
    """shortv with the backward cursor at index `end` (exclusive)."""
    return (
        end >= 3
        and w[end - 1] not in _V_WXY
        and w[end - 2] in _V
        and w[end - 3] not in _V
    )


def _stem(word: str, early: bool) -> str:
    w = word
    # prelude: initial y and y-after-vowel -> Y
    y_found = False
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    n = len(w)
    p1 = p2 = n
    j = 0
    while j < n and w[j] not in _V:
        j += 1
    if j < n:
        j += 1
        while j < n and w[j] in _V:
            j += 1
        if j < n:
            p1 = j + 1
            j = p1
            while j < n and w[j] not in _V:
                j += 1
            if j < n:
                j += 1
                while j < n and w[j] in _V:
                    j += 1
                if j < n:
                    p2 = j + 1

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    sufs_1b = ("eed", "ed", "est", "eth", "ing") if early \
        else ("eed", "ed", "ing")
    m = None
    for s in sorted(sufs_1b, key=len, reverse=True):
        if w.endswith(s):
            m = s
            break
    if m == "eed":
        if len(w) - 3 >= p1:
            w = w[:-1]
    elif m is not None:
        pre = w[: -len(m)]
        if any(c in _V for c in pre):
            w = pre
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif len(w) == p1 and _shortv(w, len(w)):
                w += "e"

    # Step 1c: final y/Y with a vowel before it -> i
    if w and w[-1] in "yY" and any(c in _V for c in w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (R1)
    best = None
    for s, rep in _STEP2:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best is not None and len(w) - len(best[0]) >= p1:
        w = w[: -len(best[0])] + best[1]

    # Step 3 (R1)
    best = None
    for s, rep in _STEP3:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best is not None and len(w) - len(best[0]) >= p1:
        w = w[: -len(best[0])] + best[1]

    # Step 4 (R2)
    best = None
    for s in _STEP4:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best is not None and len(w) - len(best) >= p2:
        if best == "ion":
            if len(w) - len(best) >= 1 and w[-4] in "st":
                w = w[:-3]
        else:
            w = w[: -len(best)]

    # Step 5a
    if w.endswith("e"):
        start = len(w) - 1
        if start >= p2 or (start >= p1 and not _shortv(w, start)):
            w = w[:-1]

    # Step 5b
    if w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


@lru_cache(maxsize=1 << 17)
def stem_porter(word: str) -> str:
    return _stem(word, early=False)


@lru_cache(maxsize=1 << 17)
def stem_earlyenglish(word: str) -> str:
    return _stem(word, early=True)
