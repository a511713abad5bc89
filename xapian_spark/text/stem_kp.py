"""Kraaij-Pohlmann Dutch stemmer, pure Python.

From-scratch implementation of the published Snowball Kraaij-Pohlmann
algorithm (the same one the reference compiles from
`xapian-core/languages/kraaij_pohlmann.sbl`), validated against the full
public Snowball test vocabulary (xapian-data/stemming/kraaij_pohlmann).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouy")
_V_WX = frozenset("aeiouywx")
_AOU = frozenset("aou")
_AIOU = frozenset("aiou")


def _measure(w: str) -> tuple[int, int]:
    """p1/p2: after (non-v)* (ij|v)+ non-v, twice.  'ij' counts as one
    vowel unit; the marked 'Y' is NOT a vowel here."""
    n = len(w)

    def one(j: int) -> int | None:
        while j < n and w[j] not in _V:
            j += 1
        count = 0
        while j < n:
            if w.startswith("ij", j):
                j += 2
                count += 1
            elif w[j] in _V:
                j += 1
                count += 1
            else:
                break
        if count < 1:
            return None
        if j < n and w[j] not in _V:
            return j + 1
        return None

    p1 = p2 = n
    j = one(0)
    if j is not None:
        p1 = j
        j = one(j)
        if j is not None:
            p2 = j
    return p1, p2


def _is_C(w: str, pos: int) -> bool:
    """C at cursor pos: not preceded by 'ij', and preceding char non-v."""
    if pos < 1:
        return False
    if pos >= 2 and w[pos - 2 : pos] == "ij":
        return False
    return w[pos - 1] not in _V


def _is_V(w: str, pos: int) -> bool:
    """V at cursor pos: preceded by a vowel or by 'ij'."""
    if pos >= 1 and w[pos - 1] in _V:
        return True
    return pos >= 2 and w[pos - 2 : pos] == "ij"


def _lengthen_V(w: str) -> str:
    """Double the vowel before a final consonant (Dutch lengthening):
    ...C a|o|u C_end -> ...C aa|oo|uu C_end; 'e' only under the extra
    guards from the sbl (no preceding aiou, no aiou+non-v two back)."""
    n = len(w)
    if n < 2 or w[-1] in _V_WX:
        return w
    c = w[-2]
    if c in _AOU:
        if n == 2 or w[-3] not in _V:
            return w[:-2] + c + c + w[-1]
        return w
    if c == "e":
        # the guard's non-v CONSUMES a char, so the later checks shift
        # one further left: with s = word minus final C and the e,
        # require (s ends non-v or s empty), s[-2] not in aiou, and NOT
        # (s[-3] in aiou with s[-4] a non-vowel)
        s = w[:-2]
        if s and s[-1] in _V:
            return w
        if len(s) >= 2 and s[-2] in _AIOU:
            return w
        if (
            len(s) >= 4
            and s[-3] in _AIOU
            and s[-4] not in _V
        ):
            return w
        return w[:-2] + "ee" + w[-1]
    return w


@lru_cache(maxsize=1 << 17)
def stem_kp(word: str) -> str:
    w = word
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

    p1, p2 = _measure(w)
    stemmed = False

    def R1(pos: int) -> bool:
        return pos >= p1

    # ---- Step 1 ----------------------------------------------------------
    n = len(w)
    if w.endswith("'s"):
        w = w[:-2]
        stemmed = True
    elif w.endswith("ies"):
        if R1(len(w) - 3):
            w = w[:-1]  # ies -> ie
            stemmed = True
    elif w.endswith("aus"):
        if R1(len(w) - 3) and _is_V(w, len(w) - 3):
            w = w[:-1]  # aus -> au
            stemmed = True
    elif w.endswith("nde"):
        w = w[:-1]  # nde -> nd
        stemmed = True
    elif w.endswith("es"):
        start = len(w) - 2
        if w.endswith("ares") and R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = _lengthen_V(w[:-4])
            stemmed = True
        elif w.endswith("eres") and R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = w[:-4]
            stemmed = True
        elif R1(start) and _is_C(w, start):
            w = w[:-1]  # es -> e
            stemmed = True
    elif w.endswith("en"):
        start = len(w) - 2
        if w.endswith("heden") and R1(len(w) - 5):
            w = w[:-5] + "heid"
            stemmed = True
        elif w.endswith("nden"):
            w = w[:-2]  # preceded by nd: delete 'en'
            stemmed = True
        elif w.endswith("den") and R1(len(w) - 3) and _is_C(w, len(w) - 3):
            w = w[:-3]
            stemmed = True
        elif (
            (w[:start].endswith("i") or w[:start].endswith("j"))
            and _is_V(w, start - 1)
        ):
            w = w[:start]
            stemmed = True
        elif R1(start) and _is_C(w, start):
            w = _lengthen_V(w[:start])
            stemmed = True
    elif w.endswith("s"):
        start = len(w) - 1
        if (
            R1(start)
            and not (w[:start].endswith("t") and R1(start - 1))
            and _is_C(w, start)
        ):
            w = w[:start]
            stemmed = True

    # ---- Step 2 ----------------------------------------------------------
    if w.endswith("je"):
        ok = True
        if w.endswith("'tje"):
            w = w[:-4]
        elif w.endswith("etje") and R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = w[:-4]
        elif w.endswith("rntje"):
            w = w[:-5] + "rn"
        elif w.endswith("tje") and R1(len(w) - 3) and (
            _is_V(w, len(w) - 4) if len(w) >= 4 else False
        ):
            w = w[:-3]
        elif w.endswith("inkje"):
            w = w[:-5] + "ing"
        elif w.endswith("mpje"):
            w = w[:-4] + "m"
        elif w.endswith("'je") and R1(len(w) - 3):
            w = w[:-3]
        elif R1(len(w) - 2) and _is_C(w, len(w) - 2):
            w = w[:-2]
        else:
            ok = False
        if ok:
            stemmed = True
    elif w.endswith("lijke"):
        if R1(len(w) - 5):
            w = w[:-1]
            stemmed = True
    elif w.endswith("ische"):
        if R1(len(w) - 5):
            w = w[:-1]
            stemmed = True
    elif w.endswith("ene"):
        # attach leaves the cursor right of the inserted text, so
        # lengthen_V operates on base + attached suffix
        start = len(w) - 3
        if R1(start) and _is_C(w, start):
            w = _lengthen_V(w[:start] + "en")
            stemmed = True
    elif w.endswith("ieve"):
        if R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = w[:-4] + "ief"
            stemmed = True
    elif w.endswith("ge"):
        if R1(len(w) - 2):
            w = w[:-1]
            stemmed = True
    elif w.endswith("de"):
        if R1(len(w) - 2) and _is_C(w, len(w) - 2):
            w = w[:-2]
            stemmed = True
    elif w.endswith("te"):
        if R1(len(w) - 2):
            w = w[:-1]
            stemmed = True
    elif w.endswith("se"):
        if R1(len(w) - 2):
            w = w[:-1]
            stemmed = True
    elif w.endswith("re"):
        if R1(len(w) - 2):
            w = w[:-1]
            stemmed = True
    elif w.endswith("le"):
        start = len(w) - 2
        if R1(start):
            w = _lengthen_V(w[:start] + "l")
            stemmed = True

    # ---- Step 3 ----------------------------------------------------------
    if w.endswith("atie"):
        if R1(len(w) - 4):
            w = w[:-4] + "eer"
            stemmed = True
    elif w.endswith("iteit"):
        if R1(len(w) - 5):
            w = _lengthen_V(w[:-5])
            stemmed = True
    elif w.endswith(("heid", "ster")):
        if R1(len(w) - 4):
            w = w[:-4]
            stemmed = True
    elif w.endswith("sel"):
        if R1(len(w) - 3):
            w = w[:-3]
            stemmed = True
    elif w.endswith("rder"):
        w = w[:-4] + "r"
        stemmed = True
    elif w.endswith("isme"):
        if R1(len(w) - 4):
            w = _lengthen_V(w[:-4])
            stemmed = True
    elif w.endswith("erij"):
        if R1(len(w) - 4):
            w = _lengthen_V(w[:-4])
            stemmed = True
    elif w.endswith("arij"):
        if R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = w[:-4] + "aar"
            stemmed = True
    elif w.endswith("ing"):
        if R1(len(w) - 3):
            w = _lengthen_V(w[:-3])
            stemmed = True
    elif w.endswith("fie"):
        if len(w) - 3 >= p2:
            w = _lengthen_V(w[:-3] + "f")
            stemmed = True
    elif w.endswith("gie"):
        if len(w) - 3 >= p2:
            w = _lengthen_V(w[:-3] + "g")
            stemmed = True
    elif w.endswith("tst"):
        if R1(len(w) - 3) and _is_C(w, len(w) - 3):
            w = w[:-2]
            stemmed = True
    elif w.endswith("dst"):
        if R1(len(w) - 3) and _is_C(w, len(w) - 3):
            w = w[:-2]
            stemmed = True

    # ---- Step 4 ----------------------------------------------------------
    did4 = False
    if w.endswith("ioneel"):
        if R1(len(w) - 6):
            w = w[:-6] + "ie"
            did4 = True
    elif w.endswith("atief"):
        if R1(len(w) - 5):
            w = w[:-5] + "eer"
            did4 = True
    elif w.endswith("baar"):
        if R1(len(w) - 4):
            w = w[:-4]
            did4 = True
    elif w.endswith("naar"):
        if R1(len(w) - 4) and _is_V(w, len(w) - 4):
            w = w[:-4] + "n"
            did4 = True
    elif w.endswith("laar"):
        if R1(len(w) - 4) and _is_V(w, len(w) - 4):
            w = w[:-4] + "l"
            did4 = True
    elif w.endswith("raar"):
        if R1(len(w) - 4) and _is_V(w, len(w) - 4):
            w = w[:-4] + "r"
            did4 = True
    elif w.endswith("tant"):
        if R1(len(w) - 4):
            w = w[:-4] + "teer"
            did4 = True
    elif w.endswith(("lijker", "lijkst")):
        if R1(len(w) - 6):
            w = w[:-2]
            did4 = True
    elif w.endswith(("achtiger", "achtigst")):
        if R1(len(w) - 8):
            w = w[:-8]
            did4 = True
    elif w.endswith("achtig"):
        if R1(len(w) - 6):
            w = w[:-6]
            did4 = True
    elif w.endswith(("eriger", "erigst")):
        if R1(len(w) - 6) and _is_C(w, len(w) - 6):
            w = _lengthen_V(w[:-6])
            did4 = True
    elif w.endswith("erig"):
        if R1(len(w) - 4) and _is_C(w, len(w) - 4):
            w = _lengthen_V(w[:-4])
            did4 = True
    elif w.endswith("end"):
        if R1(len(w) - 3) and _is_C(w, len(w) - 3):
            w = _lengthen_V(w[:-3])
            did4 = True
    if not did4:
        if w.endswith(("iger", "igst")):
            if R1(len(w) - 4) and _is_C(w, len(w) - 4):
                w = _lengthen_V(w[:-4])
                did4 = True
        elif w.endswith("ig"):
            if R1(len(w) - 2) and _is_C(w, len(w) - 2):
                w = _lengthen_V(w[:-2])
                did4 = True
    if did4:
        stemmed = True

    # ---- Lose_prefix / Lose_infix + Step_1c ------------------------------
    def has_v_nonv(s: str, start: int) -> bool:
        j = start
        n2 = len(s)
        while j < n2 and s[j] not in _V:
            j += 1
        while j < n2 and s[j] in _V:
            j += 1
        return j < n2  # a non-vowel follows a vowel

    def step_1c(s: str) -> str:
        if s.endswith("d") and R1c(s, len(s) - 1) and _is_C(s, len(s) - 1):
            if not (s[:-1].endswith("n") and R1c(s, len(s) - 2)):
                return s[:-1]
        elif s.endswith("t") and R1c(s, len(s) - 1) and _is_C(s, len(s) - 1):
            if not (s[:-1].endswith("h") and R1c(s, len(s) - 2)):
                return s[:-1]
        return s

    ge_removed = False
    if w.startswith("ge") and len(w) >= 5 and has_v_nonv(w, 2):
        w = w[2:]
        ge_removed = True
        p1, p2 = _measure(w)
    if ge_removed:
        cur_p1 = p1

        def R1c(s, pos):
            return pos >= cur_p1

        w = step_1c(w)

    ge_removed = False
    idx = w.find("ge", 1)
    if idx > 0 and len(w) - (idx + 2) >= 3 and has_v_nonv(w, idx + 2):
        w = w[:idx] + w[idx + 2:]
        ge_removed = True
        p1, p2 = _measure(w)
    if ge_removed:
        cur_p1 = p1

        def R1c(s, pos):  # noqa: F811
            return pos >= cur_p1

        w = step_1c(w)

    # ---- Step 7 / Step 6 --------------------------------------------------
    if w.endswith("kt"):
        w = w[:-2] + "k"
        stemmed = True
    elif w.endswith("ft"):
        w = w[:-2] + "f"
        stemmed = True
    elif w.endswith("pt"):
        w = w[:-2] + "p"
        stemmed = True
    if stemmed or ge_removed:
        if len(w) >= 2 and w[-1] == w[-2] and w[-1] in "bcdfghjklmnpqrstvwxz":
            w = w[:-1]
        elif w.endswith("v"):
            w = w[:-1] + "f"
        elif w.endswith("z"):
            w = w[:-1] + "s"

    if y_found:
        w = w.replace("Y", "y")
    return w
