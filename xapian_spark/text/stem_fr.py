"""French Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball French algorithm
(the same algorithm the reference compiles from
`xapian-core/languages/french.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/french, 20805 pairs).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouyâàëéêèïîôûù")
_KEEP_WITH_S = frozenset("aiouès")


def _prelude(word: str) -> str:
    """Mark u/i between vowels as U/I, y next to a vowel as Y, u after q
    as U; ë -> He, ï -> Hi (french.sbl prelude)."""
    # `repeat goto(C)` semantics: goto leaves the cursor BEFORE the match,
    # so after a substitution the scan resumes at the same anchor — which
    # now fails (the bracketed char went uppercase/H) and advances one.
    # Net effect: overlapping patterns chain ("jouaient" -> "joUaIent").
    s = list(word)
    i = 0
    while i < len(s):
        n = len(s)
        c = s[i]
        if c in _V:
            if i + 2 < n and s[i + 1] == "u" and s[i + 2] in _V:
                s[i + 1] = "U"
                continue
            if i + 2 < n and s[i + 1] == "i" and s[i + 2] in _V:
                s[i + 1] = "I"
                continue
            if i + 1 < n and s[i + 1] == "y":
                s[i + 1] = "Y"
                continue
        if c == "ë":
            s[i : i + 1] = ["H", "e"]
            continue
        if c == "ï":
            s[i : i + 1] = ["H", "i"]
            continue
        if c == "y" and i + 1 < n and s[i + 1] in _V:
            s[i] = "Y"
            continue
        if c == "q" and i + 1 < n and s[i + 1] == "u":
            s[i + 1] = "U"
            continue
        i += 1
    return "".join(s)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = p1 = p2 = n
    if n >= 3 and w[0] in _V and w[1] in _V:
        pv = 3
    elif w[:3] in ("par", "col", "tap"):
        pv = 3
    else:
        j = 1
        while j < n and w[j] not in _V:
            j += 1
        if j < n:
            pv = j + 1

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
            p1 = j
            j = gopast_v(j)
            if j is not None:
                j = gopast_nonv(j)
                if j is not None:
                    p2 = j
    return pv, p1, p2


# (suffixes, action id); one among — longest suffix match wins
_STD_GROUPS: list[tuple[tuple[str, ...], str]] = [
    (("ance", "iqUe", "isme", "able", "iste", "eux",
      "ances", "iqUes", "ismes", "ables", "istes"), "r2del"),
    (("atrice", "ateur", "ation", "atrices", "ateurs", "ations"), "at"),
    (("logie", "logies"), "log"),
    (("usion", "ution", "usions", "utions"), "u"),
    (("ence", "ences"), "ent"),
    (("ement", "ements"), "ement"),
    (("ité", "ités"), "ite"),
    (("if", "ive", "ifs", "ives"), "ifive"),
    (("eaux",), "eaux"),
    (("aux",), "aux"),
    (("euse", "euses"), "euse"),
    (("issement", "issements"), "issement"),
    (("amment",), "amment"),
    (("emment",), "emment"),
    (("ment", "ments"), "ment"),
]

_I_VERB = (
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it",
)

_VERB_1 = ("ions",)
_VERB_2 = (
    "é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
    "erais", "erait", "eras", "erez", "eriez", "erions", "erons", "eront",
    "ez", "iez",
)
_VERB_3 = (
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
    "antes", "ants", "as", "asse", "assent", "asses", "assiez", "assions",
)


def _longest(w: str, lim: int, *groups):
    best = None
    avail = len(w) - lim
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


def _standard_suffix(w: str, pv: int, p1: int, p2: int) -> tuple[str, bool]:
    """-> (new_word, success).  amment/emment/ment(s) modify the word and
    then deliberately FAIL so the verb suffix steps run on the result
    (french.sbl: fail(...) 'forces entry to verb_suffix')."""
    best = None
    for sufs, act in _STD_GROUPS:
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, act)
    if best is None:
        return w, False
    suf, act = best
    start = len(w) - len(suf)

    if act == "r2del":
        if start < p2:
            return w, False
        return w[:start], True

    if act == "at":
        if start < p2:
            return w, False
        w = w[:start]
        if w.endswith("ic"):
            if len(w) - 2 >= p2:
                w = w[:-2]
            else:
                w = w[:-2] + "iqU"
        return w, True

    if act == "log":
        if start < p2:
            return w, False
        return w[:start] + "log", True

    if act == "u":
        if start < p2:
            return w, False
        return w[:start] + "u", True

    if act == "ent":
        if start < p2:
            return w, False
        return w[:start] + "ent", True

    if act == "ement":
        if start < pv:
            return w, False
        w = w[:start]
        m = _longest(w, 0, ("iv",), ("eus",), ("abl", "iqU"),
                     ("ièr", "Ièr"))
        if m is not None:
            s2, g2 = m
            st2 = len(w) - len(s2)
            if g2 == 0:      # iv: R2 delete, then [at] R2 delete
                if st2 >= p2:
                    w = w[:st2]
                    if w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
            elif g2 == 1:    # eus: R2 delete or R1 <- eux
                if st2 >= p2:
                    w = w[:st2]
                elif st2 >= p1:
                    w = w[:st2] + "eux"
            elif g2 == 2:    # abl / iqU: R2 delete
                if st2 >= p2:
                    w = w[:st2]
            else:            # ièr / Ièr: RV <- i
                if st2 >= pv:
                    w = w[:st2] + "i"
        return w, True

    if act == "ite":
        if start < p2:
            return w, False
        w = w[:start]
        m = _longest(w, 0, ("abil",), ("ic",), ("iv",))
        if m is not None:
            s2, g2 = m
            st2 = len(w) - len(s2)
            if g2 == 0:
                w = w[:st2] if st2 >= p2 else w[:st2] + "abl"
            elif g2 == 1:
                w = w[:st2] if st2 >= p2 else w[:st2] + "iqU"
            else:
                if st2 >= p2:
                    w = w[:st2]
        return w, True

    if act == "ifive":
        if start < p2:
            return w, False
        w = w[:start]
        # try([at] R2 delete [ic] (R2 delete) or <- iqU)
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("ic"):
                if len(w) - 2 >= p2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        return w, True

    if act == "eaux":
        return w[:start] + "eau", True

    if act == "aux":
        if start < p1:
            return w, False
        return w[:start] + "al", True

    if act == "euse":
        if start >= p2:
            return w[:start], True
        if start >= p1:
            return w[:start] + "eux", True
        return w, False

    if act == "issement":
        if start >= p1 and start >= 1 and w[start - 1] not in _V:
            return w[:start], True
        return w, False

    if act == "amment":
        if start < pv:
            return w, False
        return w[:start] + "ant", False  # modify then FAIL

    if act == "emment":
        if start < pv:
            return w, False
        return w[:start] + "ent", False  # modify then FAIL

    if act == "ment":
        # test(v RV): char before suffix is a vowel within RV
        if start >= 1 and w[start - 1] in _V and start - 1 >= pv:
            return w[:start], False      # delete then FAIL
        return w, False

    return w, False


@lru_cache(maxsize=1 << 17)
def stem_fr(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    done = False
    w2, ok = _standard_suffix(w, pv, p1, p2)
    w = w2
    if ok:
        done = True
    else:
        m = _longest(w, pv, _I_VERB)
        if (
            m is not None
            and len(w) - len(m[0]) - 1 >= pv
            and w[len(w) - len(m[0]) - 1] not in _V
            and w[len(w) - len(m[0]) - 1] != "H"
        ):
            w = w[: -len(m[0])]
            done = True
        else:
            m = _longest(w, pv, _VERB_1, _VERB_2, _VERB_3)
            if m is not None:
                suf, gid = m
                start = len(w) - len(suf)
                if gid == 0:
                    if start >= p2:
                        w = w[:start]
                        done = True
                elif gid == 1:
                    w = w[:start]
                    done = True
                else:
                    w = w[:start]
                    if w.endswith("e") and len(w) - 1 >= pv:
                        w = w[:-1]
                    done = True
    if done:
        # try([Y] <- i or [ç] <- c)
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual_suffix
        if (
            w.endswith("s")
            and len(w) >= 2
            and (w[:-1].endswith("Hi") or w[-2] not in _KEEP_WITH_S)
        ):
            w = w[:-1]
        m = _longest(w, pv, ("ion",), ("ier", "ière", "Ier", "Ière"),
                     ("e",))
        if m is not None:
            suf, gid = m
            start = len(w) - len(suf)
            if gid == 0:
                if start >= p2 and start >= 1 and w[start - 1] in "st" \
                        and start - 1 >= pv:
                    w = w[:start]
            elif gid == 1:
                w = w[:start] + "i"
            else:
                w = w[:start]

    # un_double
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # un_accent: é/è followed by >= 1 trailing non-vowels -> e
    j = len(w)
    while j > 0 and w[j - 1] not in _V:
        j -= 1
    if j < len(w) and j > 0 and w[j - 1] in "éè":
        w = w[: j - 1] + "e" + w[j:]

    # postlude
    out: list[str] = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        if c == "I":
            out.append("i")
        elif c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "H":
            if i + 1 < n and w[i + 1] == "e":
                out.append("ë")
                i += 2
                continue
            if i + 1 < n and w[i + 1] == "i":
                out.append("ï")
                i += 2
                continue
            # bare H deleted
        else:
            out.append(c)
        i += 1
    return "".join(out)
