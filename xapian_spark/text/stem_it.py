"""Italian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Italian algorithm
(the same one the reference compiles from
`xapian-core/languages/italian.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/italian).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouàèìòù")
_ACUTE = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}
_AEIO = frozenset("aeioàèìò")

_PRONOUNS = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
    "mela", "mele", "meli", "melo", "mene",
    "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
)

_STD_G1 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti",
)
_VERB = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


def _prelude(word: str) -> str:
    # pass 1: acute -> grave, qu -> qU
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        c = word[i]
        if c in _ACUTE:
            out.append(_ACUTE[c])
            i += 1
        elif c == "q" and i + 1 < n and word[i + 1] == "u":
            out.append("qU")
            i += 2
        else:
            out.append(c)
            i += 1
    # pass 2: u/i between vowels -> U/I (goto rescans from the anchor,
    # same semantics as the French prelude)
    s = list("".join(out))
    i = 0
    while i < len(s):
        n2 = len(s)
        if s[i] in _V:
            if i + 2 < n2 and s[i + 1] == "u" and s[i + 2] in _V:
                s[i + 1] = "U"
                continue
            if i + 2 < n2 and s[i + 1] == "i" and s[i + 2] in _V:
                s[i + 1] = "I"
                continue
        i += 1
    return "".join(s)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = p1 = p2 = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    pv = j + 1
            else:
                j = 2
                while j < n and w[j] in _V:
                    j += 1
                if j < n:
                    pv = j + 1
        else:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    pv = j + 1
            else:
                if n >= 3:
                    pv = 3

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


def _longest(w: str, lim: int, *groups: tuple[str, ...]):
    best = None
    avail = len(w) - lim
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if len(s) <= avail and w.endswith(s):
                if best is None or len(s) > len(best[0]):
                    best = (s, gid)
    return best


def _standard_suffix(w: str, pv: int, p1: int, p2: int) -> tuple[str, bool]:
    m = _longest(
        w, 0, _STD_G1, ("azione", "azioni", "atore", "atori"),
        ("logia", "logie"), ("uzione", "uzioni", "usione", "usioni"),
        ("enza", "enze"), ("amento", "amenti", "imento", "imenti"),
        ("amente",), ("ità",), ("ivo", "ivi", "iva", "ive"),
    )
    if m is None:
        return w, False
    suf, gid = m
    start = len(w) - len(suf)
    if gid == 0:
        if start < p2:
            return w, False
        return w[:start], True
    if gid == 1:
        if start < p2:
            return w, False
        w = w[:start]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if gid == 2:
        if start < p2:
            return w, False
        return w[:start] + "log", True
    if gid == 3:
        if start < p2:
            return w, False
        return w[:start] + "u", True
    if gid == 4:
        if start < p2:
            return w, False
        return w[:start] + "ente", True
    if gid == 5:  # amento/amenti/imento/imenti: RV
        if start < pv:
            return w, False
        return w[:start], True
    if gid == 6:  # amente: R1
        if start < p1:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("iv",), ("os", "ic", "abil"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            s2, g2 = m2
            w = w[: -len(s2)]
            if g2 == 0 and w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        return w, True
    if gid == 7:  # ità
        if start < p2:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("abil", "ic", "iv"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            w = w[: -len(m2[0])]
        return w, True
    # ivo/ivi/iva/ive
    if start < p2:
        return w, False
    w = w[:start]
    if w.endswith("at") and len(w) - 2 >= p2:
        w = w[:-2]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
    return w, True


@lru_cache(maxsize=1 << 17)
def stem_it(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    # attached_pronoun
    m = _longest(w, 0, _PRONOUNS)
    if m is not None:
        base = w[: -len(m[0])]
        e = _longest(base, pv, ("ando", "endo"), ("ar", "er", "ir"))
        if e is not None:
            if e[1] == 0:
                w = base
            else:
                w = base + "e"

    w2, ok = _standard_suffix(w, pv, p1, p2)
    if ok:
        w = w2
    else:
        m = _longest(w, pv, _VERB)
        if m is not None:
            w = w[: -len(m[0])]

    # vowel_suffix
    if w and w[-1] in _AEIO and len(w) - 1 >= pv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= pv:
            w = w[:-1]
    # ['h'] CG RV delete: RV is tested after the cursor moved past the
    # c/g, so it is the C/G index that must lie in RV
    if (
        w.endswith("h")
        and len(w) >= 2
        and w[-2] in "cg"
        and len(w) - 2 >= pv
    ):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")
