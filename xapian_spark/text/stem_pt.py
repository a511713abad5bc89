"""Portuguese Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Portuguese
algorithm (the same one the reference compiles from
`xapian-core/languages/portuguese.sbl`), validated against the full
public Snowball test vocabulary (xapian-data/stemming/portuguese).

The prelude marks nasal vowels as two-char sequences (ã -> "a~",
õ -> "o~") so they count as vowel + non-vowel for region marking; all
suffix tables below are in that marked form; the postlude restores them.
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouáéíóúâêô")

_STD_G1 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
    "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
    "amentos", "imento", "imentos", "adora", "ador", "aça~o", "adoras",
    "adores", "aço~es", "ante", "antes", "ância",
)
_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
    "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
    "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis", "áreis",
    "areis", "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis",
    "ísseis", "áveis", "ados", "idos", "ámos", "amos", "íamos",
    "aríamos", "eríamos", "iríamos", "áramos", "éramos", "íramos",
    "ávamos", "emos", "aremos", "eremos", "iremos", "ássemos",
    "êssemos", "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu",
    "ou", "ira", "iras",
)


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
        w, 0, _STD_G1, ("logia", "logias"), ("uça~o", "uço~es"),
        ("ência", "ências"), ("amente",), ("mente",), ("idade", "idades"),
        ("iva", "ivo", "ivas", "ivos"), ("ira", "iras"),
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
        return w[:start] + "log", True
    if gid == 2:
        if start < p2:
            return w, False
        return w[:start] + "u", True
    if gid == 3:
        if start < p2:
            return w, False
        return w[:start] + "ente", True
    if gid == 4:  # amente
        if start < p1:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("iv",), ("os", "ic", "ad"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            s2, g2 = m2
            w = w[: -len(s2)]
            if g2 == 0 and w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        return w, True
    if gid == 5:  # mente
        if start < p2:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("ante", "avel", "ível"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            w = w[: -len(m2[0])]
        return w, True
    if gid == 6:  # idade(s)
        if start < p2:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("abil", "ic", "iv"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            w = w[: -len(m2[0])]
        return w, True
    if gid == 7:  # iva/ivo/ivas/ivos
        if start < p2:
            return w, False
        w = w[:start]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    # ira/iras: RV and preceded by 'e' -> 'ir'
    if start < pv:
        return w, False
    if start >= 1 and w[start - 1] == "e":
        return w[:start] + "ir", True
    return w, False


@lru_cache(maxsize=1 << 17)
def stem_pt(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    pv, p1, p2 = _regions(w)

    done = False
    w2, ok = _standard_suffix(w, pv, p1, p2)
    if ok:
        w = w2
        done = True
    else:
        m = _longest(w, pv, _VERB)
        if m is not None:
            w = w[: -len(m[0])]
            done = True
    if done:
        # do(['i'] test 'c' RV delete)
        if w.endswith("ci") and len(w) - 1 >= pv:
            w = w[:-1]
    else:
        m = _longest(w, 0, ("os", "a", "i", "o", "á", "í", "ó"))
        if m is not None and len(w) - len(m[0]) >= pv:
            w = w[: -len(m[0])]

    # residual_form
    m = _longest(w, 0, ("e", "é", "ê"), ("ç",))
    if m is not None:
        suf, gid = m
        if gid == 0:
            if len(w) - 1 >= pv:
                w = w[:-1]
                if (
                    (w.endswith("gu") or w.endswith("ci"))
                    and len(w) - 1 >= pv
                ):
                    w = w[:-1]
        else:
            w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
