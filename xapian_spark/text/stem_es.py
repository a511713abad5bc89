"""Spanish Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Spanish algorithm
(the same one the reference compiles from
`xapian-core/languages/spanish.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/spanish).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiouáéíóúü")

_PRONOUNS = (
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
    "las", "les", "los", "nos",
)
_PRON_ACCENTED = {
    "iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er", "ír": "ir",
}
_PRON_PLAIN = ("ando", "iendo", "ar", "er", "ir")

_STD_G1 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_STD_G2 = (
    "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
    "antes", "ancia", "ancias",
)
_Y_VERB = (
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
    "yais", "yamos",
)
_VERB_G1 = ("en", "es", "éis", "emos")
_VERB_G2 = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
    "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id", "ase",
    "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
    "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo",
    "ió", "ar", "er", "ir", "as", "abas", "adas", "idas", "ías",
    "aras", "ieras", "ases", "ieses", "ís", "áis", "abais", "íais",
    "arais", "ierais", "aseis", "ieseis", "asteis", "isteis", "ados",
    "idos", "amos", "ábamos", "íamos", "imos", "áramos", "iéramos",
    "iésemos", "ásemos",
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


def _attached_pronoun(w: str, pv: int) -> str:
    m = _longest(w, 0, _PRONOUNS)
    if m is None:
        return w
    base = w[: -len(m[0])]
    endings = (
        list(_PRON_ACCENTED) + list(_PRON_PLAIN) + ["yendo"]
    )
    e = None
    for cand in endings:
        if (
            base.endswith(cand)
            and len(base) - len(cand) >= pv
            and (e is None or len(cand) > len(e))
        ):
            e = cand
    if e is None:
        return w
    if e in _PRON_ACCENTED:
        return base[: -len(e)] + _PRON_ACCENTED[e]
    if e == "yendo":
        if base[: -len(e)].endswith("u"):
            return base
        return w
    return base


def _standard_suffix(w: str, p1: int, p2: int) -> tuple[str, bool]:
    m = _longest(
        w, 0, _STD_G1, _STD_G2, ("logía", "logías"), ("ución", "uciones"),
        ("encia", "encias"), ("amente",), ("mente",), ("idad", "idades"),
        ("iva", "ivo", "ivas", "ivos"),
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
    if gid == 5:  # amente
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
    if gid == 6:  # mente
        if start < p2:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("ante", "able", "ible"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            w = w[: -len(m2[0])]
        return w, True
    if gid == 7:  # idad(es)
        if start < p2:
            return w, False
        w = w[:start]
        m2 = _longest(w, 0, ("abil", "ic", "iv"))
        if m2 is not None and len(w) - len(m2[0]) >= p2:
            w = w[: -len(m2[0])]
        return w, True
    # iva/ivo/ivas/ivos
    if start < p2:
        return w, False
    w = w[:start]
    if w.endswith("at") and len(w) - 2 >= p2:
        w = w[:-2]
    return w, True


@lru_cache(maxsize=1 << 17)
def stem_es(word: str) -> str:
    w = word
    pv, p1, p2 = _regions(w)

    w = _attached_pronoun(w, pv)

    w2, ok = _standard_suffix(w, p1, p2)
    if ok:
        w = w2
    else:
        m = _longest(w, pv, _Y_VERB)
        if m is not None and w[: -len(m[0])].endswith("u"):
            w = w[: -len(m[0])]
        else:
            m = _longest(w, pv, _VERB_G1, _VERB_G2)
            if m is not None:
                suf, gid = m
                w = w[: -len(suf)]
                if gid == 0 and w.endswith("gu"):
                    w = w[:-1]  # drop the u of gu before en/es/éis/emos

    # residual
    m = _longest(w, 0, ("os", "a", "o", "á", "í", "ó"), ("e", "é"))
    if m is not None:
        suf, gid = m
        start = len(w) - len(suf)
        if start >= pv:
            w = w[:start]
            if gid == 1 and w.endswith("u") and len(w) >= 2 \
                    and w[-2] == "g" and len(w) - 1 >= pv:
                w = w[:-1]

    return (
        w.replace("á", "a").replace("é", "e").replace("í", "i")
        .replace("ó", "o").replace("ú", "u")
    )
