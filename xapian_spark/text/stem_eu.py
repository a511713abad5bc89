"""Basque Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Basque algorithm
(the same one the reference compiles from
`xapian-core/languages/basque.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/basque).

The backward cursor is tracked explicitly: `repeat aditzak`/`repeat
izenak` peel suffixes at the cursor (after a delete the cursor sits at
the new end of the peeled region; after a `<-` replacement it sits LEFT
of the replacement, so later matches apply to the part before it).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiou")

_ADITZAK_RV = (
    "le", "la", "tzaile", "aldatu", "atu", "tzailea", "taile", "tailea",
    "pera", "gale", "galea", "gura", "kura", "kor", "korra", "or", "orra",
    "tun", "tuna", "gaitz", "gaitza", "kaitz", "kaitza", "ezin", "ezina",
    "tezin", "tezina", "errez", "erreza", "karri", "karria", "tzaga",
    "tzaka", "tzake", "tzeke", "ez", "eza", "tzez", "keta", "eta", "etan",
    "pen", "pena", "tze", "atze", "kuntza", "kunde", "kundea", "kune",
    "kunea", "kuna", "kera", "era", "kizun", "kizuna", "dura", "tura",
    "men", "mena", "go", "ago", "tio", "taldi", "taldia", "aldi", "aldia",
    "gune", "gunea", "bide", "bidea", "pide", "pidea", "gai", "gaia",
    "ki", "kin", "rekin", "kina", "kari", "karia", "ari", "tari", "etari",
    "gailu", "gailua", "kide", "kidea", "ide", "idea", "du", "ka", "kan",
    "an", "ean", "tu", "lari", "tatu", "rean", "tarazi", "arazi", "tzat",
    "bera", "dako",
)
_ADITZAK_R2 = ("garri", "garria", "tza")
_ADITZAK_REPL = {"atseden": "atseden", "arabera": "arabera",
                 "baditu": "baditu"}

_IZENAK_RV = (
    "ari", "aria", "bizia", "kari", "karia", "lari", "laria", "tari",
    "taria", "zain", "zaina", "tzain", "tzaina", "zale", "zalea", "tzale",
    "tzalea", "aizun", "orde", "ordea", "burua", "ohi", "ohia", "kintza",
    "gintzo", "gintzu", "tzu", "tzua", "tzo", "tzoa", "kuntza", "talde",
    "taldea", "eria", "keria", "teria", "di", "za", "ada", "tara",
    "etara", "tra", "ta", "tegi", "tegia", "keta", "z", "zko", "zkoa",
    "ti", "tia", "tsu", "tsua", "zu", "zua", "bera", "pera", "zto",
    "ztoa", "asi", "asia", "gile", "gilea", "estu", "estua", "larri",
    "larria", "nahi", "nahia", "koi", "koia", "oi", "oia", "goi", "min",
    "mina", "dun", "duna", "duru", "durua", "duri", "duria", "os", "osa",
    "oso", "osoa", "ar", "ara", "tar", "dar", "dara", "tiar", "tiara",
    "liar", "liara", "gabe", "gabea", "kabe", "kabea", "ga", "ge",
    "kada", "tasun", "tasuna", "asun", "asuna", "go", "mendu", "mendua",
    "mentu", "mentua", "mendi", "mendia", "zio", "zioa", "zino", "zinoa",
    "zione", "zionea", "ezia", "degi", "degia", "egi", "egia", "toki",
    "tokia", "leku", "lekua", "gintza", "alde", "aldea", "kalde",
    "kaldea", "gune", "gunea", "une", "unea", "una", "pe", "pea",
    "gibel", "gibela", "ondo", "ondoa", "arte", "artea", "aurre",
    "aurrea", "etxe", "etxea", "ola", "ontzi", "ontzia", "gela", "denda",
    "taldi", "taldia", "aldi", "aldia", "te", "tea", "zaro", "zaroa",
    "taro", "taroa", "oro", "oroa", "aro", "aroa", "ero", "eroa", "eroz",
    "eroza", "ka", "kan", "kana", "tako", "etako", "takoa", "kote",
    "kotea", "tzar", "tzarra", "handi", "handia", "kondo", "kondoa",
    "skila", "no", "noa", "ño", "ñoa", "ska", "xka", "zka", "tila",
    "to", "toa", "tto", "ttoa", "txo", "txoa", "txu", "txua", "anda",
    "anga", "urren", "urrena", "gai", "gaia", "gei", "geia", "eme",
    "emea", "kume", "kumea", "sa", "ko", "eko", "koa", "ena", "enea",
    "ne", "nea", "kor", "korra", "ez", "eza", "eta", "etan", "ki", "kia",
    "kin", "kina", "tu", "tua", "du", "dua", "ek", "tarik", "tariko",
    "tan", "ordu", "ordua", "oste", "ostea", "tzara", "ra", "antza",
    "behar", "ro", "giro", "ak", "zp", "ket", "kail", "kaila", "ail",
    "kirri", "kirria", "ngo", "ngoa", "ñi", "sko", "sta", "koitz",
    "koitza", "na", "garren", "garrena", "kera", "gerren", "gerrena",
    "garna", "kide", "tz", "tuko",
)
_IZENAK_R2 = ("ora", "garri", "garria", "or", "buru", "ren", "tza")
_IZENAK_R1 = ("tzen", "ten", "en", "tatu")
_IZENAK_REPL = {
    "joka": "jok", "trako": "tra", "minutuko": "minutu", "zehar": "zehar",
    "geldi": "geldi", "igaro": "igaro", "aurka": "aurka",
}

_ADJ_RV = (
    "era", "ero", "go", "tate", "tade", "date", "dade", "keria", "ki",
    "to", "ro", "la", "gi", "larik", "lanik", "ik", "ztik", "rik",
)
_ADJ_REPL = {"zlea": "z"}


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

    def gopast_v(j):
        while j < n and w[j] not in _V:
            j += 1
        return j + 1 if j < n else None

    def gopast_nonv(j):
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


def _match_at(w: str, cur: int, groups):
    """Longest suffix of w[:cur] drawn from any group -> (suffix, gid)."""
    best = None
    head = w[:cur]
    for gid, sufs in enumerate(groups):
        for s in sufs:
            if head.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, gid)
    return best


@lru_cache(maxsize=1 << 17)
def stem_eu(word: str) -> str:
    w = word
    pv, p1, p2 = _regions(w)
    cur = len(w)

    def run(groups, conds, repls):
        """One among step at the cursor.  groups: ordered list of suffix
        tuples; conds: per-group region minimum (pv/p1/p2) or None for
        replacement groups; repls: dict for replacement groups.
        -> (new_w, new_cur, ok)."""
        nonlocal w, cur
        m = _match_at(w, cur, groups)
        if m is None:
            return False
        suf, gid = m
        start = cur - len(suf)
        cond = conds[gid]
        if cond is not None:
            if start < cond:
                return False
            w = w[:start] + w[cur:]
            cur = start
            return True
        rep = repls[suf]
        w = w[:start] + rep + w[cur:]
        cur = start
        return True

    # repeat aditzak
    while run(
        [_ADITZAK_RV, _ADITZAK_R2, tuple(_ADITZAK_REPL)],
        [pv, p2, None], _ADITZAK_REPL,
    ):
        pass
    # repeat izenak
    while run(
        [_IZENAK_RV, _IZENAK_R2, _IZENAK_R1, tuple(_IZENAK_REPL)],
        [pv, p2, p1, None], _IZENAK_REPL,
    ):
        pass
    # do adjetiboak
    run([_ADJ_RV, tuple(_ADJ_REPL)], [pv, None], _ADJ_REPL)
    return w
