"""Turkish Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Turkish algorithm
(Çilden, after Eryiğit & Adalı's affix-stripping FSMs — the same
algorithm the reference compiles from
`xapian-core/languages/turkish.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/turkish).

mark_* routines return the new backward cursor (or None); suffix-chain
deletions may remove MID-string slices (the ki-chains keep the tail
beyond their bracket), so deletes are expressed as w[:bra] + w[ket:].
"""

from __future__ import annotations

from functools import lru_cache

_VOWEL = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}


def _harmony(w: str, c: int) -> bool:
    j = c - 1
    while j >= 0 and w[j] not in _VOWEL:
        j -= 1
    if j < 0:
        return False
    group = _HARMONY[w[j]]
    k = j - 1
    while k >= 0 and w[k] not in group:
        k -= 1
    return k >= 0


def _opt_cons(w: str, c: int, ch: str):
    """mark_suffix_with_optional_{n,s,y}_consonant."""
    if c >= 1 and w[c - 1] == ch:
        if c >= 2 and w[c - 2] in _VOWEL:
            return c - 1
        return None
    if c >= 2 and w[c - 2] in _VOWEL:
        return c
    return None


def _opt_U(w: str, c: int):
    if c >= 1 and w[c - 1] in _U:
        if c >= 2 and w[c - 2] not in _VOWEL:
            return c - 1
        return None
    if c >= 2 and w[c - 2] not in _VOWEL:
        return c
    return None


def _among(w: str, c: int, sufs):
    best = None
    head = w[:c]
    for s in sufs:
        if head.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return c - len(best) if best is not None else None


def mark_possessives(w, c):
    c2 = _among(w, c, ("mız", "miz", "muz", "müz", "nız", "niz", "nuz",
                       "nüz", "m", "n"))
    if c2 is None:
        return None
    return _opt_U(w, c2)


def mark_sU(w, c):
    if not _harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _U:
        return _opt_cons(w, c - 1, "s")
    return None


def mark_lArI(w, c):
    return _among(w, c, ("leri", "ları"))


def mark_yU(w, c):
    if not _harmony(w, c):
        return None
    if c >= 1 and w[c - 1] in _U:
        return _opt_cons(w, c - 1, "y")
    return None


def mark_nU(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("nı", "ni", "nu", "nü"))


def mark_nUn(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("ın", "in", "un", "ün"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "n")


def mark_yA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("a", "e"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_nA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("na", "ne"))


def mark_DA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("da", "de", "ta", "te"))


def mark_ndA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("nda", "nde"))


def mark_DAn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("dan", "den", "tan", "ten"))


def mark_ndAn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("ndan", "nden"))


def mark_ylA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("la", "le"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_ki(w, c):
    return c - 2 if w[:c].endswith("ki") else None


def mark_ncA(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("ca", "ce"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "n")


def mark_yUm(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("ım", "im", "um", "üm"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_sUn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("sın", "sin", "sun", "sün"))


def mark_yUz(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("ız", "iz", "uz", "üz"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_sUnUz(w, c):
    return _among(w, c, ("sınız", "siniz", "sunuz", "sünüz"))


def mark_lAr(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("ler", "lar"))


def mark_nUz(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("nız", "niz", "nuz", "nüz"))


def mark_DUr(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ("tır", "tir", "tur", "tür", "dır", "dir", "dur",
                         "dür"))


def mark_cAsInA(w, c):
    return _among(w, c, ("casına", "cesine"))


def mark_yDU(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, (
        "tım", "tim", "tum", "tüm", "dım", "dim", "dum", "düm",
        "tın", "tin", "tun", "tün", "dın", "din", "dun", "dün",
        "tık", "tik", "tuk", "tük", "dık", "dik", "duk", "dük",
        "tı", "ti", "tu", "tü", "dı", "di", "du", "dü",
    ))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_ysA(w, c):
    c2 = _among(w, c, ("sam", "san", "sak", "sem", "sen", "sek", "sa",
                       "se"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_ymUs_(w, c):
    if not _harmony(w, c):
        return None
    c2 = _among(w, c, ("mış", "miş", "muş", "müş"))
    if c2 is None:
        return None
    return _opt_cons(w, c2, "y")


def mark_yken(w, c):
    if not w[:c].endswith("ken"):
        return None
    return _opt_cons(w, c - 3, "y")


def _nominal_verb(w: str):
    """-> (new_w, continue_noun_stemming) or None."""
    c0 = len(w)
    for m in (mark_ymUs_, mark_yDU, mark_ysA, mark_yken):
        c = m(w, c0)
        if c is not None:
            return w[:c], True
    c = mark_cAsInA(w, c0)
    if c is not None:
        c2 = None
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            c2 = m(w, c)
            if c2 is not None:
                break
        if c2 is None:
            c2 = c  # 'true'
        c3 = mark_ymUs_(w, c2)
        if c3 is not None:
            return w[:c3], True
    c = mark_lAr(w, c0)
    if c is not None:
        w2 = w[:c]
        for m in (mark_DUr, mark_yDU, mark_ysA, mark_ymUs_):
            c2 = m(w2, len(w2))
            if c2 is not None:
                return w2[:c2], False
        return w2, False
    c = mark_nUz(w, c0)
    if c is not None:
        for m in (mark_yDU, mark_ysA):
            c2 = m(w, c)
            if c2 is not None:
                return w[:c2], True
    for m in (mark_sUnUz, mark_yUz, mark_sUn, mark_yUm):
        c = m(w, c0)
        if c is not None:
            w2 = w[:c]
            c2 = mark_ymUs_(w2, len(w2))
            if c2 is not None:
                return w2[:c2], True
            return w2, True
    c = mark_DUr(w, c0)
    if c is not None:
        w2 = w[:c]
        cc = len(w2)
        c2 = None
        for m in (mark_sUnUz, mark_lAr, mark_yUm, mark_sUn, mark_yUz):
            c2 = m(w2, cc)
            if c2 is not None:
                break
        if c2 is None:
            c2 = cc
        c3 = mark_ymUs_(w2, c2)
        if c3 is not None:
            return w2[:c3], True
        return w2, True
    return None


def _cut(w: str, bra: int, ket: int) -> str:
    return w[:bra] + w[ket:]


def _try_lar_chain(w: str, c: int):
    """try([mark_lAr] delete stem_suffix_chain_before_ki) with the tail
    w[c:] preserved."""
    c2 = mark_lAr(w, c)
    if c2 is None:
        return None
    w2 = _cut(w, c2, c)
    r = _chain_ki(w2, c2)
    return r if r is not None else (w2, c2)


def _chain_ki(w: str, c: int):
    """stem_suffix_chain_before_ki at cursor c -> (w, cursor) or None."""
    ket = c
    c1 = mark_ki(w, c)
    if c1 is None:
        return None
    # DA-case
    c2 = mark_DA(w, c1)
    if c2 is not None:
        w2 = _cut(w, c2, ket)
        # try([ lAr-case or possessives-case )
        c3 = mark_lAr(w2, c2)
        if c3 is not None:
            w3 = _cut(w2, c3, c2)
            r = _chain_ki(w3, c3)
            return r if r is not None else (w3, c3)
        c3 = mark_possessives(w2, c2)
        if c3 is not None:
            w3 = _cut(w2, c3, c2)
            r = _try_lar_chain(w3, c3)
            return r if r is not None else (w3, c3)
        return (w2, c2)
    # nUn-case
    c2 = mark_nUn(w, c1)
    if c2 is not None:
        w2 = _cut(w, c2, ket)
        c3 = mark_lArI(w2, c2)
        if c3 is not None:
            return (_cut(w2, c3, c2), c3)
        c3 = mark_possessives(w2, c2)
        if c3 is None:
            c3 = mark_sU(w2, c2)
        if c3 is not None:
            w3 = _cut(w2, c3, c2)
            r = _try_lar_chain(w3, c3)
            return r if r is not None else (w3, c3)
        r = _chain_ki(w2, c2)
        return r if r is not None else (w2, c2)
    # ndA-case (ndA itself is not deleted here)
    c2 = mark_ndA(w, c1)
    if c2 is not None:
        c3 = mark_lArI(w, c2)
        if c3 is not None:
            return (_cut(w, c3, ket), c3)
        c3 = mark_sU(w, c2)
        if c3 is not None:
            w2 = _cut(w, c3, ket)
            r = _try_lar_chain(w2, c3)
            return r if r is not None else (w2, c3)
        return _chain_ki(w, c2)
    return None


def _noun_suffixes(w: str):
    """stem_noun_suffixes -> new_w or None."""
    c0 = len(w)

    # 1: [lAr] delete try(chain)
    c = mark_lAr(w, c0)
    if c is not None:
        w2 = w[:c]
        r = _chain_ki(w2, len(w2))
        return r[0] if r is not None else w2
    # 2: [ncA] delete try(...)
    c = mark_ncA(w, c0)
    if c is not None:
        w2 = w[:c]
        cc = len(w2)
        c2 = mark_lArI(w2, cc)
        if c2 is not None:
            return w2[:c2]
        c2 = mark_possessives(w2, cc)
        if c2 is None:
            c2 = mark_sU(w2, cc)
        if c2 is not None:
            w3 = w2[:c2]
            r = _try_lar_chain(w3, len(w3))
            return r[0] if r is not None else w3
        c2 = mark_lAr(w2, cc)
        if c2 is not None:
            w3 = w2[:c2]
            r = _chain_ki(w3, len(w3))
            if r is not None:
                return r[0]
            # chain failed but the lAr deletion persists (last try option)
            return w3
        return w2
    # 3: [(ndA or nA) (lArI | sU... | chain)]
    for m in (mark_ndA, mark_nA):
        c = m(w, c0)
        if c is not None:
            c2 = mark_lArI(w, c)
            if c2 is not None:
                return w[:c2]
            c2 = mark_sU(w, c)
            if c2 is not None:
                w2 = w[:c2]
                r = _try_lar_chain(w2, len(w2))
                return r[0] if r is not None else w2
            r = _chain_ki(w, c)
            if r is not None:
                return r[0]
    # 4: [(ndAn or nU) ((sU ...) or lArI)]
    for m in (mark_ndAn, mark_nU):
        c = m(w, c0)
        if c is not None:
            c2 = mark_sU(w, c)
            if c2 is not None:
                w2 = w[:c2]
                r = _try_lar_chain(w2, len(w2))
                return r[0] if r is not None else w2
            c2 = mark_lArI(w, c)
            if c2 is not None:
                return w  # marks without a delete
    # 5: [DAn] delete try([...])
    c = mark_DAn(w, c0)
    if c is not None:
        w2 = w[:c]
        cc = len(w2)
        c2 = mark_possessives(w2, cc)
        if c2 is not None:
            w3 = w2[:c2]
            r = _try_lar_chain(w3, len(w3))
            return r[0] if r is not None else w3
        c2 = mark_lAr(w2, cc)
        if c2 is not None:
            w3 = w2[:c2]
            r = _chain_ki(w3, len(w3))
            return r[0] if r is not None else w3
        r = _chain_ki(w2, cc)
        return r[0] if r is not None else w2
    # 6: [nUn or ylA] delete try(...)
    for m in (mark_nUn, mark_ylA):
        c = m(w, c0)
        if c is not None:
            w2 = w[:c]
            cc = len(w2)
            c2 = mark_lAr(w2, cc)
            if c2 is not None:
                w3 = w2[:c2]
                r = _chain_ki(w3, len(w3))
                if r is not None:
                    return r[0]
                # chain failed: the lAr deletion PERSISTS and the next
                # or-option runs on the modified string (Snowball
                # backtracking restores only the cursor)
                w2 = w3
                cc = len(w2)
            c2 = mark_possessives(w2, cc)
            if c2 is None:
                c2 = mark_sU(w2, cc)
            if c2 is not None:
                w3 = w2[:c2]
                r = _try_lar_chain(w3, len(w3))
                return r[0] if r is not None else w3
            r = _chain_ki(w2, cc)
            return r[0] if r is not None else w2
    # 7: [lArI] delete
    c = mark_lArI(w, c0)
    if c is not None:
        return w[:c]
    # 8: chain
    r = _chain_ki(w, c0)
    if r is not None:
        return r[0]
    # 9: [DA or yU or yA] delete try(...)
    for m in (mark_DA, mark_yU, mark_yA):
        c = m(w, c0)
        if c is not None:
            w2 = w[:c]
            cc = len(w2)
            c2 = mark_possessives(w2, cc)
            if c2 is not None:
                w3 = w2[:c2]
                c3 = mark_lAr(w3, len(w3))
                if c3 is not None:
                    w3 = w3[:c3]
                r = _chain_ki(w3, len(w3))
                return r[0] if r is not None else w3
            c2 = mark_lAr(w2, cc)
            if c2 is not None:
                w3 = w2[:c2]
                r = _chain_ki(w3, len(w3))
                return r[0] if r is not None else w3
            return w2
    # 10: [possessives or sU] delete try(lAr-chain)
    c = mark_possessives(w, c0)
    if c is None:
        c = mark_sU(w, c0)
    if c is not None:
        w2 = w[:c]
        r = _try_lar_chain(w2, len(w2))
        return r[0] if r is not None else w2
    return None


def _postlude(w: str) -> str:
    # reserved words: exactly ad / soyad
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        j = len(w) - 1
        while j >= 0 and w[j] not in _VOWEL:
            j -= 1
        if j >= 0:
            v = w[j]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            elif v in "öü":
                w += "ü"
    if w.endswith("b"):
        w = w[:-1] + "p"
    elif w.endswith("c"):
        w = w[:-1] + "ç"
    elif w.endswith("d"):
        w = w[:-1] + "t"
    elif w.endswith("ğ"):
        w = w[:-1] + "k"
    return w


@lru_cache(maxsize=1 << 17)
def stem_tr(word: str) -> str:
    w = word
    if sum(c in _VOWEL for c in w) < 2:
        return w
    r = _nominal_verb(w)
    cont = True
    if r is not None:
        w, cont = r
    if not cont:
        # flag check fails: noun suffixes AND postlude are skipped
        return w
    r2 = _noun_suffixes(w)
    if r2 is not None:
        w = r2
    return _postlude(w)
