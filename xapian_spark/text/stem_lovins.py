"""Lovins stemmer (1968), pure Python.

From-scratch implementation of the published Snowball Lovins algorithm
(the same one the reference compiles from
`xapian-core/languages/lovins.sbl`), validated against the full public
Snowball test vocabulary (xapian-data/stemming/lovins).

The per-ending letter conditions (A..CC) are routine conditions in the
among, so a failing condition RETRIES the remaining endings.
"""

from __future__ import annotations

from functools import lru_cache


def _A(s):
    return len(s) >= 2


def _B(s):
    return len(s) >= 3


def _C(s):
    return len(s) >= 4


def _D(s):
    return len(s) >= 5


def _E(s):
    return len(s) >= 2 and not s.endswith("e")


def _F(s):
    return len(s) >= 3 and not s.endswith("e")


def _G(s):
    return len(s) >= 3 and s.endswith("f")


def _H(s):
    return len(s) >= 2 and (s.endswith("t") or s.endswith("ll"))


def _I(s):
    return len(s) >= 2 and not s.endswith(("o", "e"))


def _J(s):
    return len(s) >= 2 and not s.endswith(("a", "e"))


def _K(s):
    return len(s) >= 3 and (
        s.endswith(("l", "i")) or (s.endswith("e") and len(s) >= 3
                                   and s[-3] == "u")
    )


def _L(s):
    if len(s) < 2 or s.endswith(("u", "x")):
        return False
    if s.endswith("s") and not s.endswith("os"):
        return False
    return True


def _M(s):
    return len(s) >= 2 and not s.endswith(("a", "c", "e", "m"))


def _N(s):
    # `test hop 3 (hop 2 not 's' or hop 2)`: or binds TIGHTER than
    # juxtaposition in Snowball, so this is hop 2, then
    # (not 's' or hop 2): stem >= 3, and either the char 3 from the end
    # is not 's' or the stem has >= 4 chars
    return len(s) >= 3 and (
        (len(s) < 3 or s[-3] != "s") or len(s) >= 4
    )


def _O(s):
    return len(s) >= 2 and s.endswith(("l", "i"))


def _P(s):
    return len(s) >= 2 and not s.endswith("c")


def _Q(s):
    return len(s) >= 3 and not s.endswith(("l", "n"))


def _R(s):
    return len(s) >= 2 and s.endswith(("n", "r"))


def _S(s):
    return len(s) >= 2 and (
        s.endswith("dr") or (s.endswith("t") and not s.endswith("tt"))
    )


def _T(s):
    return len(s) >= 2 and (
        s.endswith("s") or (s.endswith("t") and not s.endswith("ot"))
    )


def _U(s):
    return len(s) >= 2 and s.endswith(("l", "m", "n", "r"))


def _V(s):
    return len(s) >= 2 and s.endswith("c")


def _W(s):
    return len(s) >= 2 and not s.endswith(("s", "u"))


def _X(s):
    return len(s) >= 2 and (
        s.endswith(("l", "i")) or (s.endswith("e") and len(s) >= 3
                                   and s[-3] == "u")
    )


def _Y(s):
    return len(s) >= 2 and s.endswith("in")


def _Z(s):
    return len(s) >= 2 and not s.endswith("f")


def _AA(s):
    return len(s) >= 2 and s.endswith(
        ("d", "f", "ph", "th", "l", "er", "or", "es", "t")
    )


def _BB(s):
    return len(s) >= 3 and not s.endswith(("met", "ryst"))


def _CC(s):
    return len(s) >= 2 and s.endswith("l")


_ENDINGS = [
    ("alistically", _B), ("arizability", _A), ("izationally", _B),
    ("antialness", _A), ("arisations", _A), ("arizations", _A),
    ("entialness", _A),
    ("allically", _C), ("antaneous", _A), ("antiality", _A),
    ("arisation", _A), ("arization", _A), ("ationally", _B),
    ("ativeness", _A), ("eableness", _E), ("entations", _A),
    ("entiality", _A), ("entialize", _A), ("entiation", _A),
    ("ionalness", _A), ("istically", _A), ("itousness", _A),
    ("izability", _A), ("izational", _A),
    ("ableness", _A), ("arizable", _A), ("entation", _A),
    ("entially", _A), ("eousness", _A), ("ibleness", _A),
    ("icalness", _A), ("ionalism", _A), ("ionality", _A),
    ("ionalize", _A), ("iousness", _A), ("izations", _A),
    ("lessness", _A),
    ("ability", _A), ("aically", _A), ("alistic", _B), ("alities", _A),
    ("ariness", _E), ("aristic", _A), ("arizing", _A), ("ateness", _A),
    ("atingly", _A), ("ational", _B), ("atively", _A), ("ativism", _A),
    ("elihood", _E), ("encible", _A), ("entally", _A), ("entials", _A),
    ("entiate", _A), ("entness", _A), ("fulness", _A), ("ibility", _A),
    ("icalism", _A), ("icalist", _A), ("icality", _A), ("icalize", _A),
    ("ication", _G), ("icianry", _A), ("ination", _A), ("ingness", _A),
    ("ionally", _A), ("isation", _A), ("ishness", _A), ("istical", _A),
    ("iteness", _A), ("iveness", _A), ("ivistic", _A), ("ivities", _A),
    ("ization", _F), ("izement", _A), ("oidally", _A), ("ousness", _A),
    ("aceous", _A), ("acious", _B), ("action", _G), ("alness", _A),
    ("ancial", _A), ("ancies", _A), ("ancing", _B), ("ariser", _A),
    ("arized", _A), ("arizer", _A), ("atable", _A), ("ations", _B),
    ("atives", _A), ("eature", _Z), ("efully", _A), ("encies", _A),
    ("encing", _A), ("ential", _A), ("enting", _C), ("entist", _A),
    ("eously", _A), ("ialist", _A), ("iality", _A), ("ialize", _A),
    ("ically", _A), ("icance", _A), ("icians", _A), ("icists", _A),
    ("ifully", _A), ("ionals", _A), ("ionate", _D), ("ioning", _A),
    ("ionist", _A), ("iously", _A), ("istics", _A), ("izable", _E),
    ("lessly", _A), ("nesses", _A), ("oidism", _A),
    ("acies", _A), ("acity", _A), ("aging", _B), ("aical", _A),
    ("alist", _A), ("alism", _B), ("ality", _A), ("alize", _A),
    ("allic", _BB), ("anced", _B), ("ances", _B), ("antic", _C),
    ("arial", _A), ("aries", _A), ("arily", _A), ("arity", _B),
    ("arize", _A), ("aroid", _A), ("ately", _A), ("ating", _I),
    ("ation", _B), ("ative", _A), ("ators", _A), ("atory", _A),
    ("ature", _E), ("early", _Y), ("ehood", _A), ("eless", _A),
    ("elity", _A), ("ement", _A), ("enced", _A), ("ences", _A),
    ("eness", _E), ("ening", _E), ("ental", _A), ("ented", _C),
    ("ently", _A), ("fully", _A), ("ially", _A), ("icant", _A),
    ("ician", _A), ("icide", _A), ("icism", _A), ("icist", _A),
    ("icity", _A), ("idine", _I), ("iedly", _A), ("ihood", _A),
    ("inate", _A), ("iness", _A), ("ingly", _B), ("inism", _J),
    ("inity", _CC), ("ional", _A), ("ioned", _A), ("ished", _A),
    ("istic", _A), ("ities", _A), ("itous", _A), ("ively", _A),
    ("ivity", _A), ("izers", _F), ("izing", _F), ("oidal", _A),
    ("oides", _A), ("otide", _A), ("ously", _A),
    ("able", _A), ("ably", _A), ("ages", _B), ("ally", _B),
    ("ance", _B), ("ancy", _B), ("ants", _B), ("aric", _A),
    ("arly", _K), ("ated", _I), ("ates", _A), ("atic", _B),
    ("ator", _A), ("ealy", _Y), ("edly", _E), ("eful", _A),
    ("eity", _A), ("ence", _A), ("ency", _A), ("ened", _E),
    ("enly", _E), ("eous", _A), ("hood", _A), ("ials", _A),
    ("ians", _A), ("ible", _A), ("ibly", _A), ("ical", _A),
    ("ides", _L), ("iers", _A), ("iful", _A), ("ines", _M),
    ("ings", _N), ("ions", _B), ("ious", _A), ("isms", _B),
    ("ists", _A), ("itic", _H), ("ized", _F), ("izer", _F),
    ("less", _A), ("lily", _A), ("ness", _A), ("ogen", _A),
    ("ward", _A), ("wise", _A), ("ying", _B), ("yish", _A),
    ("acy", _A), ("age", _B), ("aic", _A), ("als", _BB),
    ("ant", _B), ("ars", _O), ("ary", _F), ("ata", _A),
    ("ate", _A), ("eal", _Y), ("ear", _Y), ("ely", _E),
    ("ene", _E), ("ent", _C), ("ery", _E), ("ese", _A),
    ("ful", _A), ("ial", _A), ("ian", _A), ("ics", _A),
    ("ide", _L), ("ied", _A), ("ier", _A), ("ies", _P),
    ("ily", _A), ("ine", _M), ("ing", _N), ("ion", _Q),
    ("ish", _C), ("ism", _B), ("ist", _A), ("ite", _AA),
    ("ity", _A), ("ium", _A), ("ive", _A), ("ize", _F),
    ("oid", _A), ("one", _R), ("ous", _A),
    ("ae", _A), ("al", _BB), ("ar", _X), ("as", _B),
    ("ed", _E), ("en", _F), ("es", _E), ("ia", _A),
    ("ic", _A), ("is", _A), ("ly", _B), ("on", _S),
    ("or", _T), ("um", _U), ("us", _V), ("yl", _R),
    ("'s", _A), ("s'", _A),
    ("a", _A), ("e", _A), ("i", _A), ("o", _A),
    ("s", _W), ("y", _B),
]

_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

_RESPELL = [
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", lambda s: not s.endswith(("a", "i", "o"))),
    ("bex", "bic", None), ("dex", "dic", None), ("pex", "pic", None),
    ("tex", "tic", None), ("ax", "ac", None), ("ex", "ec", None),
    ("ix", "ic", None), ("lux", "luc", None), ("uad", "uas", None),
    ("vad", "vas", None), ("cid", "cis", None), ("lid", "lis", None),
    ("erid", "eris", None), ("pand", "pans", None),
    ("end", "ens", lambda s: not s.endswith("s")),
    ("ond", "ons", None), ("lud", "lus", None), ("rud", "rus", None),
    ("her", "hes", lambda s: not s.endswith(("p", "t"))),
    ("mit", "mis", None),
    ("ent", "ens", lambda s: not s.endswith("m")),
    ("ert", "ers", None),
    ("et", "es", lambda s: not s.endswith("n")),
    ("yt", "ys", None), ("yz", "ys", None),
]


@lru_cache(maxsize=1 << 17)
def stem_lovins(word: str) -> str:
    w = word
    # endings: longest match whose condition passes (routine retry)
    excluded: set[str] = set()
    while True:
        best = None
        for s, cond in _ENDINGS:
            if s in excluded:
                continue
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, cond)
        if best is None:
            break
        suf, cond = best
        stem = w[: -len(suf)]
        if cond(stem):
            w = stem
            break
        excluded.add(suf)

    # undouble
    if w.endswith(_DOUBLES):
        w = w[:-1]

    # respell (longest match; a parenthesized condition failing ends it)
    best = None
    for s, rep, cond in _RESPELL:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep, cond)
    if best is not None:
        suf, rep, cond = best
        if cond is None or cond(w[: -len(suf)]):
            w = w[: -len(suf)] + rep
    return w
