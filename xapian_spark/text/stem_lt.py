"""Lithuanian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Lithuanian
algorithm (the same one the reference compiles from
`xapian-core/languages/lithuanian.sbl`), validated against the full
public Snowball test vocabulary (xapian-data/stemming/lithuanian).
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiyouąęįųėū")

_STEP1 = (
    "as", "ias", "is", "ys", "o", "io", "ui", "iui", "ą", "ią", "į",
    "u", "iu", "e", "yje", "y", "au", "i", "an",
    "ai", "iai", "ų", "ių", "ams", "am", "iams", "iam", "us", "ius",
    "ais", "iais", "uose", "iuose", "uos", "iuos", "uosna", "iuosna",
    "ysna",
    "asis", "aisi", "osi", "ųsi", "uisi", "ąsi", "usi", "esi", "uo",
    "a", "ia", "os", "ios", "oj", "oje", "ioje", "osna", "iosna",
    "om", "oms", "ioms", "omis", "iomis", "ose", "iose", "on", "ion",
    "ė", "ės", "ei", "ę", "ėj", "ėje", "ėms", "es", "ėmis", "ėse",
    "ėsna", "ėn",
    "aus", "iaus", "umi", "iumi", "uje", "iuje", "iau", "ūs", "ums",
    "umis", "un", "iun",
    "ies", "ens", "enio", "ers", "eniui", "eriai", "enį", "erį", "imi",
    "eniu", "erimi", "eria", "enyje", "eryje", "ie", "enie", "erie",
    "enys", "erys", "erų", "ims", "enims", "erims", "enis", "imis",
    "enimis", "yse", "enyse", "eryse",
    "iem", "iems", "ame", "iame",
    "uosi", "iuosi", "iesi", "asi", "iasi", "amės", "iamės",
    "at", "ate", "iat", "iate", "atės", "iatės",
    "isi", "im", "imės", "it", "ite",
    "ome", "ot", "ote",
    "ėjo", "ėjosi", "otės",
    "eisi", "ėsi", "ėm", "ėme", "ėmės", "ėt", "ėte", "ėtės",
    "ausi", "omės",
    "siu", "siuosi", "si", "siesi", "s", "ysis", "sim", "sime",
    "sit", "site",
    "čiau", "čiausi", "tum", "tumei", "tumeis", "tumeisi", "tųsi",
    "tumėm", "tumėme", "tumėmės", "tute", "tumėt", "tumėte", "tumėtės",
    "k", "ki", "kimės",
    "uoti", "iuoti", "auti", "iauti", "oti", "ioti", "ėti", "yti",
    "inti", "inėti", "enti", "telėti", "terėti", "ti",
    "ąs", "iąs", "įs", "tųs", "simės", "sitės", "kite",
)

_STEP2 = (
    "ing", "išk", "ėt", "ot", "uot", "iuot", "yt", "iuk", "iul", "ėl",
    "yl", "učiuk", "uliuk", "utėlait", "ok", "iok", "sv", "šv", "zgan",
    "op", "iop", "ain", "ykšt", "ykšč",
    "esn", "aus", "iaus",
    "ias", "oj", "ioj", "aj", "iaj", "ąj", "iąj", "uoj", "iuoj", "iej",
    "ųj", "iųj", "ies", "uos", "iuos", "ais", "iais",
    "os", "ios", "ąs", "iąs",
    "dav",
    "ant", "iant", "int", "ėj", "ę", "ėję", "ęs", "siant",
    "dam", "auj", "jam", "iau", "am",
)

_FIX_CONFLICTS = [
    ("aitės", "aitė"), ("aite", "aitė"),
    ("uotės", "uotė"), ("uote", "uotė"),
    ("ėjime", "ėjimas"),
    ("esiu", "esys"), ("asius", "asys"),
    ("avime", "avimas"), ("ojime", "ojimas"),
    ("okatės", "okatė"), ("okate", "okatė"),
]


def _longest(w: str, lim: int, sufs):
    best = None
    avail = len(w) - lim
    for s in sufs:
        if len(s) <= avail and w.endswith(s):
            if best is None or len(s) > len(best):
                best = s
    return best


def _fix_chdz(w: str) -> str:
    if w.endswith("dž"):
        return w[:-2] + "d"
    if w.endswith("č"):
        return w[:-1] + "t"
    return w


@lru_cache(maxsize=1 << 17)
def stem_lt(word: str) -> str:
    w = word
    n = len(w)
    # region start skips a leading 'a' on words longer than 6 chars
    j = 1 if (n > 6 and w[:1] == "a") else 0
    p1 = n
    while j < n and w[j] not in _V:
        j += 1
    if j < n:
        j += 1
        while j < n and w[j] in _V:
            j += 1
        if j < n:
            p1 = j + 1

    # fix_conflicts (unlimited replacements)
    best = None
    for s, rep in _FIX_CONFLICTS:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best is not None:
        w = w[: -len(best[0])] + best[1]

    # step1 (one ending, within R1)
    m = _longest(w, p1, _STEP1)
    if m is not None:
        w = w[: -len(m)]

    w = _fix_chdz(w)

    # step2 (repeat suffix peeling, within R1)
    while True:
        m = _longest(w, p1, _STEP2)
        if m is None:
            break
        w = w[: -len(m)]

    w = _fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w
