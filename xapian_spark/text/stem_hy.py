"""Armenian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Armenian algorithm
(the same algorithm the reference compiles from
`xapian-core/languages/armenian.sbl`, by Astghik Mkrtchyan).

SPEC-DERIVED: xapian-data/stemming ships no Armenian test vocabulary
(verified — only COPYING/README), so like tamil this cannot be
byte-validated against a public golden corpus; the implementation follows
the .sbl semantics exactly (suffix tables machine-extracted from the
stringdefs) and is covered by hand-checked smoke tests.

Structure (armenian.sbl:63-306): mark_regions computes pV (just past the
first vowel) and the standard p2; stemming runs backwards limited to pV:
  do ending    -- [substring] R2 among(...) delete
  do verb      -- longest-match delete
  do adjective -- longest-match delete
  do noun      -- longest-match delete
All four amongs are unconditional deletes (ending additionally requires
the cut point to lie in R2); per Snowball among semantics the longest
matching suffix wins and a failing R2 fails the routine without retrying
shorter suffixes.
"""

from __future__ import annotations

from functools import lru_cache

# v = {a}{e}{i}{o}{u}{ye}{vo}{y} (armenian.sbl:61)
_V = frozenset("աէիօւեոը")

# Suffix tables below are machine-extracted from armenian.sbl's stringdef
# escapes (see tools note in module docstring); order within a tuple is
# irrelevant — matching takes the longest suffix.

_ADJECTIVE = (
    'բար', 'պես', 'որէն', 'ովին', 'ակի', 'լայն', 'րորդ', 'երորդ', 'ական',
    'ալի', 'կոտ', 'եկեն', 'որակ', 'եղ', 'վուն', 'երեն', 'արան', 'են',
    'ավետ', 'գին', 'իվ', 'ատ', 'ին',
)
_VERB = (
    'ում', 'վում', 'ալու', 'ելու', 'վել', 'անալ', 'ելուց', 'ալուց', 'ըալ',
    'ըել', 'ալով', 'ելով', 'ալիս', 'ելիս', 'ենալ', 'ացնալ', 'եցնել',
    'ցնել', 'նել', 'ատել', 'ոտել', 'կոտել', 'տել', 'ված', 'եցվել', 'ացվել',
    'եցիր', 'ացիր', 'եցինք', 'ացինք', 'վեցիր', 'վեցինք', 'վեցիք', 'վեցին',
    'ացրիր', 'ացրեց', 'ացրինք', 'ացրիք', 'ացրին', 'եցիք', 'ացիք', 'եցին',
    'ացին', 'ացար', 'ացավ', 'ացանք', 'ացաք', 'ացան', 'վեցի', 'ացրի',
    'եցար', 'եցավ', 'ցանք', 'ցաք', 'ցան', 'ացա', 'ացի', 'եցա', 'չել',
    'եցի', 'ար', 'ավ', 'անք', 'աք', 'ան', 'ալ', 'ել', 'եց', 'աց', 'վե',
    'ա',
)
_NOUN = (
    'ածո', 'անակ', 'անօց', 'արան', 'արք', 'պան', 'ստան', 'եղէն', 'ենք',
    'իկ', 'իչ', 'իք', 'մունք', 'յակ', 'յուն', 'ոնք', 'որդ', 'ոց', 'չեք',
    'վածք', 'վոր', 'ավոր', 'ություն', 'ուկ', 'ուհի', 'ույթ', 'ույք',
    'ուստ', 'ուս', 'ցի', 'ալիք', 'անիք', 'իլ', 'իչք', 'ունք', 'գար', 'ու',
    'ակ', 'ան', 'ք',
)
_ENDING = (
    'ները', 'ներն', 'ների', 'ներդ', 'երից', 'ներից', 'երի', 'երդ', 'երն',
    'երը', 'ներին', 'ությանն', 'ությանը', 'ությանս', 'ությանդ', 'ության',
    'երին', 'ին', 'սա', 'ոջ', 'ից', 'երով', 'ներով', 'երում', 'ներում',
    'ուն', 'ուդ', 'վանս', 'վանը', 'վանդ', 'անը', 'անդ', 'վան', 'ոջը',
    'ոջս', 'ոջդ', 'ոց', 'ուց', 'ոջից', 'ցից', 'վից', 'վի', 'վով', 'ով',
    'անով', 'անում', 'վանից', 'ամբ', 'ան', 'ներ', 'եր', 'վա', 'ը', 'ն',
    'դ', 'ց', 'ի',
)


def _longest(w: str, lim: int, sufs: tuple[str, ...]) -> str | None:
    """Longest suffix of w from sufs not crossing backward limit lim."""
    best = None
    avail = len(w) - lim
    for s in sufs:
        if len(s) <= avail and w.endswith(s):
            if best is None or len(s) > len(best):
                best = s
    return best


@lru_cache(maxsize=1 << 16)
def stem_hy(word: str) -> str:
    w = word
    n = len(w)

    # -- mark_regions (armenian.sbl:63-71): pV past first vowel; p2 std --
    pv = p2 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i < n:
        pv = i + 1
        j = pv
        while j < n and w[j] in _V:        # gopast non-v
            j += 1
        if j < n:
            j += 1
            while j < n and w[j] not in _V:  # gopast v
                j += 1
            if j < n:
                j += 1
                while j < n and w[j] in _V:  # gopast non-v
                    j += 1
                if j < n:
                    p2 = j + 1

    # -- backwards setlimit tomark pV (armenian.sbl:300-305) -------------
    # do ending: R2-checked delete (cut point must lie at/after p2)
    m = _longest(w, pv, _ENDING)
    if m is not None and len(w) - len(m) >= p2:
        w = w[: -len(m)]
    # do verb / do adjective / do noun: unconditional longest-match delete
    for group in (_VERB, _ADJECTIVE, _NOUN):
        m = _longest(w, pv, group)
        if m is not None:
            w = w[: -len(m)]
    return w
