"""Tamil Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Tamil algorithm
(Rajalingam — the same one the reference compiles from
`xapian-core/languages/tamil.sbl`).  NOTE: no public test vocabulary
exists for Tamil (xapian-data/stemming/tamil ships only a COPYING file),
so unlike the other 25 variants this one is spec-derived and smoke-
tested, not byte-parity-validated.

The sbl's or-chains are ordered (first match wins, unlike among's
longest-match); lookbehind `test` conditions inspect the text before an
end-anchored suffix.
"""

from __future__ import annotations

from functools import lru_cache

A, AA, I, II, U, UU = "அ", "ஆ", "இ", "ஈ", "உ", "ஊ"
E, EE, AI, O, OO, AU = "எ", "ஏ", "ஐ", "ஒ", "ஓ", "ஔ"
KA, NGA, CA, NYA = "க", "ங", "ச", "ஞ"
TTA, NNA, TA, NA, NNNA = "ட", "ண", "த", "ந", "ன"
PA, MA, YA, RA, RRA = "ப", "ம", "ய", "ர", "ற"
LA, LLA, ZHA, VA = "ல", "ள", "ழ", "வ"
VS_AA, VS_I, VS_II, VS_U, VS_UU = (
    "ா", "ி", "ீ", "ு", "ூ")
VS_E, VS_EE, VS_AI, VS_O, VS_OO = (
    "ெ", "ே", "ை", "ொ", "ோ")
PUL = "்"

_VS_ALL = (VS_AA, VS_I, VS_II, VS_E, VS_EE, VS_U, VS_UU, VS_AI)
_HARD = (KA, CA, TTA, TA, PA, RRA)
_INDEP_V = (A, AA, I, II, U, UU, E, EE, AI, O, OO, AU)


def _fix_va_start(w: str) -> str:
    for pat, rep in ((VA + VS_OO, OO), (VA + VS_O, O), (VA + VS_U, U),
                     (VA + VS_UU, UU)):
        if w.startswith(pat):
            return rep + w[len(pat):]
    return w


def _fix_ending(w: str, vetrumai: bool) -> tuple[str, bool]:
    """One fix_ending pass -> (w, changed)."""
    if len(w) <= 3:
        return w, False
    for s in (NA + PUL + TA + PUL, NA + PUL + TA, NA + PUL):
        # among: longest of the three
        pass
    m = None
    for s in sorted((NA + PUL, NA + PUL + TA, NA + PUL + TA + PUL),
                    key=len, reverse=True):
        if w.endswith(s):
            m = s
            break
    if m is not None:
        return w[: -len(m)], True
    if w.endswith(YA + PUL) and w[: -2].endswith((VS_AI, VS_I, VS_II)):
        return w[:-2], True
    if w.endswith((TTA + PUL + PA + PUL, TTA + PUL + KA + PUL)):
        return w[:-4] + LLA + PUL, True
    if w.endswith(NNNA + PUL + RRA + PUL):
        return w[:-4] + LA + PUL, True
    if w.endswith(RRA + PUL + KA + PUL):
        return w[:-4] + LA + PUL, True
    if w.endswith(TTA + PUL + TTA + PUL):
        return w[:-4] + TTA + VS_U, True
    if (
        vetrumai
        and w.endswith(TA + PUL + TA + PUL)
        and not w[:-4].endswith(VS_AI)
    ):
        return w[:-4] + MA + PUL, True
    if w.endswith(VS_U + KA + PUL + KA + PUL):
        return w[:-5] + PUL, True
    if w.endswith(VS_U + KA + PUL):
        # the longer uk+k form handled above ('uk' or 'ukk' -> pulli)
        return w[:-3] + PUL, True
    if (
        len(w) >= 4
        and w[-1] == PUL and w[-2] in _HARD
        and w[-3] == PUL and w[-4] in _HARD
    ):
        return w[:-4], True
    if len(w) >= 2 and w[-1] == PUL and w[-2] in _HARD:
        return w[:-2], True
    _SOFT1 = (YA, RA, LA, VA, ZHA, LLA)
    _SOFT2 = (NGA, NYA, NNA, NA, MA, NNNA)
    if (
        len(w) >= 4
        and w[-1] == PUL
        and (w[-2] in _SOFT1 or w[-2] in _SOFT2)
        and w[-3] == PUL
    ):
        return w[:-3] + PUL, True
    for s in (VA + PUL, VA, YA):  # ordered: va-pulli before bare va
        if w.endswith(s):
            return w[: -len(s)], True
    if w.endswith(NNNA + VS_U) and not w[:-2].endswith(_VS_ALL):
        return w[:-2], True
    if w.endswith(NGA + PUL) and not w[:-2].endswith(VS_AI):
        return w[:-2] + MA + PUL, True
    if w.endswith(NGA + PUL):
        return w[:-2], True
    if w.endswith(PUL) and (
        w[:-1].endswith(_VS_ALL) or w[:-1].endswith(PUL)
    ):
        return w[:-1], True
    return w, False


def _fix_endings(w: str, vetrumai: bool) -> str:
    while True:
        w, changed = _fix_ending(w, vetrumai)
        if not changed:
            return w


def _ends_first(w: str, options):
    """First (ordered) matching end pattern with optional lookbehind
    predicate: options = [(suffix, cond_fn_or_None)]; -> suffix or None."""
    for s, cond in options:
        if w.endswith(s) and (cond is None or cond(w[: -len(s)])):
            return s
    return None


@lru_cache(maxsize=1 << 17)
def stem_ta(word: str) -> str:
    w = word
    vetrumai = False
    w, _ = _fix_ending(w, vetrumai)
    if len(w) <= 4:
        return w

    # remove_question_prefixes: e + C + pulli at the start
    if (
        len(w) >= 3 and w[0] == E
        and w[1] in (KA, CA, TA, VA, NA, PA, MA, YA, NGA, NYA)
        and w[2] == PUL
    ):
        w = w[3:]
        w = _fix_va_start(w)

    # remove_pronoun_prefixes: (a|i|u) + C + pulli
    if (
        len(w) >= 3 and w[0] in (A, I, U)
        and w[1] in (KA, CA, TA, VA, NA, PA, MA, YA, NGA, NYA)
        and w[2] == PUL
    ):
        w = w[3:]
        w = _fix_va_start(w)

    # remove_question_suffixes
    if len(w) > 4:
        m = None
        for s in (VS_OO, VS_EE, VS_AA):
            if w.endswith(s):
                m = s
                break
        if m is not None:
            w = w[:-1] + PUL
        w = _fix_endings(w, vetrumai)

    # remove_um
    if len(w) > 4 and w.endswith(VS_U + MA + PUL):
        w = w[:-3] + PUL
        w, _ = _fix_ending(w, vetrumai)

    # remove_common_word_endings
    if len(w) > 4:
        done = False
        cwe1 = [
            (VS_U + TTA + NNNA + PUL, None),
            (VS_I + LA + PUL + LA + VS_AI, None),
            (VS_I + TTA + MA + PUL, None),
            (VS_I + NNNA + PUL + RRA + VS_I, None),
            (VS_AA + KA + VS_I, None),
            (VS_AA + KA + VS_I + YA, None),
            (VS_E + NNNA + PUL + RRA + VS_U, None),
            (VS_U + LLA + PUL + LLA, None),
            (VS_U + TTA + VS_AI + YA, None),
            (VS_U + TTA + VS_AI, None),
            (VS_E + NNNA + VS_U + MA + PUL, None),
            (LA + PUL + LA,
             lambda s: not s.endswith(_VS_ALL)),
            (VS_E + NNNA, None),
        ]
        m = _ends_first(w, cwe1)
        if m is not None:
            w = w[: -len(m)] + PUL
            done = True
        if not done:
            cwe2 = sorted((
                PA + TTA + VS_U,
                PA + TTA + PUL + TTA,
                PA + TTA + PUL + TTA + VS_U,
                PA + TTA + PUL + TTA + TA + VS_U,
                PA + TTA + PUL + TTA + NNA,
                KA + VS_U + RA + VS_I + YA,
                PA + RRA + PUL + RRA + VS_I,
                VA + VS_I + TTA + VS_U,
                VA + VS_I + TTA + PUL + TTA + VS_U,
                PA + TTA + VS_I + TA + VS_AA + NNNA,
                PA + TTA + VS_I,
                TA + VS_AA + NNNA,
                VS_E + LA + PUL + LA + VS_AA + MA + PUL,
            ), key=len, reverse=True)
            for s in cwe2:
                if w.endswith(s):
                    w = w[: -len(s)]
                    break
        w = _fix_endings(w, vetrumai)

    # remove_vetrumai_urupukal
    if len(w) > 4:
        matched = True
        if w.endswith(NNNA + VS_AI):
            w = w[:-2]
        elif (
            w.endswith(VS_I + NNNA + VS_AI)
            or (w.endswith(VS_AI) and not w[:-1].endswith(_HARD))
            or (
                w.endswith(VS_AI)
                and len(w) >= 3
                and w[-2] in _HARD and w[-3] == PUL
            )
        ):
            if w.endswith(VS_I + NNNA + VS_AI):
                w = w[:-3] + PUL
            else:
                w = w[:-1] + PUL
        else:
            vu3 = [
                (VS_O + TTA + VS_U, None),
                (VS_OO + TTA + VS_U, None),
                (VS_I + LA + PUL, None),
                (VS_I + RRA + PUL, None),
                (VS_I + NNNA + PUL, lambda s: not s.endswith(MA)),
                (VS_I + NNNA + PUL + RRA + VS_U, None),
                (VS_I + RA + VS_U + NA + PUL + TA + VS_U, None),
                (VA + VS_I + TTA, None),
                (VS_I + TTA + MA + PUL,
                 lambda s: len(s) + 4 >= 7),
                (VS_AA + LA + PUL, None),
                (VS_U + TTA + VS_AI, None),
                (VS_AA + MA + LA + PUL, None),
                (LA + PUL, lambda s: not s.endswith(_VS_ALL)),
                (VS_U + LLA + PUL, None),
            ]
            m = _ends_first(w, vu3)
            if m is not None:
                w = w[: -len(m)] + PUL
            else:
                vu4 = [
                    (KA + NNA + PUL, None),
                    (MA + VS_U + NNNA + PUL, None),
                    (MA + VS_EE + LA + PUL, None),
                    (MA + VS_EE + RRA + PUL, None),
                    (KA + VS_II + ZHA + PUL, None),
                    (PA + VS_I + NNNA + PUL, None),
                    (TA + VS_U, lambda s: not s.endswith(_VS_ALL)),
                ]
                m = _ends_first(w, vu4)
                if m is not None:
                    w = w[: -len(m)]
                elif w.endswith(VS_II):
                    w = w[:-1] + VS_I
                else:
                    matched = False
        if matched:
            vetrumai = True
            if w.endswith(VS_I + NNNA + PUL):
                w = w[:-3] + PUL
        w = _fix_endings(w, vetrumai)

    # remove_plural_suffix
    if w.endswith(VS_U + NGA + PUL + KA + LLA + PUL) and not \
            w[:-6].endswith(_HARD):
        w = w[:-6] + PUL
    elif w.endswith(RRA + PUL + KA + LLA + PUL):
        w = w[:-5] + LA + PUL
    elif w.endswith(TTA + PUL + KA + LLA + PUL):
        w = w[:-5] + LLA + PUL
    elif w.endswith(KA + LLA + PUL):
        w = w[:-3]

    # remove_command_suffixes
    if len(w) > 4 and w.endswith((PA + VS_I, VA + VS_I)):
        w = w[:-2]

    # remove_tense_suffixes
    found = True
    while found:
        found = False
        if len(w) > 4:
            w, f1 = _remove_tense_suffix(w, vetrumai)
            found = f1
        else:
            break
    return w


def _remove_tense_suffix(w: str, vetrumai: bool) -> tuple[str, bool]:
    found = False
    t1 = sorted((
        KA + VS_O + NNA + PUL + TTA + VS_I + RA + PUL,
        PA + TTA + VS_U,
    ), key=len, reverse=True)
    m1 = None
    for s in t1:
        if w.endswith(s):
            m1 = s
            break
    if m1 is not None:
        w = w[: -len(m1)]
        found = True
    else:
        t2 = [
            (MA + VS_AA + RA + PUL, None),
            (MA + VS_I + NNNA + PUL, None),
            (NNNA + NNNA + PUL, None),
            (NNNA + VS_AA + NNNA + PUL, None),
            (NNNA + VS_AA + LLA + PUL, None),
            (NNNA + VS_AA + RA + PUL, None),
            (VA + NNNA + PUL, lambda s: not s.endswith(_INDEP_V)),
            (NNNA + LLA + PUL, None),
            (VA + LLA + PUL, None),
            (NNNA + RA + PUL, None),
            (VA + RA + PUL, None),
            (NNNA, None), (PA, None), (KA, None), (TA, None), (YA, None),
            (PA + NNNA + PUL, None),
            (PA + LLA + PUL, None),
            (PA + RA + PUL, None),
            (TA + VS_U, lambda s: not s.endswith(_VS_ALL)),
            (VS_I + RRA + PUL + RRA + VS_U, None),
            (PA + MA + PUL, None),
            (NNNA + MA + PUL, None),
            (TA + VS_U + MA + PUL, None),
            (RRA + VS_U + MA + PUL, None),
            (KA + VS_U + MA + PUL, None),
            (NNNA + VS_E + NNNA + PUL, None),
            (NNNA + VS_AI, None),
            (VA + VS_AI, None),
        ]
        m = _ends_first(w, t2)
        if m is not None:
            w = w[: -len(m)]
            found = True
        else:
            t3 = [
                (VS_AA + NNNA + PUL, lambda s: not s.endswith(CA)),
                (VS_AA + LLA + PUL, None),
                (VS_AA + RA + PUL, None),
                (VS_EE + NNNA + PUL, None),
                (VS_AA, None),
                (VS_AA + MA + PUL, None),
                (VS_E + MA + PUL, None),
                (VS_EE + MA + PUL, None),
                (VS_OO + MA + PUL, None),
                (KA + VS_U + MA + PUL, None),
                (TA + VS_U + MA + PUL, None),
                (TTA + VS_U + MA + PUL, None),
                (RRA + VS_U + MA + PUL, None),
                (VS_AA + YA + PUL, None),
                (NNNA + VS_E + NNNA + PUL, None),
                (NNNA + VS_I + RA + PUL, None),
                (VS_II + RA + PUL, None),
                (VS_II + YA + RA + PUL, None),
            ]
            m = _ends_first(w, t3)
            if m is not None:
                w = w[: -len(m)] + PUL
                found = True
            else:
                for s in (KA + VS_U, TA + VS_U):
                    if w.endswith(s) and w[: -len(s)].endswith(PUL):
                        w = w[: -len(s)]
                        found = True
                        break
    # kinra-forms
    kin = sorted((
        VS_AA + NA + VS_I + NNNA + PUL + RRA,
        VS_AA + NA + VS_I + NNNA + PUL + RRA + PUL,
        KA + VS_I + NNNA + PUL + RRA,
        KA + VS_I + NNNA + PUL + RRA + PUL,
        KA + VS_I + RRA,
        KA + VS_I + RRA + PUL,
    ), key=len, reverse=True)
    for s in kin:
        if w.endswith(s):
            w = w[: -len(s)]
            found = True
            break
    w = _fix_endings(w, vetrumai)
    return w, found
