"""Arabic Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Arabic algorithm
(the same algorithm the reference compiles from
`xapian-core/languages/arabic.sbl`, by Assem Chelli / Abdelkrim Aries).

SPEC-DERIVED: xapian-data/stemming ships no Arabic test vocabulary
(verified — only COPYING/README), so like tamil this cannot be
byte-validated against a public golden corpus; the implementation follows
the .sbl semantics exactly and is covered by hand-checked smoke tests.

Faithfulness notes (checked against the runtime in
xapian-core/languages/steminternal.cc:replace_s):

- `$(len > k)` tests the CURRENT whole-string length at match time.
- Forward `<- S` leaves the cursor after the replacement (replace_s:
  `if (c >= c_ket) c += adjustment`), so after Prefix_Step1 rewrites the
  first two letters the later prefix routines match at position 1, not 0.
- Backward delete/replace leaves the cursor at the left end of the edit;
  `next` in backwardmode steps the cursor one char left, so
  Suffix_Noun_Step3 can delete a yeh that is no longer word-final.
- `or` restores the cursor but NOT string modifications.  The only
  reachable modified-then-failed paths (noun Step1b without a Step2*
  continuation; Step3 failing after the try-block edited) leave the
  restored cursor dangling past the shortened string, where the runtime's
  among_b then compares against the just-deleted (stale) suffix bytes and
  always fails — equivalent to ending the suffix phase, which is how it
  is modelled here.
"""

from __future__ import annotations

from functools import lru_cache

# -- Normalize_pre (arabic.sbl:247-315): one-pass char translation --------
# diacritics + tatweel deleted; Hindu-Arabic digits to ASCII; presentation
# forms (U+FE80..U+FEFC) folded to base letters; lam-alef ligatures split.
_PRE_MAP: dict[int, str | None] = {}
for _cp in range(0x064B, 0x0653):  # fathatan..sukun incl. shadda
    _PRE_MAP[_cp] = None
_PRE_MAP[0x0640] = None  # kasheeda / tatweel
for _i in range(10):
    _PRE_MAP[0x0660 + _i] = str(_i)
for _span, _base in (
    ((0xFE80,), "ء"), ((0xFE83, 0xFE84), "أ"),
    ((0xFE87, 0xFE88), "إ"),
    ((0xFE89, 0xFE8A, 0xFE8B, 0xFE8C), "ئ"),
    ((0xFE81, 0xFE82), "آ"), ((0xFE85, 0xFE86), "ؤ"),
    ((0xFE8D, 0xFE8E), "ا"),
    ((0xFE8F, 0xFE90, 0xFE91, 0xFE92), "ب"),
    ((0xFE93, 0xFE94), "ة"),
    ((0xFE95, 0xFE96, 0xFE97, 0xFE98), "ت"),
    ((0xFE99, 0xFE9A, 0xFE9B, 0xFE9C), "ث"),
    ((0xFE9D, 0xFE9E, 0xFE9F, 0xFEA0), "ج"),
    ((0xFEA1, 0xFEA2, 0xFEA3, 0xFEA4), "ح"),
    ((0xFEA5, 0xFEA6, 0xFEA7, 0xFEA8), "خ"),
    ((0xFEA9, 0xFEAA), "د"), ((0xFEAB, 0xFEAC), "ذ"),
    ((0xFEAD, 0xFEAE), "ر"), ((0xFEAF, 0xFEB0), "ز"),
    ((0xFEB1, 0xFEB2, 0xFEB3, 0xFEB4), "س"),
    ((0xFEB5, 0xFEB6, 0xFEB7, 0xFEB8), "ش"),
    ((0xFEB9, 0xFEBA, 0xFEBB, 0xFEBC), "ص"),
    ((0xFEBD, 0xFEBE, 0xFEBF, 0xFEC0), "ض"),
    ((0xFEC1, 0xFEC2, 0xFEC3, 0xFEC4), "ط"),
    ((0xFEC5, 0xFEC6, 0xFEC7, 0xFEC8), "ظ"),
    ((0xFEC9, 0xFECA, 0xFECB, 0xFECC), "ع"),
    ((0xFECD, 0xFECE, 0xFECF, 0xFED0), "غ"),
    ((0xFED1, 0xFED2, 0xFED3, 0xFED4), "ف"),
    ((0xFED5, 0xFED6, 0xFED7, 0xFED8), "ق"),
    ((0xFED9, 0xFEDA, 0xFEDB, 0xFEDC), "ك"),
    ((0xFEDD, 0xFEDE, 0xFEDF, 0xFEE0), "ل"),
    ((0xFEE1, 0xFEE2, 0xFEE3, 0xFEE4), "م"),
    ((0xFEE5, 0xFEE6, 0xFEE7, 0xFEE8), "ن"),
    ((0xFEE9, 0xFEEA, 0xFEEB, 0xFEEC), "ه"),
    ((0xFEED, 0xFEEE), "و"), ((0xFEEF, 0xFEF0), "ى"),
    ((0xFEF1, 0xFEF2, 0xFEF3, 0xFEF4), "ي"),
    ((0xFEFB, 0xFEFC), "لا"),
    ((0xFEF7, 0xFEF8), "لأ"),
    ((0xFEF9, 0xFEFA), "لإ"),
    ((0xFEF5, 0xFEF6), "لآ"),
):
    for _cp in _span:
        _PRE_MAP[_cp] = _base

# -- Normalize_post step 2: fold remaining hamza carriers -----------------
_POST_MAP = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ؤ": "و", "ئ": "ي"})
_LAST_HAMZA = frozenset("أإآؤئ")

# -- suffix amongs (arabic.sbl:409-490) -----------------------------------
# entries: (suffix, min_len) — condition is len(current word) >= min_len;
# `len > k` conditions are stored as min_len = k+1.
_S_NOUN_1A = (
    ("ي", 4), ("ك", 4), ("ه", 4),
    ("نا", 5), ("كم", 5), ("ها", 5), ("هن", 5), ("هم", 5),
    ("كما", 6), ("هما", 6),
)
_S_NOUN_1B = (("ن", 6),)
_S_NOUN_2A = (("ا", 5), ("ي", 5), ("و", 5))
_S_NOUN_2B = (("ات", 5),)
_S_NOUN_2C1 = (("ت", 4),)
_S_NOUN_2C2 = (("ة", 4),)
_S_NOUN_3 = (("ي", 3),)
_S_VERB_1 = (
    ("ه", 4), ("ك", 4),
    ("ني", 5), ("نا", 5), ("ها", 5), ("هم", 5), ("هن", 5), ("كم", 5),
    ("كن", 5),
    ("هما", 6), ("كما", 6), ("كمو", 6),
)
_S_VERB_2A = (
    ("ت", 4), ("ا", 4), ("ن", 4), ("ي", 4),
    ("نا", 5), ("تا", 5), ("تن", 5),
    ("ان", 6), ("ون", 6), ("ين", 6),
    ("تما", 6),
)
_S_VERB_2B = (("وا", 5), ("تم", 5))
_S_VERB_2C = (("و", 4), ("تمو", 6))


class _St:
    """Mutable stem state: current word + backward cursor."""

    __slots__ = ("w", "c")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)


def _b_del(st: _St, entries, repl: str = "") -> bool:
    """Backward [substring] among: longest suffix ending at the cursor,
    condition on current len, delete (or replace); cursor to the cut."""
    w, c = st.w, st.c
    best = None
    for s, minlen in entries:
        if c >= len(s) and w[c - len(s):c] == s:
            if best is None or len(s) > len(best[0]):
                best = (s, minlen)
    if best is None:
        return False
    s, minlen = best
    if len(w) < minlen:
        return False
    st.w = w[: c - len(s)] + repl + w[c:]
    st.c = c - len(s)
    return True


def _f_among(w: str, fc: int, entries) -> tuple[str, int, str] | None:
    """Forward [substring] among at cursor fc: longest matching prefix;
    -> (matched, min_len, replacement) or None."""
    best = None
    for s, minlen, repl in entries:
        if w.startswith(s, fc):
            if best is None or len(s) > len(best[0]):
                best = (s, minlen, repl)
    return best


# prefix amongs (arabic.sbl:354-406); replacement None = delete
_P_STEP1 = (
    ("أأ", 4, "أ"), ("أآ", 4, "آ"), ("أؤ", 4, "أ"),
    ("أا", 4, "ا"), ("أإ", 4, "إ"),
)
_P_STEP3A = (("بال", 6, None), ("كال", 6, None), ("لل", 5, None), ("ال", 5, None))
_P_STEP3B = (("ب", 4, None), ("بب", 4, "ب"), ("كك", 4, "ك"))
_P_STEP3V = (("سي", 5, "ي"), ("ست", 5, "ت"), ("سن", 5, "ن"), ("سأ", 5, "أ"))
_P_STEP4V = (("يست", 5, "است"), ("نست", 5, "است"), ("تست", 5, "است"))
_CHECKS1 = (("بال", 5, None), ("كال", 5, None), ("لل", 4, None), ("ال", 4, None))


@lru_cache(maxsize=1 << 16)
def stem_ar(word: str) -> str:
    is_noun = True
    is_verb = True
    is_defined = False

    # -- Checks1 (forward, flags only; arabic.sbl:345-350) ----------------
    m = _f_among(word, 0, _CHECKS1)
    if m is not None and len(word) >= m[1]:
        is_noun, is_verb, is_defined = True, False, True

    # -- Normalize_pre -----------------------------------------------------
    w = word.translate(_PRE_MAP)

    # -- suffix phase (backwards; arabic.sbl:505-547) ----------------------
    st = _St(w)
    phase_done = False
    if is_verb:
        cnt = 0
        while _b_del(st, _S_VERB_1):
            cnt += 1
        if cnt >= 1:
            # (Step2a or Step2c or next): next = cursor one left
            if not _b_del(st, _S_VERB_2A) and not _b_del(st, _S_VERB_2C):
                st.c = max(st.c - 1, 0)
            phase_done = True
        elif _b_del(st, _S_VERB_2B):
            phase_done = True
        elif _b_del(st, _S_VERB_2A):
            phase_done = True
    if not phase_done and is_noun:
        modified = False
        # try ( 2c2 or (not defined 1a (2a|2b|2c1|next))
        #       or (1b (2a|2b|2c1)) or (not defined 2a) or 2b )
        if _b_del(st, _S_NOUN_2C2):
            modified = True
        elif not is_defined and _b_del(st, _S_NOUN_1A):
            modified = True
            if (
                not _b_del(st, _S_NOUN_2A)
                and not _b_del(st, _S_NOUN_2B)
                and not _b_del(st, _S_NOUN_2C1)
            ):
                st.c = max(st.c - 1, 0)  # next
        elif _b_del(st, _S_NOUN_1B):
            if not (
                _b_del(st, _S_NOUN_2A)
                or _b_del(st, _S_NOUN_2B)
                or _b_del(st, _S_NOUN_2C1)
            ):
                # alternative fails AFTER deleting the noon: the restored
                # cursor dangles past the shortened string, so every later
                # among stale-fails (see module docstring) — phase over.
                phase_done = True
            modified = True
        elif not is_defined and _b_del(st, _S_NOUN_2A):
            modified = True
        elif _b_del(st, _S_NOUN_2B):
            modified = True
        if not phase_done:
            if _b_del(st, _S_NOUN_3):
                phase_done = True
            elif modified:
                # Step3 failed after edits: restored cursor dangles, the
                # alef-maqsura among stale-fails — phase over.
                phase_done = True
    if not phase_done:
        # Suffix_All_alef_maqsura: trailing alef maksura -> yeh
        st.c = len(st.w)
        _b_del(st, (("ى", 0),), repl="ي")
    w = st.w

    # -- prefix phase (forward; arabic.sbl:550-557).  The cursor flows
    # between the steps: a Step1 rewrite leaves it after the new first
    # letter (replace_s semantics), where Step2/Step3 then match.
    fc = 0
    m = _f_among(w, fc, _P_STEP1)
    if m is not None and len(w) >= m[1]:
        s, _, repl = m
        w = w[:fc] + repl + w[fc + len(s):]
        fc += len(repl)
    if not w.startswith("فا", fc) and not w.startswith("وا", fc):
        if w[fc:fc + 1] in ("ف", "و") and len(w) >= 4:
            w = w[:fc] + w[fc + 1:]  # delete: cursor stays at the cut
    done = False
    m = _f_among(w, fc, _P_STEP3A)
    if m is not None and len(w) >= m[1]:
        w = w[:fc] + w[fc + len(m[0]):]
        done = True
    if not done and is_noun and not w.startswith("با", fc):
        m = _f_among(w, fc, _P_STEP3B)
        if m is not None and len(w) >= m[1]:
            s, _, repl = m
            w = w[:fc] + (repl or "") + w[fc + len(s):]
            done = True
    if not done and is_verb:
        fc2 = fc
        m = _f_among(w, fc2, _P_STEP3V)
        if m is not None and len(w) >= m[1]:
            s, _, repl = m
            w = w[:fc2] + repl + w[fc2 + len(s):]
            fc2 += len(repl)
        m = _f_among(w, fc2, _P_STEP4V)
        if m is not None and len(w) >= m[1]:
            s, _, repl = m
            w = w[:fc2] + repl + w[fc2 + len(s):]

    # -- Normalize_post ----------------------------------------------------
    if w and w[-1] in _LAST_HAMZA:
        w = w[:-1] + "ء"
    return w.translate(_POST_MAP)
