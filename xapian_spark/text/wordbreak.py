"""UAX #29 default word-boundary segmentation (dictionary-less).

Re-derivation of the published Unicode Standard Annex #29 ("Unicode Text
Segmentation", word boundary rules WB1-WB999) over the Word_Break property
table in _wordbreak_data.py (Unicode 16, extracted from the icu4j library
bundled with Apache Spark — see tools/dump_wordbreak.java).

This powers FLAG_WORD_BREAKS (reference: queryparser.h:637,
word-breaker.cc WordIterator, termgenerator_internal.cc break_words):
unbroken-script runs (Thai, Lao, Khmer, Myanmar, CJK, ...) are segmented
into positional word tokens instead of FLAG_NGRAMS unigram/bigram terms.

Scope note (documented divergence): the reference delegates to ICU, whose
word BreakIterator adds DICTIONARY-based segmentation for Thai / Lao /
Khmer / Burmese / CJK on top of the UAX#29 default rules.  Dictionaries
are data this environment cannot fetch; we implement the deterministic
default-rules subset, under which Hangul and Katakana runs segment into
words while Han / Hiragana / Thai-family characters each form their own
segment (WB999) — for an inverted index this is recall-preserving
unigram behavior for exactly the scripts a dictionary would refine.

The rule set is the full current UAX#29 table, so the module is also a
general-purpose segmenter (tested on Latin/numeric/punctuation inputs
against the spec's own rule examples and differentially against icu4j,
which uses pure UAX#29 rules for non-dictionary scripts).
"""

from __future__ import annotations

from bisect import bisect_right

from xapian_spark.text._wordbreak_data import CLASSES, STARTS, VALS

# property-class indices (resolved by name so the generated table's
# ordering can never silently skew the rules)
_C = {name: i for i, name in enumerate(CLASSES)}
ALETTER = _C["ALetter"]
CR = _C["CR"]
DQ = _C["Double_Quote"]
EXTEND = _C["Extend"]
EXTENDNUMLET = _C["ExtendNumLet"]
FORMAT = _C["Format"]
HEBREW = _C["Hebrew_Letter"]
KATAKANA = _C["Katakana"]
LF = _C["LF"]
MIDLETTER = _C["MidLetter"]
MIDNUM = _C["MidNum"]
MIDNUMLET = _C["MidNumLet"]
NEWLINE = _C["Newline"]
NUMERIC = _C["Numeric"]
OTHER = _C["Other"]
RI = _C["Regional_Indicator"]
SQ = _C["Single_Quote"]
WSEGSPACE = _C["WSegSpace"]
ZWJ = _C["ZWJ"]

_AHLETTER = (ALETTER, HEBREW)
_MIDNUMLETQ = (MIDNUMLET, SQ)
_IGNORE = (EXTEND, FORMAT, ZWJ)  # WB4 Extend|Format|ZWJ


def wb_property(cp: int) -> int:
    """Word_Break class index of a codepoint."""
    return VALS[bisect_right(STARTS, cp) - 1] >> 1


def is_extended_pictographic(cp: int) -> bool:
    return bool(VALS[bisect_right(STARTS, cp) - 1] & 1)


def word_boundaries(text: str) -> list[int]:
    """Boundary offsets per UAX#29 WB1-WB999 (default rules), including
    0 and len(text).  Implementation shape: resolve each codepoint's
    class once, then walk pairs with the WB4 ignore-skip applied by
    tracking, for each position, the last non-ignorable class before it
    (`prev`) and the one before that across intervening ignorables
    (`prev2` for the two-sided WB6/WB7b/WB12 rules).
    """
    n = len(text)
    if n == 0:
        return [0]
    props = [wb_property(ch_cp) for ch_cp in map(ord, text)]
    bounds = [0]
    # prev chain AFTER WB4 skipping; ri_run counts the regional-indicator
    # run length ending at prev (for WB15/WB16 even-pairing)
    prev = props[0]
    prev2 = None
    ri_run = 1 if prev == RI else 0
    for i in range(1, n):
        cur = props[i]
        cur_cp = ord(text[i])
        brk: bool
        # WB3/WB3a/WB3b/WB3c/WB3d apply to RAW adjacency (they precede the
        # WB4 ignore rule), so they test props[i-1], not the skip-context
        # WB3: CR x LF
        if props[i - 1] == CR and cur == LF:
            brk = False
        # WB3a: (Newline | CR | LF) ÷
        elif props[i - 1] in (NEWLINE, CR, LF):
            brk = True
        # WB3b: ÷ (Newline | CR | LF)
        elif cur in (NEWLINE, CR, LF):
            brk = True
        # WB3c: ZWJ x \p{Extended_Pictographic}  (raw, before WB4)
        elif props[i - 1] == ZWJ and is_extended_pictographic(cur_cp):
            brk = False
        # WB3d: WSegSpace x WSegSpace (raw adjacency, before WB4)
        elif props[i - 1] == WSEGSPACE and cur == WSEGSPACE:
            brk = False
        # WB4: X (Extend | Format | ZWJ)* -> X : never break before them
        elif cur in _IGNORE:
            brk = False
        else:
            # from here on, `prev`/`prev2` are the WB4-skipped context
            p, c = prev, cur
            # lookahead for the two-sided rules: next non-ignorable class
            j = i + 1
            while j < n and props[j] in _IGNORE:
                j += 1
            nxt = props[j] if j < n else None
            if p in _AHLETTER and c in _AHLETTER:
                brk = False                                   # WB5
            elif (p in _AHLETTER and c in (MIDLETTER, *_MIDNUMLETQ)
                  and nxt in _AHLETTER):
                brk = False                                   # WB6
            elif (prev2 in _AHLETTER and p in (MIDLETTER, *_MIDNUMLETQ)
                  and c in _AHLETTER):
                brk = False                                   # WB7
            elif p == HEBREW and c == SQ:
                brk = False                                   # WB7a
            elif p == HEBREW and c == DQ and nxt == HEBREW:
                brk = False                                   # WB7b
            elif prev2 == HEBREW and p == DQ and c == HEBREW:
                brk = False                                   # WB7c
            elif p == NUMERIC and c == NUMERIC:
                brk = False                                   # WB8
            elif p in _AHLETTER and c == NUMERIC:
                brk = False                                   # WB9
            elif p == NUMERIC and c in _AHLETTER:
                brk = False                                   # WB10
            elif (prev2 == NUMERIC and p in (MIDNUM, *_MIDNUMLETQ)
                  and c == NUMERIC):
                brk = False                                   # WB11
            elif (p == NUMERIC and c in (MIDNUM, *_MIDNUMLETQ)
                  and nxt == NUMERIC):
                brk = False                                   # WB12
            elif p == KATAKANA and c == KATAKANA:
                brk = False                                   # WB13
            elif (p in (*_AHLETTER, NUMERIC, KATAKANA, EXTENDNUMLET)
                  and c == EXTENDNUMLET):
                brk = False                                   # WB13a
            elif (p == EXTENDNUMLET
                  and c in (*_AHLETTER, NUMERIC, KATAKANA)):
                brk = False                                   # WB13b
            elif p == RI and c == RI and ri_run % 2 == 1:
                brk = False                                   # WB15/WB16
            else:
                brk = True                                    # WB999
        if brk:
            bounds.append(i)
        # update the WB4-skipped context: ignorables attach to prev and
        # leave the (prev, prev2, ri_run) context untouched
        if cur not in _IGNORE:
            prev2 = prev
            prev = cur
            ri_run = ri_run + 1 if cur == RI else 0
    bounds.append(n)
    return bounds


def word_segments(text: str) -> list[str]:
    """Segments between every pair of adjacent boundaries."""
    b = word_boundaries(text)
    return [text[b[i]: b[i + 1]] for i in range(len(b) - 1)]


def word_tokens(text: str) -> list[str]:
    """Word-like segments only: those containing at least one letter,
    number, or mark codepoint (the segments the reference's WordIterator
    path indexes — break_words feeds whole unbroken-script runs, so every
    segment of a run qualifies; on general text this drops the space and
    punctuation segments between words)."""
    import unicodedata

    return [
        seg
        for seg in word_segments(text)
        if any(unicodedata.category(ch)[0] in ("L", "N", "M") for ch in seg)
    ]
