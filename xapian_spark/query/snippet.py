"""Snippet generation: MSet::snippet (mset.h SNIPPET_* flags; algorithm in
queryparser/termgenerator_internal.cc:380-720).

The reference tokenizes the text with the SAME parse_terms scanner used at
index time, assigns each word a relevance (query-term weight, exact-phrase
bonus, or a small "background" weight), pipes words through SnipPipe to
pick a window of at most `length` bytes maximizing total relevance, and
emits the window with hi_start/hi_end around relevant words and `omit`
markers at clipped edges.

This re-expression keeps the observable contract:

- words are found with the index tokenizer's word-character predicates and
  normalized with parse_terms, so a word matches exactly when the indexed
  term matches (stemmed query terms `Z...` match via the same stemmer);
- the window is chosen EXHAUSTIVELY (two-pointer over non-negative
  relevances — optimal, equivalent to SNIPPET_EXHAUSTIVE; the reference's
  default merely stops early at a "good enough" window);
- `length` is a UTF-8 byte budget on the un-highlighted snippet text;
- SNIPPET_EMPTY_WITHOUT_MATCH returns '' when no query term matched;
- SNIPPET_BACKGROUND_MODEL (on by default, as in the reference) gives
  non-query words a small idf-flavoured weight so equally-matching
  windows prefer more "interesting" surroundings.

Documented divergences: exact-phrase / wildcard / fuzzy relevance bonuses
(reference FIXMEs at termgenerator_internal.cc:616-650) are not
implemented — each matched term scores independently; sentence-boundary
bonuses likewise.  Snippeting is a driver-side presentation step (the
reference also runs it per result string); batch highlighting over a
DataFrame column should map this function with mapInPandas.
"""

from __future__ import annotations

import math

from xapian_spark.text.tokenizer import (
    _is_wordchar,
    is_unbroken_script,
    parse_terms,
)

SNIPPET_BACKGROUND_MODEL = 1
SNIPPET_EXHAUSTIVE = 2  # accepted; selection is always exhaustive here
SNIPPET_EMPTY_WITHOUT_MATCH = 4
SNIPPET_WORD_BREAKS = 8  # mset.h:299-309; requires a word_breaks index


def words_with_spans(
    text: str, word_breaks: bool = False
) -> list[tuple[int, int, str]]:
    """(start, end, normalized_term) for each word of *text*, using the
    index tokenizer: spans are maximal word-character runs (plus any
    in-word '.' / '+' / '#' the scanner consumes), the term is what
    parse_terms yields for that span — so snippet matching agrees with
    index matching."""
    out: list[tuple[int, int, str]] = []
    n = len(text)
    i = 0
    while i < n:
        while i < n and not _is_wordchar(text[i]):
            i += 1
        if i >= n:
            break
        j = i
        while j < n and (
            _is_wordchar(text[j])
            or (
                text[j] in ".+#"
                and j + 1 < n
                and (_is_wordchar(text[j + 1]) or text[j + 1] in "+#")
                and j > i
            )
        ):
            j += 1
        # trailing +/# suffixes (c++, c#) ARE part of the term
        while j < n and text[j] in "+#":
            j += 1
        if word_breaks and any(
            is_unbroken_script(ord(c)) for c in text[i:j]
        ):
            # SNIPPET_WORD_BREAKS: subdivide the span at UAX#29 word
            # boundaries so highlights align with word-break index terms
            # (break_words feeding the snippet scanner,
            # termgenerator_internal.cc:815-830)
            from xapian_spark.text.wordbreak import word_boundaries

            seg_text = text[i:j]
            b = word_boundaries(seg_text)
            for s0, s1 in zip(b, b[1:]):
                sub = parse_terms(seg_text[s0:s1])
                if sub:
                    out.append((i + s0, i + s1, sub[0]))
            i = j
            continue
        terms = parse_terms(text[i:j])
        if len(terms) == 1:
            out.append((i, j, terms[0]))
        elif terms:
            # mixed span (e.g. "example.com" -> two terms): subdivide at
            # non-word-character boundaries so each word highlights alone
            k = i
            while k < j:
                while k < j and not _is_wordchar(text[k]):
                    k += 1
                m0 = k
                while k < j and _is_wordchar(text[k]):
                    k += 1
                if m0 < k:
                    sub = parse_terms(text[m0:k])
                    if sub:
                        out.append((m0, k, sub[0]))
        i = j
    return out


def snippet(
    text: str,
    term_weights: dict[str, float],
    stems: dict[str, float] | None = None,
    stemmer=None,
    length: int = 500,
    flags: int = SNIPPET_BACKGROUND_MODEL,
    hi_start: str = "<b>",
    hi_end: str = "</b>",
    omit: str = "...",
    background_freq: dict[str, int] | None = None,
    doccount: int = 0,
) -> str:
    """Best-window snippet of *text* with query terms highlighted.

    term_weights: unstemmed query term -> relevance weight.
    stems: stem (WITHOUT the Z prefix) -> weight, matched via `stemmer`.
    background_freq/doccount: optional term->tf map for the background
    model's idf flavouring.
    """
    words = words_with_spans(
        text, word_breaks=bool(flags & SNIPPET_WORD_BREAKS)
    )
    stems = stems or {}
    max_tw = max(
        [w for w in term_weights.values()] + [w for w in stems.values()] + [0.0]
    )
    # reference scale-up so 0-weight query terms still highlight
    # (termgenerator_internal.cc: max_tw *= 1.015625 with 0 -> 1.0)
    max_tw = max_tw * 1.015625 if max_tw > 0 else 1.0

    def relevance(term: str) -> tuple[float, bool]:
        """(weight, is_query_match) for one normalized word."""
        if term in term_weights:
            return (term_weights[term] or max_tw, True)
        if stems and stemmer is not None:
            st = stemmer(term)
            if st in stems:
                return (stems[st] or max_tw, True)
        if flags & SNIPPET_BACKGROUND_MODEL:
            tf = (background_freq or {}).get(term, 0)
            if tf > 0 and doccount > 0:
                # small idf-ish background: rarer words make a more
                # interesting backdrop, never rivaling a real match
                return (
                    (max_tw / 64.0) * math.log1p(doccount / tf)
                    / math.log1p(doccount),
                    False,
                )
            return (0.0, False)
        return (0.0, False)

    scored = [(s, e, *relevance(t)) for s, e, t in words]
    matched = [i for i, (_, _, _, m) in enumerate(scored) if m]
    if not matched:
        if flags & SNIPPET_EMPTY_WITHOUT_MATCH:
            return ""
        if len(text.encode("utf-8")) <= length:
            return text
        # no match: lead of the text up to the byte budget, word-aligned
        end = 0
        for s, e, _, _ in scored:
            if len(text[:e].encode("utf-8")) > length:
                break
            end = e
        return text[:end] + omit if end < len(text) else text

    def span_bytes(lo: int, hi: int) -> int:
        return len(text[scored[lo][0]:scored[hi][1]].encode("utf-8"))

    # exhaustive best window: two-pointer over non-negative weights
    best = (-1.0, 0, 0)
    lo = 0
    acc = 0.0
    for hi in range(len(scored)):
        acc += scored[hi][2]
        while lo < hi and span_bytes(lo, hi) > length:
            acc -= scored[lo][2]
            lo += 1
        if span_bytes(lo, hi) <= length and acc > best[0] + 1e-12:
            best = (acc, lo, hi)
    if best[0] < 0:  # every single word overflows the budget
        return "" if flags & SNIPPET_EMPTY_WITHOUT_MATCH else omit
    _, lo, hi = best

    start, end = scored[lo][0], scored[hi][1]
    parts: list[str] = []
    if start > 0:
        parts.append(omit)
    cur = start
    for s, e, _, is_match in scored[lo:hi + 1]:
        parts.append(text[cur:s])
        if is_match:
            parts.append(hi_start + text[s:e] + hi_end)
        else:
            parts.append(text[s:e])
        cur = e
    if end < len(text):
        parts.append(omit)
    return "".join(parts)


def snippet_df(
    df,
    term_weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    length: int = 500,
    flags: int = SNIPPET_BACKGROUND_MODEL,
    hi_start: str = "<b>",
    hi_end: str = "</b>",
    omit: str = "...",
):
    """Batch highlighting over a DataFrame column: MSet::snippet applied to
    every row via mapInPandas (Arrow-batched; the snippet algorithm itself
    is a per-string scan, the same work the reference does per result in
    MSet::snippet — here it runs distributed over the corpus instead of
    driver-side per hit).  Returns (id_col, snippet)."""
    tw = dict(term_weights)

    def gen(batches):
        for pdf in batches:
            out = pdf[[id_col]].copy()
            out["snippet"] = [
                snippet(
                    t, tw, length=length, flags=flags,
                    hi_start=hi_start, hi_end=hi_end, omit=omit,
                )
                for t in pdf[text_col]
            ]
            yield out

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} long, snippet string"
    )
