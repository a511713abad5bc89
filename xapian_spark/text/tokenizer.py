"""Xapian-semantics tokenizer, PySpark-native.

Re-implements the *behavior* of the reference tokenizer
(`xapian-core/queryparser/termgenerator_internal.cc:181-279`, `parse_terms`)
from scratch in Python:

- word characters = Unicode categories Lu Ll Lt Lm Lo Mn Me Mc Nd Nl No Pc
  (`xapian-core/include/xapian/unicode.h:358-373`)
- per-codepoint lowercase folding (`termgenerator_internal.cc:56-61`)
- acronyms of '.'-separated ASCII capitals: ``U.N.C.L.E`` -> ``uncle``
  (`termgenerator_internal.cc:197-216`)
- infix joiners ``' & \xb7 ״ ‧`` plus Unicode apostrophes between word
  chars (`check_infix`, `termgenerator_internal.cc:80-96`)
- digit-infix ``, . ;`` (+ Unicode list) between digits
  (`check_infix_digit`, `termgenerator_internal.cc:98-119`)
- trailing ``+`` / ``#`` kept up to 3, dropped if followed by a word char
  (`check_suffix` `:126-132`, guard `:259-273`)
- terms longer than 64 bytes UTF-8 are dropped and do not consume a
  position (`termgenerator_internal.h:44`, action at `:317`)

Two execution paths, identical output (differential-tested):

- ``_parse_terms_slow``: exact port of the state machine (any input).
- ``_ASCII_TOKEN_RE``: a single compiled regex equivalent for pure-ASCII
  strings — the hot path inside Arrow-batched pandas UDFs; no per-codepoint
  Python in the common case.

A separate ``simple`` mode (lowercase + split on ``[^a-z0-9_]+``) exists so
query results can be reproduced exactly by an ANSI-SQL oracle (DuckDB).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable

MAX_TERM_BYTES = 64  # reference: termgenerator_internal.h:44

_WORDCHAR_CATS = frozenset(
    ("Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Me", "Mc", "Nd", "Nl", "No", "Pc")
)

_INFIX_KEEP = "'&\u00b7\u05f4\u2027"
_INFIX_APOS = "\u2019\u201b"
_IGNORE_CHARS = "\u200b\u200c\u200d\u2060\ufeff"
_INFIX_DIGIT = ",.;\u037e\u0589\u060d\u07f8\u2044\ufe10\ufe13\ufe14"

_IGNORE = "\x00"  # sentinel: join with no joiner character

# Scripts written without explicit word breaks (CJK, Thai, Lao, Khmer,
# Myanmar, Hangul...): last codepoint of each alternating out/in range —
# binary-chop parity test, re-derived from the reference's table
# (queryparser/word-breaker.cc:50-134 `is_unbroken_script`).
_UNBROKEN_SPLITS = (
    0x0E00 - 1, 0x0EFF,    # Thai, Lao
    0x1000 - 1, 0x109F,    # Myanmar
    0x1100 - 1, 0x11FF,    # Hangul Jamo
    0x1780 - 1, 0x17FF,    # Khmer
    0x19E0 - 1, 0x19FF,    # Khmer Symbols
    0x2E80 - 1, 0x9FFF,    # CJK radicals..ideographs, kana, bopomofo
    0xA700 - 1, 0xA71F,    # Modifier Tone Letters
    0xA960 - 1, 0xA97F,    # Hangul Jamo Extended-A
    0xA9E0 - 1, 0xA9FF,    # Myanmar Extended-B
    0xAA60 - 1, 0xAA7F,    # Myanmar Extended-A
    0xAC00 - 1, 0xD7FF,    # Hangul Syllables + Jamo Extended-B
    0xF900 - 1, 0xFAFF,    # CJK Compatibility Ideographs
    0xFE30 - 1, 0xFE4F,    # CJK Compatibility Forms
    0xFF65 - 1, 0xFFDC,    # Halfwidth Katakana and Hangul
    0x1AFF0 - 1, 0x1B16F,  # Kana Extended/Supplement
    0x1F200 - 1, 0x1F2FF,  # Enclosed Ideographic Supplement
    0x20000 - 1, 0x2A6DF,  # CJK Ext B
    0x2A700 - 1, 0x2EE5F,  # CJK Ext C-F, I
    0x2F800 - 1, 0x2FA1F,  # CJK Compat Ideographs Supplement
    0x30000 - 1, 0x323AF,  # CJK Ext G-H
)


def is_unbroken_script(cp: int) -> bool:
    """True for codepoints in scripts written without word breaks."""
    from bisect import bisect_left

    return bool(bisect_left(_UNBROKEN_SPLITS, cp) & 1)


def _is_unbroken_wordchar(ch: str) -> bool:
    return is_unbroken_script(ord(ch)) and _is_wordchar(ch)


def _is_wordchar(ch: str) -> bool:
    return unicodedata.category(ch) in _WORDCHAR_CATS


def _tolower(ch: str) -> str:
    low = ch.lower()
    # Xapian folds per-codepoint (simple case mapping); Python's str.lower is
    # the full mapping — fall back to identity when they diverge (1 -> n chars).
    return low if len(low) == 1 else ch


def _check_wordchar(ch: str) -> str:
    return _tolower(ch) if _is_wordchar(ch) else ""


def _check_infix(ch: str) -> str:
    if ch in _INFIX_KEEP:
        return ch
    if ch in _INFIX_APOS:
        return "'"
    if ch in _IGNORE_CHARS:
        return _IGNORE
    return ""


def _check_infix_digit(ch: str) -> str:
    if ch in _INFIX_DIGIT:
        return ch
    if ch in _IGNORE_CHARS:
        return _IGNORE
    return ""


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def _scan_tokens(s: str, ngrams: bool = False):
    """Structured scan: yields ("w", term) for normal words and
    ("run", [chars]) for maximal runs of unbroken-script word chars (CJK
    etc.) when ngrams is on — the reference's parse_terms with
    FLAG_NGRAMS (termgenerator_internal.cc:218-236: a run is handed to
    break_words, and an unbroken-script char terminates an in-progress
    word immediately, skipping suffix handling)."""
    n = len(s)
    i = 0
    while True:
        while i < n and not _is_wordchar(s[i]):
            i += 1
        if i >= n:
            return

        if ngrams and _is_unbroken_wordchar(s[i]):
            chars: list[str] = []
            while i < n and _is_unbroken_wordchar(s[i]):
                chars.append(s[i])
                i += 1
            yield ("run", chars)
            continue

        term: list[str] = []

        # Acronyms: '.'-separated ASCII capitals (>= 2 letters), not followed
        # by a word char.
        if "A" <= s[i] <= "Z":
            p = i
            term.append(_tolower(s[p]))
            p += 1
            while p < n and s[p] == ".":
                p += 1
                if p < n and "A" <= s[p] <= "Z":
                    term.append(_tolower(s[p]))
                    p += 1
                else:
                    break
            if len(term) > 1 and (p >= n or not _is_wordchar(s[p])):
                i = p
                yield ("w", "".join(term))
                continue
            term = []

        ch = _check_wordchar(s[i])
        ended = False
        prevch = ""
        while True:
            while ch:
                term.append(ch)
                prevch = ch
                i += 1
                if i >= n:
                    ended = True
                    break
                if ngrams and is_unbroken_script(ord(s[i])):
                    # unbroken-script char ends the word immediately (no
                    # suffix handling; termgenerator_internal.cc:233-235)
                    ended = True
                    break
                ch = _check_wordchar(s[i])
            if ended:
                break
            # s[i] is a non-wordchar; look one ahead for an infix join.
            if i + 1 >= n:
                break
            nextch = _check_wordchar(s[i + 1])
            if not nextch:
                break
            if _is_digit(prevch) and _is_digit(s[i + 1]):
                infix = _check_infix_digit(s[i])
            else:
                infix = _check_infix(s[i])
            if not infix:
                break
            if infix != _IGNORE:
                term.append(infix)
            ch = nextch
            i += 1

        if not ended:
            # Trailing '+' / '#': keep up to 3, drop all if >3 or if a word
            # char follows (don't index fish+chips as fish+ chips).
            keep = len(term)
            count = 0
            while i < n and s[i] in "+#":
                count += 1
                if count > 3:
                    del term[keep:]
                    break
                term.append(s[i])
                i += 1
                if i >= n:
                    ended = True
                    break
            if not ended and i < n and _is_wordchar(s[i]):
                del term[keep:]

        yield ("w", "".join(term))


def _parse_terms_slow(s: str) -> list[str]:
    """Exact re-implementation of parse_terms (no stemming, no word
    breaks): flat term list, unbroken scripts treated as ordinary word
    chars (the reference's behavior with FLAG_NGRAMS off)."""
    return [t for _, t in _scan_tokens(s, ngrams=False)]


def ngram_tokens(chars: list[str]) -> list[tuple[str, bool]]:
    """NgramIterator emission order (word-breaker.cc:153-186) for one
    unbroken run: [(token, is_unigram)] = c1, c1c2, c2, c2c3, ..., cn.
    Unigrams are positional; bigrams are wdf-only."""
    out: list[tuple[str, bool]] = []
    for j, c in enumerate(chars):
        out.append((c, True))
        if j + 1 < len(chars):
            out.append((c + chars[j + 1], False))
    return out


# --- fast path: compiled-regex equivalent for pure-ASCII input -------------

_A_WORD = r"[A-Za-z0-9_]"
_ASCII_TOKEN_RE = re.compile(
    # acronym: >=2 '.'-separated capitals; trailing '.' consumed if present;
    # next char must not be a word char
    rf"(?P<acro>[A-Z](?:\.[A-Z])+)(?:\.(?!{_A_WORD})|(?![A-Za-z0-9_.]))"
    r"|"
    # normal term: word runs joined by digit-infix [.,;] or ['&] (not
    # digit-digit), then up to 3 trailing +/# not followed by a word char
    rf"(?P<term>{_A_WORD}+"
    rf"(?:(?:(?<=[0-9])[.,;](?=[0-9])|(?<![0-9])['&](?={_A_WORD})|['&](?=[A-Za-z_]))"
    rf"{_A_WORD}+)*)"
    rf"(?P<suffix>[+#]{{1,3}}(?![A-Za-z0-9_+#]))?"
)


def _parse_terms_ascii(s: str) -> list[str]:
    out: list[str] = []
    for m in _ASCII_TOKEN_RE.finditer(s):
        acro = m.group("acro")
        if acro is not None:
            out.append(acro.replace(".", "").lower())
        else:
            out.append((m.group("term") + (m.group("suffix") or "")).lower())
    return out


def parse_terms(text: str) -> list[str]:
    """All terms of *text* in order, Xapian ``parse_terms`` semantics.

    Includes over-long terms; callers apply the 64-byte filter (which also
    controls position assignment).
    """
    if text.isascii():
        return _parse_terms_ascii(text)
    return _parse_terms_slow(text)


_SIMPLE_RE = re.compile(r"[a-z0-9_]+")


def parse_terms_simple(text: str) -> list[str]:
    """``simple`` mode: lowercase + runs of [a-z0-9_]. SQL-oracle-reproducible
    (DuckDB: ``regexp_extract_all(lower(text), '[a-z0-9_]+')``)."""
    return _SIMPLE_RE.findall(text.lower())


def tokenize_with_positions(
    text: str,
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    ngrams: bool = True,
    word_breaks: bool = False,
) -> list[tuple[str, int | None]]:
    """(term, position) pairs; positions start at 1.

    Terms longer than 64 bytes UTF-8 are dropped and do not consume a
    position; STOP_ALL stopwords likewise
    (reference: termgenerator_internal.cc:296-316,317).

    ngrams: unbroken-script runs (CJK, Thai, ...) emit positional unigrams
    and positionless bigrams (position None, wdf-only) — FLAG_NGRAMS
    semantics (word-breaker.cc NgramIterator; api_termgen.cc "ngrams"
    goldens).  Divergence by design: the reference gates this behind
    FLAG_NGRAMS / $XAPIAN_CJK_NGRAM and defaults OFF; a multilingual
    100 TB corpus should be searchable out of the box, so we default ON
    (pass ngrams=False for reference-default behavior).

    word_breaks: FLAG_WORD_BREAKS (queryparser.h:637; break_words,
    termgenerator_internal.cc:136-172) — unbroken-script runs are
    segmented by UAX#29 default word-boundary rules into positional word
    tokens instead of n-grams (see text/wordbreak.py for the
    dictionary-less scope note).  Takes precedence over ngrams, like the
    reference's ICU path does.
    """
    if mode != "xapian":
        toks = [(t, True) for t in parse_terms_simple(text)]
    elif word_breaks and not text.isascii():
        from xapian_spark.text.wordbreak import word_tokens

        toks = []
        for kind, val in _scan_tokens(text, ngrams=True):
            if kind == "w":
                toks.append((val, True))
            else:
                # every segment of an unbroken run is positional, exactly
                # like the reference's WordIterator tokens (break_words
                # calls action(token, with_positions, ...))
                toks.extend(
                    (seg, True) for seg in word_tokens("".join(val))
                )
    elif ngrams and not text.isascii():
        toks = []
        for kind, val in _scan_tokens(text, ngrams=True):
            if kind == "w":
                toks.append((val, True))
            else:
                toks.extend(ngram_tokens(val))
    else:
        toks = [(t, True) for t in parse_terms(text)]
    out: list[tuple[str, int | None]] = []
    pos = 0
    for t, positional in toks:
        if len(t.encode("utf-8")) > MAX_TERM_BYTES:
            continue
        if stopwords is not None and t in stopwords:
            continue
        if positional:
            pos += 1
            out.append((t, pos))
        else:
            out.append((t, None))
    return out


def tokenize_batch(
    texts: Iterable[str],
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    word_breaks: bool = False,
) -> list[list[tuple[str, int]]]:
    return [
        tokenize_with_positions(
            t or "", mode=mode, stopwords=stopwords, word_breaks=word_breaks
        )
        for t in texts
    ]


_SHOULD_STEM_CATS = frozenset(("Ll", "Lt", "Lm", "Lo"))


def should_stem(term: str) -> bool:
    """Stem only terms starting with a (lower/title/modifier/other-case)
    letter (reference `should_stem`, termgenerator_internal.cc:64-73) —
    i.e. skip digit-initial terms."""
    if not term:
        return False
    ch = term[0]
    if "a" <= ch <= "z":  # ASCII fast path
        return True
    if "0" <= ch <= "9":
        return False
    return unicodedata.category(ch) in _SHOULD_STEM_CATS


def invert_doc(
    text: str,
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    stemmer=None,
    strategy: str = "some",
    stop_mode: str = "all",
    word_breaks: bool = False,
) -> tuple[list[tuple[str, int, list[int]]], int]:
    """Per-document termlist: -> ([(term, wdf, positions)], doclen).

    Mirrors TermGenerator::Internal::index_text strategy handling
    (termgenerator_internal.cc:318-362):

    - strategy "none" (or stemmer None): unstemmed positional terms only.
    - "some" (reference default with a stemmer): unstemmed positional terms
      PLUS positionless `Z`-prefixed stems, one wdf increment each — so
      doclen counts both, as the reference's termlist-wdf sum does.
    - "some_full_pos": like "some" but the Z-terms keep positions.
    - "all": each token replaced by its stem (no Z prefix), positional.
    - "all_z": like "all" with the Z prefix.

    stop_mode "all" removes stopworded tokens from the stream (STOP_ALL);
    "stemmed" keeps them unstemmed but suppresses their Z-stems
    (STOP_STEMMED, termgenerator_internal.cc:338-341); "none" ignores the
    stopword list.
    """
    stream_stop = stopwords if stop_mode == "all" else None
    toks = tokenize_with_positions(
        text or "", mode=mode, stopwords=stream_stop,
        word_breaks=word_breaks,
    )
    if stemmer is not None and strategy in ("all", "all_z"):
        pre = "Z" if strategy == "all_z" else ""
        toks = [(pre + stemmer(t), p) for t, p in toks]
    # ngram bigrams arrive with position None: they add wdf (and doclen)
    # without a positional posting (doc.add_term vs add_posting,
    # termgenerator_internal.cc:320-326)
    wdf_acc: dict[str, int] = {}
    pos_acc: dict[str, list[int]] = {}
    for t, p in toks:
        wdf_acc[t] = wdf_acc.get(t, 0) + 1
        if p is not None:
            pos_acc.setdefault(t, []).append(p)
    entries = [(t, w, pos_acc.get(t, [])) for t, w in wdf_acc.items()]
    if stemmer is not None and strategy in ("some", "some_full_pos"):
        zwdf: dict[str, int] = {}
        zpos: dict[str, list[int]] = {}
        for t, w in wdf_acc.items():
            if stop_mode == "stemmed" and stopwords and t in stopwords:
                continue
            if not should_stem(t):
                continue
            s = stemmer(t)
            if not s:
                continue
            zwdf["Z" + s] = zwdf.get("Z" + s, 0) + w
            zpos.setdefault("Z" + s, []).extend(pos_acc.get(t, []))
        if strategy == "some":
            entries += [(zt, w, []) for zt, w in zwdf.items()]
        else:
            entries += [(zt, w, sorted(zpos.get(zt, []))) for zt, w in zwdf.items()]
    doclen = sum(w for _, w, _ in entries)
    return entries, doclen
