"""Tokenizer parity tests.

Golden expectations transcribed from the reference test table
(`xapian-core/tests/api_termgen.cc:88-140`, STEM_NONE cases) plus
differential tests between the exact state machine and the ASCII regex
fast path.
"""

from __future__ import annotations

import random

import pytest

from xapian_spark.text.tokenizer import (
    _parse_terms_ascii,
    _parse_terms_slow,
    parse_terms,
    parse_terms_simple,
    tokenize_with_positions,
)

GOLDEN = [
    # (text, expected term sequence) — positions are 1..n in order.
    ("simple-example", ["simple", "example"]),
    ("I.B.M.", ["ibm"]),
    ("I.B.M", ["ibm"]),
    ("I.B.", ["ib"]),
    ("I.B", ["ib"]),
    ("I.", ["i"]),
    ("I.B.M. P.C.", ["ibm", "pc"]),
    ("I.B.M P.C.", ["ibm", "pc"]),
    ("1.0 1000,000.99 0.9.9,", ["1.0", "1000,000.99", "0.9.9"]),
    (
        "Pi is 3.1415926536 approximately",
        ["pi", "is", "3.1415926536", "approximately"],
    ),
    ("hello World Test", ["hello", "world", "test"]),
    ("time_t", ["time_t"]),
    ("stock -cooking", ["stock", "cooking"]),
    ("d- school report", ["d", "school", "report"]),
    ("gtk+ -gnome", ["gtk+", "gnome"]),
    ("c++ -d--", ["c++", "d"]),
    ("AT&T", ["at&t"]),
    ("M&S", ["m&s"]),
    ("fish+chips", ["fish", "chips"]),
    ("c++++", ["c"]),
    ("c+++", ["c+++"]),
    ("C#", ["c#"]),
    ("C#++", ["c#++"]),
    ("U.N.C.L.E", ["uncle"]),
    # Unicode apostrophe folding (check_infix: 0x2019 -> ')
    ("don’t", ["don't"]),
    ("don't", ["don't"]),
    # zero-width chars are ignored as joiners
    ("foo\u200bbar", ["foobar"]),
    # non-ASCII word chars
    ("café APRÈS", ["café", "après"]),
    ("naïve", ["naïve"]),
]


@pytest.mark.parametrize("text,want", GOLDEN)
def test_golden_terms(text, want):
    assert parse_terms(text) == want


@pytest.mark.parametrize("text,want", [(t, w) for t, w in GOLDEN if t.isascii()])
def test_ascii_fast_path_matches_slow(text, want):
    assert _parse_terms_ascii(text) == _parse_terms_slow(text) == want


def test_differential_random_ascii():
    alpha = "aB.C,&'+# 19_;x-Z /\t"
    rng = random.Random(7)
    for _ in range(5000):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        assert _parse_terms_ascii(s) == _parse_terms_slow(s), repr(s)


def test_positions_skip_overlong_terms():
    long_word = "x" * 70
    toks = tokenize_with_positions(f"alpha {long_word} beta")
    assert toks == [("alpha", 1), ("beta", 2)]


def test_positions_skip_stopwords():
    toks = tokenize_with_positions(
        "the quick fox", stopwords=frozenset({"the"})
    )
    assert toks == [("quick", 1), ("fox", 2)]


def test_max_term_bytes_is_utf8_bytes():
    # 33 two-byte chars = 66 bytes > 64 -> dropped
    term = "é" * 33
    assert tokenize_with_positions(term) == []
    # 32 two-byte chars = 64 bytes -> kept
    term = "é" * 32
    assert tokenize_with_positions(term) == [(term, 1)]


def test_simple_mode():
    assert parse_terms_simple("Hello, C++ world_1!") == [
        "hello", "c", "world_1"
    ]
