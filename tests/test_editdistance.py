"""Restricted Damerau-Levenshtein parity with the reference's
transposition-aware edit distance (api/editdistance.cc)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from xapian_spark.text.editdistance import osa_distance


def test_basics():
    assert osa_distance("", "") == 0
    assert osa_distance("abc", "") == 3
    assert osa_distance("", "abc") == 3
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("kitten", "sitting") == 3


def test_transpositions_single_edit():
    # the signature case the reference handles (editdistance.cc:108-128)
    assert osa_distance("teh", "the") == 1
    assert osa_distance("dpu", "dup") == 1
    assert osa_distance("abcd", "abdc") == 1
    assert osa_distance("abcd", "badc") == 2
    # non-adjacent swap is NOT one transposition
    assert osa_distance("abc", "cba") == 2


def test_osa_vs_levenshtein_bounds():
    # osa <= lev <= 2*osa (the prefilter's correctness relation)
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pairs = [("teh", "the"), ("abcd", "badc"), ("abc", "xyz"),
             ("hello", "hlelo"), ("spark", "sprak")]
    for a, b in pairs:
        o, v = osa_distance(a, b), lev(a, b)
        assert o <= v <= 2 * o or (o == v == 0)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcd", max_size=8), st.text(alphabet="abcd", max_size=8))
def test_metric_properties(a, b):
    d = osa_distance(a, b)
    assert d == osa_distance(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
