"""ops/repetition.py — Gopher-style within-document repetition stats."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.repetition import repetition_stats  # noqa: E402


def _run(spark, rows):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["docid", "text"]
    )
    return {r.id: r for r in repetition_stats(df, "docid", "text").collect()}


def test_clean_doc_all_zero(spark):
    r = _run(spark, ["one two three four five six seven eight nine ten"])[0]
    assert r.n_tokens == 10 and r.n_lines == 1
    assert r.dup_line_frac == 0.0 and r.dup_line_char_frac == 0.0
    # every 2/3/4-gram unique: top fracs are a single occurrence's share
    assert r.top_2gram_frac == round(2 / 10, 6)
    assert r.top_3gram_frac == round(3 / 10, 6)
    assert r.dup_5gram_frac == 0.0


def test_duplicate_lines(spark):
    r = _run(spark, ["same line here\nsame line here\nother text now"])[0]
    # 3 lines, 2 distinct -> dup_line_frac = 1/3
    assert r.n_lines == 3
    assert r.dup_line_frac == round(1 / 3, 6)
    # copies beyond first: one copy of "same line here" (14 chars) over
    # 14*2 + 14 = 42 total line chars
    assert r.dup_line_char_frac == round(14 / 42, 6)


def test_top_ngram_fraction(spark):
    # "a b" occurs 3 times in "a b a b a b": n_tokens=6, max2=3
    r = _run(spark, ["a b a b a b"])[0]
    assert r.n_tokens == 6
    assert r.top_2gram_frac == 1.0  # 3 * 2 / 6


def test_dup_5gram_fraction(spark):
    # 10 tokens of the same word: six 5-grams, one distinct
    r = _run(spark, ["w w w w w w w w w w"])[0]
    assert r.dup_5gram_frac == round(5 / 6, 6)


def test_short_and_empty_docs(spark):
    out = _run(spark, ["a b", ""])
    assert out[0].n_tokens == 2 and out[0].dup_5gram_frac == 0.0
    assert out[1].n_tokens == 0 and out[1].n_lines == 0
    assert out[1].top_2gram_frac == 0.0
    assert len(out) == 2  # empty doc still gets a row


def test_blank_lines_ignored(spark):
    a = _run(spark, ["x y z\n\n\nx y z"])[0]
    assert a.n_lines == 2 and a.dup_line_frac == 0.5


def test_literal_separator_with_metachars(spark):
    """line_sep is a LITERAL separator: '.' must split on dots, not on
    every character (the un-escaped Java-regex behavior)."""
    from xapian_spark.ops.repetition import repetition_stats

    docs = spark.createDataFrame(
        [(1, "x y z.x y z.q r s")], ["docid", "text"]
    )
    r = repetition_stats(docs, "docid", "text", line_sep=".").collect()[0]
    assert r.n_lines == 3 and r.dup_line_frac == round(1 / 3, 6)
