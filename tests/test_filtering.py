"""ops/filtering.py — composite quality filter."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.filtering import quality_filter  # noqa: E402

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs back "
    "for more food in that big field because the day is long and warm "
    "so it keeps going for hours with many other things to chase around"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["docid", "text"]
    )
    return {r.id: r for r in quality_filter(df, "docid", "text", **kw).collect()}


def test_verdicts_and_rule_order(spark):
    out = _run(
        spark,
        [
            GOOD,                                   # keep
            "short text",                           # too_short
            " ".join(f"word{i}" for i in range(40)),  # no_stopwords
            ("the cat " * 25).strip(),              # repetitive 2-gram...
        ],
    )
    assert out[0].reject_reason == "keep" and out[0].keep == 1
    assert out[1].reject_reason == "too_short" and out[1].keep == 0
    assert out[2].reject_reason == "no_stopwords"
    # doc 3 has 50 tokens and top_2gram_frac ~1.0, but rule ORDER puts
    # repetitive_2gram after the earlier gates it passes
    assert out[3].reject_reason == "repetitive_2gram"


def test_too_long_and_mean_len(spark):
    out = _run(
        spark,
        [" ".join(["word"] * 60)],
        max_tokens=50,
    )
    assert out[0].reject_reason == "too_long"
    out = _run(spark, [("a b c d " * 10 + "the is in it of ").strip()])
    assert out[0].reject_reason == "mean_token_len"  # mean len < 3


def test_every_doc_gets_a_row(spark):
    out = _run(spark, [GOOD, "", "x"])
    assert len(out) == 3
    assert out[1].reject_reason == "too_short" and out[1].n_tokens == 0


def test_thresholds_are_parameters(spark):
    out = _run(spark, [GOOD])  # 41 tokens
    assert out[0].reject_reason == "keep"
    out = _run(spark, [GOOD], min_tokens=50)
    assert out[0].reject_reason == "too_short"
