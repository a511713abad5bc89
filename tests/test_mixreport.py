"""ops/mixreport.py — per-stratum mix report."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.mixreport import mix_report  # noqa: E402

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs back "
    "for more food in that big field because the day is long and warm "
    "so it keeps going for hours with many other things to chase around"
)


def test_per_stratum_counts_and_budget(spark):
    df = spark.createDataFrame(
        [
            (1, GOOD, "en"),
            (2, GOOD + " again today", "en"),
            (3, "too short", "en"),
            (4, GOOD, "fr"),
        ],
        ["docid", "text", "lang"],
    )
    out = {r.stratum: r for r in mix_report(df, "docid", "text").collect()}
    en, fr = out["en"], out["fr"]
    assert en.n_docs == 3 and en.n_kept == 2
    assert round(en.kept_frac, 6) == round(2 / 3, 6)
    assert fr.n_docs == 1 and fr.n_kept == 1 and fr.kept_frac == 1.0
    # kept_tokens excludes the rejected doc's tokens
    assert en.kept_tokens == en.total_tokens - 2
    assert fr.total_tokens == fr.kept_tokens == 41


def test_threshold_kwargs_forwarded(spark):
    df = spark.createDataFrame([(1, GOOD, "en")], ["docid", "text", "lang"])
    strict = mix_report(df, "docid", "text", min_tokens=50).collect()[0]
    assert strict.n_kept == 0 and strict.kept_tokens == 0
