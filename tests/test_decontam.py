"""ops/decontam.py — benchmark n-gram decontamination."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.decontam import benchmark_ngrams, decontaminate  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["docid", "text"]
    )


def test_overlap_flags_and_counts(spark):
    docs = _docs(
        spark,
        [
            "a b c d e f g h i j",        # contains bench gram a..h and b..i
            "x y z a b c d e f g h",      # contains a..h shifted
            "totally different words here with no overlap at all ok",
            "a b c",                      # too short for 8-grams
        ],
    )
    bench = spark.createDataFrame(
        [("a b c d e f g h i",)], ["text"]
    )  # grams: a..h, b..i
    out = {r.id: r for r in decontaminate(docs, bench, "docid", "text").collect()}
    assert out[0].n_ngrams == 3 and out[0].n_contaminated == 2
    assert out[0].contaminated == 1
    assert out[1].n_contaminated == 1 and out[1].contaminated == 1
    assert out[2].n_contaminated == 0 and out[2].contaminated == 0
    assert out[3].n_ngrams == 0 and out[3].contamination_frac == 0.0
    assert len(out) == 4  # every doc gets a row


def test_case_and_tokenization_normalized(spark):
    docs = _docs(spark, ["The Quick BROWN fox jumps over the lazy dog!"])
    bench = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], ["text"]
    )
    out = decontaminate(docs, bench, "docid", "text").collect()[0]
    assert out.contaminated == 1


def test_benchmark_grams_distinct(spark):
    bench = spark.createDataFrame(
        [("a b c d e f g h",), ("a b c d e f g h",)], ["text"]
    )
    assert benchmark_ngrams(bench, "text", 8).count() == 1


def test_layout_independent(spark):
    docs = _docs(spark, [f"tok{i} " * 20 for i in range(40)])
    bench = spark.createDataFrame([("tok3 " * 20,)], ["text"])
    a = sorted(
        (r.id, r.n_contaminated)
        for r in decontaminate(docs, bench, "docid", "text").collect()
    )
    b = sorted(
        (r.id, r.n_contaminated)
        for r in decontaminate(
            docs.repartition(7), bench, "docid", "text"
        ).collect()
    )
    assert a == b


def test_benchmark_side_broadcasts(spark):
    """The corpus must never shuffle for the match: the join against the
    benchmark grams has to be a broadcast hash join."""
    docs = _docs(spark, ["a b c d e f g h i j"] * 5)
    bench = spark.createDataFrame([("a b c d e f g h",)], ["text"])
    plan = (
        decontaminate(docs, bench, "docid", "text")
        ._jdf.queryExecution().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_broadcast_hits_false_equivalent(spark):
    """broadcast_hits=False (the benchmark-heavy-corpus fallback) must
    produce identical rows via a plain shuffled left join."""
    docs = _docs(
        spark,
        ["a b c d e f g h i j", "k l m n o p q r s t", "a b c d e f g h x y"],
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], ["text"])
    a = sorted(
        (r.id, r.n_contaminated, r.contaminated)
        for r in decontaminate(docs, bench, "docid", "text").collect()
    )
    b = sorted(
        (r.id, r.n_contaminated, r.contaminated)
        for r in decontaminate(
            docs, bench, "docid", "text", broadcast_hits=False
        ).collect()
    )
    assert a == b
