"""ops/diversify.py mmr_select / mmr_rerank — MMR diversification."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.diversify import mmr_rerank, mmr_select  # noqa: E402


def test_first_pick_is_top_relevance():
    rows = [(1, 5.0), (2, 4.0), (3, 3.0)]
    vecs = {1: [1.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0]}
    assert mmr_select(rows, vecs, k=1)[0] == 1


def test_diversity_beats_redundancy():
    # doc 2 is a clone of doc 1; doc 3 is orthogonal with slightly lower
    # relevance — MMR must pick 3 second despite 2's higher score.
    rows = [(1, 1.0), (2, 0.99), (3, 0.9)]
    vecs = {1: [1.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0]}
    assert mmr_select(rows, vecs, k=3) == [1, 3, 2]


def test_lambda_one_is_pure_relevance():
    rows = [(1, 3.0), (2, 2.0), (3, 1.0)]
    vecs = {i: [1.0, 0.0] for i in (1, 2, 3)}  # all identical
    assert mmr_select(rows, vecs, k=3, lambda_=1.0) == [1, 2, 3]


def test_ties_break_by_original_rank():
    rows = [(4, 2.0), (7, 2.0), (9, 2.0)]
    vecs = {i: [0.0, 0.0] for i in (4, 7, 9)}  # zero vectors: sim 0
    assert mmr_select(rows, vecs, k=3) == [4, 7, 9]


def test_k_capped_and_empty():
    rows = [(1, 1.0)]
    vecs = {1: [1.0]}
    assert mmr_select(rows, vecs, k=5) == [1]
    assert mmr_select([], {}, k=5) == []


def test_rerank_dataframe_roundtrip(spark):
    mset = spark.createDataFrame(
        [(1, 1.0), (2, 0.99), (3, 0.9)], "docid long, score double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "docid long, embedding array<double>",
    )
    out = mmr_rerank(mset, emb, k=3, lambda_=0.5).orderBy("mmr_rank").collect()
    assert [r.docid for r in out] == [1, 3, 2]
    assert [r.mmr_rank for r in out] == [1, 2, 3]
    assert out[0].score == 1.0
