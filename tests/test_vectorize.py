"""ops/vectorize.py — hashed TF-IDF document vectors."""

from __future__ import annotations

import math
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.vectorize import hashed_tfidf, to_dense  # noqa: E402

DOCS = [
    (1, "spark index merge fast fast"),
    (2, "spark index merge fast fast"),          # exact dup of 1
    (3, "totally unrelated words entirely here"),
    (4, ""),                                     # zero tokens
]


def _sparse(spark, dim=16):
    df = spark.createDataFrame(DOCS, ["docid", "text"])
    return hashed_tfidf(df, "docid", "text", dim=dim)


def test_identical_docs_identical_vectors(spark):
    rows = _sparse(spark).collect()
    v1 = sorted((r.bucket, r.weight) for r in rows if r.id == 1)
    v2 = sorted((r.bucket, r.weight) for r in rows if r.id == 2)
    assert v1 == v2 and v1


def test_zero_token_doc_has_no_rows_and_bucket_range(spark):
    rows = _sparse(spark, dim=16).collect()
    assert not [r for r in rows if r.id == 4]
    assert all(0 <= r.bucket < 16 for r in rows)


def test_idf_weighting(spark):
    # 'spark' appears in docs 1,2 (df=2); 'unrelated' only in 3 (df=1):
    # with N=4, |weight| ratio for tf=1 terms must be ln(5/2) vs ln(5/2)
    # ... and rarer terms get larger idf
    df = spark.createDataFrame(
        [(1, "common rare"), (2, "common"), (3, "common")],
        ["docid", "text"],
    )
    rows = hashed_tfidf(df, "docid", "text", dim=64, signed=False).collect()
    w = {(r.id, r.bucket): r.weight for r in rows}
    weights_doc1 = sorted(abs(r.weight) for r in rows if r.id == 1)
    # rare: ln(4/2), common: ln(4/4)=0 -> filtered out entirely
    assert weights_doc1 == [round(math.log(2.0), 6)]
    assert w  # something survived


def test_deterministic_and_layout_independent(spark):
    df = spark.createDataFrame(DOCS, ["docid", "text"])
    a = sorted(map(tuple, hashed_tfidf(df, "docid", "text", 16).collect()))
    b = sorted(
        map(
            tuple,
            hashed_tfidf(df.repartition(7), "docid", "text", 16).collect(),
        )
    )
    assert a == b


def test_to_dense_round_trip(spark):
    sp = _sparse(spark, dim=16)
    dense = {r.id: list(r.embedding) for r in to_dense(sp, dim=16).collect()}
    sparse = {(r.id, r.bucket): r.weight for r in sp.collect()}
    for (i, b), wt in sparse.items():
        assert dense[i][b] == wt
    assert all(len(v) == 16 for v in dense.values())


def test_feeds_cosine_topk(spark):
    """End-to-end composition: text -> hashed vectors -> exact cosine ANN
    finds the duplicate doc as nearest neighbor with cosine ~1."""
    from xapian_spark.ops.similarity import cosine_topk

    emb = to_dense(_sparse(spark, dim=16), dim=16).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    out = cosine_topk(emb, emb.where(F.col("vec_id") == 1), k=1)
    row = out.collect()[0]
    assert row.neighbor_id == 2
    assert abs(row.cosine - 1.0) < 1e-9
