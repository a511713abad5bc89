"""ops/chunking.py — fixed-token windows with overlap."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.chunking import chunk_documents  # noqa: E402

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "docid", (F.col("doc_id") + 1).cast("long")
    )


def test_chunk_shapes_and_coverage(spark):
    out = chunk_documents(
        _docs(spark), content_col="text", id_col="docid",
        chunk_tokens=16, overlap=4,
    ).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["docid"], []).append(r)
    docs = {
        r["docid"]: r["text"].lower().split()
        for r in _docs(spark).collect()
    }
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = docs[d]
        n = len(toks)
        stride = 12
        # chunk ids dense from 0; starts while start < n
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert len(rows) == (n + stride - 1) // stride
        seen = []
        for k, r in enumerate(rows):
            start = k * stride
            want = toks[start:start + 16]
            assert r["chunk_text"].split() == want
            assert r["n_tokens"] == len(want) > 0
            seen.extend(want if k == 0 else want[4:] if start + 4 <= n else [])
        # full-coverage reconstruction: stripping each later chunk's
        # 4-token overlap re-yields the original token stream
        recon = rows[0]["chunk_text"].split()
        for r in rows[1:]:
            recon.extend(r["chunk_text"].split()[4:])
        assert recon == toks
    # every doc with tokens is chunked
    assert set(by_doc) == {d for d, t in docs.items() if t}


def test_chunk_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, " ".join(["w"] * 16))],
        "docid long, text string",
    )
    rows = chunk_documents(
        df, content_col="text", id_col="docid", chunk_tokens=16, overlap=4
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["docid"], []).append(r)
    # short doc -> one short chunk; empty doc -> none; exact fit -> one
    assert [r["n_tokens"] for r in by_doc[1]] == [3]
    assert 2 not in by_doc
    # 16 tokens with stride 12: starts 0 and 12 (12 <= 15), second short
    assert [r["n_tokens"] for r in by_doc[3]] == [16, 4]


def test_chunk_param_validation(spark):
    df = spark.createDataFrame([(1, "a")], "docid long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
