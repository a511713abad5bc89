"""Rank + score identity against xapian-core's OWN published expectations.

The reference's api_weight.cc testcases run against databases built by the
test harness (`tests/harness/index_utils.cc`): paragraphs of
`tests/testdata/apitest_*.txt` become documents; each whitespace-separated
word is munged (keep alphanumerics, lowercased) and stemmed with the
Snowball English stemmer, then indexed with one posting per occurrence.
The expected weights in api_weight.cc are literal doubles "calculated
manually from the statistics of the test database".

Here we rebuild those exact databases with OUR engine (same munge, our
Porter2 stemmer, docids in paragraph order) and assert the SAME literal
expectations — genuine score identity with xapian-core, not with our own
oracle.  The fixture text is read from the read-only reference checkout at
test time (skipped if absent); nothing is copied into this repo.

Cases transcribed from `xapian-core/tests/api_weight.cc` (line refs in
each test).
"""

from __future__ import annotations

import math
import os

import pytest

from xapian_spark.query import ast
from xapian_spark.query.planner import Planner
from xapian_spark.ranking.weights import (
    BB2Weight,
    BM25Weight,
    BM25PlusWeight,
    DiceCoeffWeight,
    DLHWeight,
    DPHWeight,
    IfB2Weight,
    IneB2Weight,
    InL2Weight,
    PL2PlusWeight,
    PL2Weight,
    TfIdfWeight,
)
from xapian_spark.text.stem import stem_en

REF_DATA = "/root/reference/xapian-core/tests/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present"
)


def _paragraphs(path: str) -> list[str]:
    """index_utils.cc get_paragraph: blank (all-whitespace) lines split."""
    paras: list[list[str]] = [[]]
    with open(path, "r", encoding="utf-8", errors="surrogateescape") as f:
        for line in f:
            if line.strip() == "":
                paras.append([])
            else:
                paras[-1].append(line)
    return ["".join(p) for p in paras if p]


def _munge(term: str) -> str:
    """index_utils.cc munge_term: keep alnum lowercased; backslash escapes
    keep the mapped char (fixtures used here have no escapes)."""
    out = []
    i = 0
    while i < len(term):
        ch = term[i]
        if ch.isascii() and ch.isalnum():
            out.append(ch.lower())
        elif ch == "\\" and i + 1 < len(term):
            i += 1
            out.append({"n": "\n", "r": "\r", "t": "\t", "0": "\0"}.get(
                term[i], term[i]
            ))
        i += 1
    return "".join(out)


def _harness_terms(para: str) -> list[str]:
    toks = []
    for w in para.split():
        m = _munge(w)
        if m:
            toks.append(stem_en(m))
    return toks


_IDX_CACHE: dict[str, object] = {}


def _db(spark, name: str):
    idx = _IDX_CACHE.get(name)
    if idx is None:
        from xapian_spark.index.builder import build_index, persist_index

        paras = _paragraphs(os.path.join(REF_DATA, f"{name}.txt"))
        rows = [
            (i + 1, " ".join(_harness_terms(p))) for i, p in enumerate(paras)
        ]
        docs = spark.createDataFrame(rows, "docid long, content string")
        idx = persist_index(
            build_index(spark, docs, content_col="content", docid_col="docid")
        )
        _IDX_CACHE[name] = idx
    return idx


def _mset(spark, db_name, query, weight, k=10):
    idx = _db(spark, db_name)
    rows = Planner(idx, weight).search(query, k=k).collect()
    return [(r["docid"], r["score"]) for r in rows]


APPROX = dict(rel=1e-9, abs=1e-12)


def test_simpledata_has_six_docs(spark):
    # tfidfweight3 implies N=6 (weight 8*log(6/2))
    idx = _db(spark, "apitest_simpledata")
    assert idx.stats.doccount == 6


def test_bm25weight4(spark):
    """api_weight.cc:91-111: b=0 removes doclen effect; k1=0 removes both."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               BM25Weight(k1=1, k2=0, k3=1, b=0, min_normlen=0.5))
    assert len(ms) == 5
    w = [x[1] for x in ms]
    assert w[0] > w[1]
    assert w[1] == pytest.approx(w[2], **APPROX)
    assert w[2] > w[3]
    assert w[3] == pytest.approx(w[4], **APPROX)
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               BM25Weight(k1=0, k2=0, k3=1, b=1, min_normlen=0.5))
    w = [x[1] for x in ms]
    assert len(w) == 5 and w[0] == pytest.approx(w[4], **APPROX)


def test_bm25weight5_nonzero_k2(spark):
    """api_weight.cc:115-131: k2=1, k1=0 — pure doc-length part; shorter
    docs rank higher; expected order 3, 5, 1, 4, 2."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               BM25Weight(k1=0, k2=1, k3=1, b=0.5, min_normlen=0.5))
    assert [d for d, _ in ms] == [3, 5, 1, 4, 2]
    w = [x[1] for x in ms]
    assert w[0] == pytest.approx(w[1], **APPROX)
    assert w[1] > w[2] > w[3] > w[4]


def test_bm25plusweight3(spark):
    """api_weight.cc:173-190: literal BM25+ weights."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               BM25PlusWeight(k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5,
                              delta=1))
    assert len(ms) == 5
    expected = [
        0.7920796567487473,
        0.7846980783848447,
        0.7558817623365934,
        0.7210119356168847,
        0.7210119356168847,
    ]
    for (d, w), e in zip(ms, expected):
        assert w == pytest.approx(e, **APPROX)


def test_inl2weight3(spark):
    """api_weight.cc:224-249: InL2(2.0) 'banana' -> doc 6, literal weight;
    OP_SCALE_WEIGHT multiplies exactly."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("banana"),
               InL2Weight(c=2.0))
    assert ms == [(6, pytest.approx(1.559711143842063, **APPROX))]
    ms2 = _mset(spark, "apitest_simpledata",
                ast.ScaleWeight(15.0, ast.Term("banana")), InL2Weight(c=2.0))
    assert ms2[0][1] == pytest.approx(15.0 * 1.559711143842063, **APPROX)


def test_ifb2weight3(spark):
    """api_weight.cc:284-298: IfB2(2.0) 'banana' literal weight."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("banana"),
               IfB2Weight(c=2.0))
    assert len(ms) == 1
    assert ms[0][1] == pytest.approx(3.119422287684126, **APPROX)


def test_ineb2weight3(spark):
    """api_weight.cc:343-357: IneB2(2.0) 'paragraph': 5 hits, 5th weight."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               IneB2Weight(c=2.0))
    assert len(ms) == 5
    assert ms[4][1] == pytest.approx(0.61709730297692400036, **APPROX)


def test_bb2weight3(spark):
    """api_weight.cc:405-446: BB2(2.0) 'paragraph': top literal weight,
    scale-weight multiplies exactly (incl. the 1/1024 regression case)."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               BB2Weight(c=2.0))
    assert len(ms) == 5
    assert ms[0][1] == pytest.approx(1.6823696969784483, **APPROX)
    ms3 = _mset(spark, "apitest_simpledata",
                ast.ScaleWeight(1.0 / 1024, ast.Term("paragraph")),
                BB2Weight(c=2.0))
    for (d1, w1), (d3, w3) in zip(ms, ms3):
        assert w1 == pytest.approx(w3 * 1024, **APPROX)


def test_bb2weight4_one_doc(spark):
    """api_weight.cc:449-462: regression log2(0) with a single doc."""
    ms = _mset(spark, "apitest_onedoc", ast.Term("word"), BB2Weight())
    assert len(ms) == 1
    assert ms[0][1] == pytest.approx(3.431020621347435, **APPROX)


def test_dlhweight1(spark):
    """api_weight.cc:464-520: DLH 'a': order (3, 1, 2), literal weights,
    third clamps to 0."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("a"), DLHWeight())
    assert [d for d, _ in ms] == [3, 1, 2]
    assert ms[0][1] == pytest.approx(1.0046477754371292362, **APPROX)
    assert ms[1][1] == pytest.approx(0.97621929514640352757, **APPROX)
    assert ms[2][1] == 0.0


def test_pl2weight3(spark):
    """api_weight.cc:566-597: PL2(2.0) 'paragraph' literal weight DELTA
    between ranks 3 and 4 (extended-precision constant)."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               PL2Weight(c=2.0))
    assert len(ms) == 5
    assert ms[2][1] - ms[3][1] == pytest.approx(
        0.0086861771701328694, **APPROX
    )


def test_pl2plusweight4(spark):
    """api_weight.cc:634-647: PL2+(2.0, 0.8) — same rank-3/4 delta (the dw
    constant cancels)."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               PL2PlusWeight(c=2.0, delta=0.8))
    assert len(ms) == 5
    assert ms[2][1] - ms[3][1] == pytest.approx(
        0.0086861771701328694, **APPROX
    )


def test_pl2plusweight5(spark):
    """api_weight.cc:650-676: PL2+(1.0, 0.8) 'word' -> order (2, 4)."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("word"),
               PL2PlusWeight(c=1.0, delta=0.8))
    assert [d for d, _ in ms] == [2, 4]


def test_dphweight1(spark):
    """api_weight.cc:679-700: DPH 'paragraph' literal rank-3/5 delta."""
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               DPHWeight())
    assert len(ms) == 5
    assert ms[2][1] - ms[4][1] == pytest.approx(
        0.542623617687990167, **APPROX
    )


def test_tfidfweight3(spark):
    """api_weight.cc:788-870: TfIdf normalization literals on
    apitest_simpledata."""
    # ntn 'word': top wdf=8, N=6, tf=2 -> 8*ln(3)
    ms = _mset(spark, "apitest_simpledata", ast.Term("word"),
               TfIdfWeight(normalizations="ntn"))
    assert len(ms) == 2
    assert ms[0][1] == pytest.approx(8.0 * math.log(6.0 / 2), **APPROX)
    # wqf=2 doubles the weight
    ms2 = _mset(spark, "apitest_simpledata", ast.Term("word", wqf=2),
                TfIdfWeight(normalizations="ntn"))
    assert ms2[0][1] == pytest.approx(2 * ms[0][1], **APPROX)
    # nfn: 8 * (1/tf)
    ms = _mset(spark, "apitest_simpledata", ast.Term("word"),
               TfIdfWeight(normalizations="nfn"))
    assert ms[0][1] == pytest.approx(8.0 / 2, **APPROX)
    # nsn: 8 * ln(N/tf)^2
    ms = _mset(spark, "apitest_simpledata", ast.Term("word"),
               TfIdfWeight(normalizations="nsn"))
    assert ms[0][1] == pytest.approx(8.0 * math.log(6.0 / 2) ** 2, **APPROX)
    # bnn 'test': flat 1.0
    ms = _mset(spark, "apitest_simpledata", ast.Term("test"),
               TfIdfWeight(normalizations="bnn"))
    assert len(ms) == 1 and ms[0][1] == pytest.approx(1.0, **APPROX)
    # lnn 'word': 1 + ln(8) and 1.0
    ms = _mset(spark, "apitest_simpledata", ast.Term("word"),
               TfIdfWeight(normalizations="lnn"))
    assert ms[0][1] == pytest.approx(1 + math.log(8.0), **APPROX)
    assert ms[1][1] == pytest.approx(1.0, **APPROX)
    # snn 'paragraph': wdf^2 -> 9.0 top, 1.0 bottom
    ms = _mset(spark, "apitest_simpledata", ast.Term("paragraph"),
               TfIdfWeight(normalizations="snn"))
    assert len(ms) == 5
    assert ms[0][1] == pytest.approx(9.0, **APPROX)
    assert ms[4][1] == pytest.approx(1.0, **APPROX)
    # ntn 'this': N == tf -> idf 0 -> all weights 0
    ms = _mset(spark, "apitest_simpledata", ast.Term("this"),
               TfIdfWeight(normalizations="ntn"))
    assert all(w == 0.0 for _, w in ms)


def test_dicecoeffweight2(spark):
    """api_weight.cc:2006-2035: Dice over apitest_simpledata3 literal
    weights; OP_SCALE_WEIGHT multiplies exactly."""
    q = ast.Or((ast.Term("one"), ast.Term("three")))
    ms = _mset(spark, "apitest_simpledata3", q, DiceCoeffWeight())
    assert len(ms) == 4
    expected = [0.571428571428571, 0.5, 0.2, 0.181818181818182]
    for (d, w), e in zip(ms, expected):
        assert w == pytest.approx(e, rel=1e-12, abs=1e-12)
    ms2 = _mset(spark, "apitest_simpledata3", ast.ScaleWeight(15.0, q),
                DiceCoeffWeight())
    for (d1, w1), (d2, w2) in zip(ms, ms2):
        assert w2 == pytest.approx(15.0 * w1, rel=1e-9)
