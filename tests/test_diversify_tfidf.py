"""TfIdf normalization variants, DecreasingValueWeightPostingSource,
and GLS diversification."""

from __future__ import annotations

import math

import pytest

from tests.oracle import BruteForceIndex
from tests.conftest import SIMPLE_PARAGRAPHS
from xapian_spark.ops.diversify import diversify_mset
from xapian_spark.query import ast
from xapian_spark.query.planner import Planner
from xapian_spark.ranking.weights import TfIdfWeight

TERM = "paragraph"


@pytest.fixture(scope="module")
def brute():
    return BruteForceIndex({i + 1: t for i, t in enumerate(SIMPLE_PARAGRAPHS)})


def _expected_tfidf(brute, norms):
    post = brute.postings.get(TERM, {})
    tf = len(post)
    N = brute.N
    avg = brute.avg_len
    wdf_code, idf_code = norms[0], norms[1]
    if idf_code == "n":
        idfn = 1.0
    elif idf_code == "t":
        idfn = math.log(N / tf)
    elif idf_code == "p":
        idfn = 0.0 if N == tf else math.log((N - tf) / tf)
    elif idf_code == "f":
        idfn = 1.0 / tf
    elif idf_code == "s":
        idfn = math.log(N / tf) ** 2
    elif idf_code == "P":
        idfn = math.log((N + 1) / tf)
    out = {}
    for docid, wdf in post.items():
        dl = brute.doclen[docid]
        if wdf_code == "n":
            wdfn = float(wdf)
        elif wdf_code == "b":
            wdfn = 1.0 if wdf else 0.0
        elif wdf_code == "s":
            wdfn = float(wdf * wdf)
        elif wdf_code == "l":
            wdfn = 1.0 + math.log(wdf) if wdf else 0.0
        elif wdf_code == "P":
            nf = 1.0 / (1 - 0.2 + 0.2 * (dl / avg))
            wdfn = (1 + math.log(1 + math.log(wdf))) * nf + 1.0
        elif wdf_code == "L":
            # index termlist includes L/R prefix terms -> uniqterms = +2
            uniq = (
                len({t for t, docs in brute.postings.items() if docid in docs})
                + 2
            )
            wdf_avg = dl / uniq if dl and uniq else 1.0
            wdfn = (1 + math.log(wdf)) / (1 + math.log(wdf_avg))
        out[docid] = wdfn * idfn
    return out


@pytest.mark.parametrize(
    "norms",
    ["ntn", "ltn", "btn", "stn", "Ptn", "Ltn", "nnn", "nfn", "npn", "nsn", "nPn"],
)
def test_tfidf_normalizations(simple_index, brute, norms):
    planner = Planner(simple_index, weight=TfIdfWeight(normalizations=norms))
    got = {
        r["docid"]: r["score"]
        for r in planner.search(ast.Term(TERM), k=10)
        .select("docid", "score")
        .collect()
    }
    want = _expected_tfidf(brute, norms)
    assert set(got) == set(want), norms
    for docid, w in want.items():
        assert got[docid] == pytest.approx(w, abs=1e-9), (norms, docid)


def test_tfidf_invalid_norms_rejected():
    with pytest.raises(ValueError):
        TfIdfWeight(normalizations="xtn")
    with pytest.raises(ValueError):
        TfIdfWeight(normalizations="ntx")
    with pytest.raises(ValueError):
        TfIdfWeight(normalizations="nt")


def test_decreasing_value_weight_source(spark):
    """With weights non-increasing by docid inside the promised range, the
    pruned plan returns the exact same top-k as the unpruned source."""
    rows = [(i, "w", float(100 - i)) for i in range(1, 51)]
    docs = spark.createDataFrame(rows, "docid long, content string, v double")
    from xapian_spark.index.builder import build_index

    idx = build_index(spark, docs, content_col="content", docid_col="docid")
    # keep the value column reachable via idx.docs
    plain = Planner(idx).search(
        ast.ValueWeightSource("v"), k=5
    ).collect()
    pruned = Planner(idx).search(
        ast.DecreasingValueWeightSource("v", range_start=1, range_end=0), k=5
    ).collect()
    assert [(r["docid"], r["score"]) for r in plain] == [
        (r["docid"], r["score"]) for r in pruned
    ]
    assert [r["docid"] for r in pruned] == [1, 2, 3, 4, 5]


def test_diversify_mset_properties():
    # 6 docs, two tight clusters in 2-d; relevance decreasing
    vectors = {
        1: [1.0, 0.0],
        2: [0.99, 0.01],
        3: [0.98, 0.02],
        4: [0.0, 1.0],
        5: [0.01, 0.99],
        6: [0.02, 0.98],
    }
    mset = [(1, 5.0), (2, 4.9), (3, 4.8), (4, 4.7), (5, 4.6), (6, 4.5)]
    out = diversify_mset(mset, vectors, k=3, r=2)
    assert len(out) == 3
    assert len(set(out)) == 3
    # deterministic
    assert out == diversify_mset(mset, vectors, k=3, r=2)
    # all selected docs come from the mset
    assert set(out) <= {d for d, _ in mset}


def test_diversify_small_mset_passthrough():
    mset = [(1, 2.0), (2, 1.0)]
    assert diversify_mset(mset, {1: [1.0], 2: [0.0]}, k=5) == [1, 2]


def test_diversify_df(spark):
    mset = spark.createDataFrame(
        [(1, 5.0), (2, 4.9), (3, 4.8), (4, 4.7)], "docid long, score double"
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.01]),
            (3, [0.0, 1.0]),
            (4, [0.01, 0.99]),
        ],
        "docid long, embedding array<double>",
    )
    from xapian_spark.ops.diversify import diversify

    out = diversify(mset, emb, k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert len({r["docid"] for r in out}) == 3


def test_fixed_weight_source(spark):
    """FixedWeightPostingSource (postingsource.cc:406-458): every doc
    matches at the constant weight; under AND_MAYBE it adds a flat boost."""
    rows = [(i, "alpha beta" if i % 2 else "alpha", float(i)) for i in range(1, 9)]
    docs = spark.createDataFrame(rows, "docid long, content string, v double")
    from xapian_spark.index.builder import build_index

    idx = build_index(spark, docs, content_col="content", docid_col="docid")
    got = Planner(idx).search(ast.FixedWeightSource(2.5), k=20).collect()
    assert len(got) == 8
    assert all(r["score"] == 2.5 for r in got)
    # docid tie-break ascending on equal weights
    assert [r["docid"] for r in got] == list(range(1, 9))
    # composed: term OR fixed -> every doc matches, term docs score higher
    mixed = Planner(idx).search(
        ast.Or((ast.Term("beta"), ast.FixedWeightSource(0.5))), k=20
    ).collect()
    assert len(mixed) == 8
    beta_ids = {r["docid"] for r in mixed if r["score"] > 0.6}
    assert beta_ids == {1, 3, 5, 7}


def test_value_map_source(spark):
    """ValueMapPostingSource (postingsource.cc:296-395): weight =
    mapping[value] else default; null slot values do not match."""
    rows = [
        (1, "x", "red"), (2, "x", "blue"), (3, "x", "green"),
        (4, "x", None), (5, "x", "red"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string, colour string")
    from xapian_spark.index.builder import build_index

    idx = build_index(spark, docs, content_col="content", docid_col="docid")
    q = ast.ValueMapSource(
        "colour", mapping=(("red", 3.0), ("blue", 1.5)), default_weight=0.25
    )
    got = {r["docid"]: r["score"] for r in Planner(idx).search(q, k=10).collect()}
    assert got == {1: 3.0, 5: 3.0, 2: 1.5, 3: 0.25}  # doc 4 (null) absent
