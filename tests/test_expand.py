"""EliteSet, edit-distance expansion, spelling suggestion, Bo1 ESet,
percent scores, fuzzy/synonym parser syntax, BM25+ weight."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SIMPLE_PARAGRAPHS
from xapian_spark.query import ast
from xapian_spark.query.expand import bo1_eset, suggest_spelling, with_percent
from xapian_spark.query.parser import QueryParser
from xapian_spark.query.planner import Planner
from xapian_spark.ranking.weights import BM25PlusWeight, BM25Weight


@pytest.fixture(scope="module")
def planner(simple_index):
    return Planner(simple_index)


# -- ELITE_SET ---------------------------------------------------------------


def test_eliteset_selects_best_by_maxpart(planner, simple_index):
    terms = ["paragraph", "search", "banana", "ranking", "indexing"]
    node = ast.EliteSet(tuple(ast.Term(t) for t in terms), set_size=2)
    expanded = planner._expand(node)
    assert isinstance(expanded, ast.Or)
    kept = {t.term for t in ast.leaf_terms(expanded)}
    assert len(kept) == 2
    # manual maxpart ranking
    tstats = simple_index.collect_term_stats(terms)
    w = BM25Weight()
    mp = {
        t: w.init_term(simple_index.stats, tstats[t]).maxpart(
            tstats[t].wdf_max, simple_index.stats.doclen_lower_bound
        )
        for t in terms
        if tstats[t].tf > 0
    }
    want = set(sorted(mp, key=lambda t: (-mp[t], t))[:2])
    assert kept == want


def test_eliteset_small_passthrough(planner):
    node = ast.EliteSet((ast.Term("search"), ast.Term("banana")), set_size=10)
    got = planner.search(node, k=10).collect()
    want = planner.search(
        ast.Or((ast.Term("search"), ast.Term("banana"))), k=10
    ).collect()
    assert [r["docid"] for r in got] == [r["docid"] for r in want]


# -- OP_EDIT_DISTANCE --------------------------------------------------------


def test_edit_distance_expansion(simple_index):
    # "parograph" is 1 edit from "paragraph"
    terms = simple_index.expand_edit_distance("parograph", max_edit=1)
    assert terms == ["paragraph"]


def test_fuzzy_query_end_to_end(planner):
    hits = planner.search(
        QueryParser().parse_query("parograph~1"), k=10
    ).collect()
    want = planner.search(ast.Term("paragraph"), k=10).collect()
    assert [r["docid"] for r in hits] == [r["docid"] for r in want]


def test_fuzzy_no_match(planner):
    hits = planner.search(
        QueryParser().parse_query("zzzzqqqq~1"), k=10
    ).collect()
    assert hits == []


# -- spelling ----------------------------------------------------------------


def test_spelling_suggestion(simple_index):
    assert suggest_spelling(simple_index, "banan") == "banana"
    assert suggest_spelling(simple_index, "parograph") == "paragraph"
    # dictionary words are not "corrected"
    assert suggest_spelling(simple_index, "banana") is None
    assert suggest_spelling(simple_index, "xyzzyq") is None


# -- Bo1 ESet ----------------------------------------------------------------


def test_bo1_eset(simple_index):
    # relevance set: the two docs about search/indexing
    rows = bo1_eset(simple_index, [1, 2], k=5,
                    exclude_terms={"a", "the", "this", "is", "and"}).collect()
    assert rows, "expansion set should not be empty"
    terms = [r["term"] for r in rows]
    # expansion should surface content-bearing terms of the rset docs
    assert any(t in ("search", "indexing", "paragraph") for t in terms)
    # weights strictly positive and descending
    wts = [r["wt"] for r in rows]
    assert all(w > 0 for w in wts)
    assert wts == sorted(wts, reverse=True)
    # spot-check the Bo1 formula for the top term
    top = rows[0]
    ts = simple_index.collect_term_stats([top["term"]])[top["term"]]
    n = simple_index.stats.doccount
    rcf = (
        simple_index.postings.where(
            (F.col("term") == top["term"]) & F.col("docid").isin([1, 2])
        ).agg(F.sum("wdf")).collect()[0][0]
    )
    m = ts.cf / n
    want = rcf * math.log2((1 + m) / m) + math.log2(1 + m)
    assert top["wt"] == pytest.approx(want, rel=1e-9)


# -- percent -----------------------------------------------------------------


def test_with_percent(planner):
    mset = planner.search(ast.Term("paragraph"), k=10)
    rows = with_percent(mset).orderBy("rank").collect()
    assert rows[0]["percent"] == 100
    assert all(1 <= r["percent"] <= 100 for r in rows)


# -- parser synonym syntax ---------------------------------------------------


def test_parser_synonyms():
    qp = QueryParser(synonyms={"car": ("auto", "vehicle")})
    node = qp.parse_query("~car")
    assert node.describe() == "(car@1 SYNONYM auto SYNONYM vehicle)"
    # without ~, no expansion unless auto_synonyms
    assert qp.parse_query("car").describe() == "car@1"
    qp2 = QueryParser(synonyms={"car": ("auto",)}, auto_synonyms=True)
    assert qp2.parse_query("car").describe() == "(car@1 SYNONYM auto)"


# -- BM25+ -------------------------------------------------------------------


def test_bm25plus_scores(planner, simple_index):
    pl = Planner(simple_index, BM25PlusWeight())
    rows = pl.search(ast.Term("banana"), k=10).collect()
    assert len(rows) == 1
    ts = simple_index.collect_term_stats(["banana"])["banana"]
    st = simple_index.stats
    # manual: tw = ln((N+1)/tf); sumpart = tw*((k1+1)*wdf/denom + 1)
    row = (
        simple_index.postings.where(
            (F.col("term") == "banana")
        ).select("wdf", "doclen").collect()[0]
    )
    tw = math.log((st.doccount + 1) / ts.tf)
    normlen = max(row["doclen"] * (1.0 / st.average_length), 0.5)
    denom = 1.0 * (normlen * 0.5 + 0.5) + row["wdf"]
    want = tw * (2.0 * row["wdf"] / denom + 1.0)
    assert rows[0]["score"] == pytest.approx(want, rel=1e-12)


def test_eset_expand_decider(simple_index):
    """ExpandDecider (expanddecider.h): candidate filter applied before
    the top-k cut — SQL-string and callable forms, plus the
    ExpandDeciderFilterPrefix convenience."""
    from xapian_spark.query.expand import ExpandDeciderFilterPrefix, bo1_eset

    base = [r["term"] for r in bo1_eset(simple_index, [1, 2], k=50).collect()]
    assert any(t.startswith("s") for t in base)
    # SQL form: drop s-terms
    sql = [
        r["term"]
        for r in bo1_eset(
            simple_index, [1, 2], k=50, decider="term NOT LIKE 's%'"
        ).collect()
    ]
    assert sql and not any(t.startswith("s") for t in sql)
    # callable form via ExpandDeciderFilterPrefix: same result
    cal = [
        r["term"]
        for r in bo1_eset(
            simple_index, [1, 2], k=50,
            decider=ExpandDeciderFilterPrefix("s"),
        ).collect()
    ]
    assert cal == sql


def test_get_corrected_query_string(simple_index):
    """QueryParser::get_corrected_query_string (queryparser.h:1079):
    unknown terms replaced by their suggestion; '' when nothing changed."""
    from xapian_spark.query.parser import QueryParser

    qp = QueryParser()
    got = qp.get_corrected_query_string("parograph search", simple_index)
    assert got == "paragraph search"
    assert qp.get_corrected_query_string("paragraph search", simple_index) == ""


def test_trad_eset(simple_index):
    """TradEWeight expansion (set_expansion_scheme("trad", k);
    expand/tradeweight.cc:31-40).  Cross-check one term's weight against a
    hand-computed value from the raw statistics."""
    import math

    from xapian_spark.query.expand import trad_eset

    idx = simple_index
    rset = [1, 2]
    k = 1.0
    rows = trad_eset(idx, rset, k=50, expand_k=k).collect()
    assert rows and all(r["wt"] is not None for r in rows)
    got = {r["term"]: r["wt"] for r in rows}

    # hand-compute for a term present in both RSet docs
    term = "search"
    post = {
        r["docid"]: (r["wdf"], r["doclen"])
        for r in idx.postings.where(F.col("term") == term)
        .select("docid", "wdf", "doclen").collect()
    }
    tf = idx.postings.where(F.col("term") == term).count()
    n = idx.stats.doccount
    avlen = idx.stats.total_doclen / n
    rdocs = [d for d in rset if d in post]
    r = len(rdocs)
    mult = sum(
        (k + 1) * max(post[d][0], 1)
        / (k * post[d][1] / avlen + max(post[d][0], 1))
        for d in rdocs
    )
    without = len(rset) - r
    tw = math.log(
        (r + 0.5) * (n - tf - without + 0.5) / ((tf - r + 0.5) * (without + 0.5))
    )
    assert term in got
    assert got[term] == pytest.approx(mult * tw, rel=1e-9)


def test_set_expansion_scheme_dispatch(spark):
    from xapian_spark.api import Enquire, InMemoryDatabase, RSet

    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate([
            "alpha beta gamma", "alpha beta delta", "epsilon zeta",
            "beta gamma epsilon", "alpha gamma zeta",
        ])],
        "docid long, content string",
    )
    db = InMemoryDatabase(spark, docs, content_col="content",
                          docid_col="docid")
    enq = Enquire(db)
    enq.set_query("alpha")
    rset = RSet()
    rset.add_document(1)
    rset.add_document(2)
    bo1 = enq.get_eset(5, rset)
    enq.set_expansion_scheme("trad", 1.0)
    trad = enq.get_eset(5, rset)
    assert bo1 and trad
    assert "alpha" not in [t for t, _ in trad]  # query terms excluded
    # both rank 'beta' (in both rset docs) above 'zeta' (in neither)
    def rank(lst, t):
        return [x for x, _ in lst].index(t) if t in [x for x, _ in lst] else 99
    assert rank(trad, "beta") < rank(trad, "zeta")
    with pytest.raises(ValueError):
        enq.set_expansion_scheme("nope")
