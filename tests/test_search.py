"""Query engine: rank-identity + score-identity vs the brute-force oracle,
boolean operator semantics, positional ops.

Mirrors the shape of the reference's MSet golden tests
(`api_weight.cc:91-130`, `api_anydb.cc`): exact docid order, scores @1e-9.
"""

from __future__ import annotations

import pytest

from tests.conftest import SIMPLE_PARAGRAPHS
from tests.oracle import BruteForceIndex
from xapian_spark.query import ast
from xapian_spark.query.planner import Planner
from xapian_spark.ranking.weights import BM25Weight, BoolWeight, CoordWeight


@pytest.fixture(scope="module")
def brute():
    return BruteForceIndex({i + 1: t for i, t in enumerate(SIMPLE_PARAGRAPHS)})


@pytest.fixture(scope="module")
def planner(simple_index):
    return Planner(simple_index)


def run(planner, node, k=10):
    return [
        (r["docid"], r["score"])
        for r in planner.search(node, k=k).collect()
    ]


def assert_mset(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9), (d1, s1, s2)


def test_single_term(planner, brute):
    got = run(planner, ast.Term("paragraph"))
    assert_mset(got, brute.topk(["paragraph"]))
    assert len(got) == 5  # 5 of the 6 paragraphs contain "paragraph"


def test_or_two_terms(planner, brute):
    node = ast.Or((ast.Term("search"), ast.Term("ranking")))
    assert_mset(run(planner, node), brute.topk(["search", "ranking"]))


def test_and_two_terms(planner, brute):
    node = ast.And((ast.Term("search"), ast.Term("ranking")))
    assert_mset(run(planner, node), brute.topk(["search", "ranking"], op="and"))


def test_and_not(planner, brute):
    node = ast.AndNot(ast.Term("paragraph"), ast.Term("cooking"))
    got = run(planner, node)
    want = [
        (d, s)
        for d, s in brute.topk(["paragraph"])
        if d not in brute.postings["cooking"]
    ]
    assert_mset(got, want)


def test_and_maybe(planner, brute):
    node = ast.AndMaybe(ast.Term("paragraph"), ast.Term("ranking"))
    scores_l = brute.bm25_scores(["paragraph"])
    scores_r = brute.bm25_scores(["ranking"])
    want = sorted(
        (
            (d, s + scores_r.get(d, 0.0))
            for d, s in scores_l.items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert_mset(run(planner, node), want)


def test_filter_only_left_weighted(planner, brute):
    node = ast.Filter(ast.Term("paragraph"), ast.Term("ranking"))
    scores_l = brute.bm25_scores(["paragraph"])
    want = sorted(
        (
            (d, scores_l[d])
            for d in scores_l
            if d in brute.postings["ranking"]
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert_mset(run(planner, node), want)


def test_xor(planner, brute):
    node = ast.Xor((ast.Term("search"), ast.Term("ranking")))
    s1 = brute.bm25_scores(["search"])
    s2 = brute.bm25_scores(["ranking"])
    docs = set(s1) ^ set(s2)
    want = sorted(
        ((d, s1.get(d, 0.0) + s2.get(d, 0.0)) for d in docs),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert_mset(run(planner, node), want)


def test_max(planner, brute):
    node = ast.Max((ast.Term("search"), ast.Term("ranking")))
    s1 = brute.bm25_scores(["search"])
    s2 = brute.bm25_scores(["ranking"])
    docs = set(s1) | set(s2)
    want = sorted(
        ((d, max(s1.get(d, -1), s2.get(d, -1))) for d in docs),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert_mset(run(planner, node), want)


def test_scale_weight(planner, brute):
    node = ast.ScaleWeight(2.5, ast.Term("paragraph"))
    want = [(d, 2.5 * s) for d, s in brute.topk(["paragraph"])]
    assert_mset(run(planner, node), want)


def test_exact_phrase(planner):
    # "search engines" appears only in doc 1 in order
    node = ast.Phrase((ast.Term("search"), ast.Term("engines")), window=2)
    got = run(planner, node)
    assert [d for d, _ in got] == [1]
    # reversed order must not match
    node = ast.Phrase((ast.Term("engines"), ast.Term("search")), window=2)
    assert run(planner, node) == []


def test_near(planner):
    # doc 2: "... mentions search once and indexing twice"
    node = ast.Near((ast.Term("search"), ast.Term("indexing")), window=10)
    got = [d for d, _ in run(planner, node)]
    assert 2 in got
    node = ast.Near((ast.Term("search"), ast.Term("indexing")), window=2)
    assert 2 not in [d for d, _ in run(planner, node)]


def test_boolean_field_filter(planner, brute):
    # lang boolean term: Ltxt matches everything; FILTER doesn't change scores
    node = ast.Filter(ast.Term("paragraph"), ast.Term("Ltxt"))
    assert_mset(run(planner, node), brute.topk(["paragraph"]))


def test_wildcard_expansion(planner, brute):
    # rank* -> {ranking} on this corpus (via synonym; single term)
    node = ast.Wildcard("rank")
    got = run(planner, node)
    assert set(d for d, _ in got) == set(brute.postings["ranking"])


def test_match_all(planner):
    got = run(planner, ast.MatchAll())
    assert [d for d, _ in got] == [1, 2, 3, 4, 5, 6]
    assert all(s == 0.0 for _, s in got)


def test_match_nothing(planner):
    assert run(planner, ast.MatchNothing()) == []


def test_unknown_term_matches_nothing(planner):
    assert run(planner, ast.Term("zzzznotaterm")) == []
    node = ast.Or((ast.Term("paragraph"), ast.Term("zzzznotaterm")))
    assert len(run(planner, node)) == 5


def test_coord_weight(simple_index):
    p = Planner(simple_index, weight=CoordWeight())
    node = ast.Or((ast.Term("search"), ast.Term("ranking")))
    got = run(p, node)
    b = BruteForceIndex({i + 1: t for i, t in enumerate(SIMPLE_PARAGRAPHS)})
    want_docs = set(b.postings["search"]) | set(b.postings["ranking"])
    for d, s in got:
        expect = float(
            (d in b.postings["search"]) + (d in b.postings["ranking"])
        )
        assert s == expect
    assert set(d for d, _ in got) == want_docs


def test_bool_weight(simple_index):
    p = Planner(simple_index, weight=BoolWeight())
    got = run(p, ast.Term("paragraph"))
    assert all(s == 0.0 for _, s in got)
    assert [d for d, _ in got] == sorted(d for d, _ in got)


def test_value_range(planner):
    # docs table has `path` strings doc/0..doc/5; filter via FILTER+range
    node = ast.Filter(
        ast.Term("paragraph"), ast.ValueRange("path", "doc/0", "doc/2")
    )
    got = [d for d, _ in run(planner, node)]
    assert set(got).issubset({1, 2, 3})


def test_wqf_repeated_term(planner, brute):
    # repeated query term: wqf=2 -> (k3+1)*2/(k3+2) factor (k3=1 -> 4/3)
    node = ast.Term("paragraph", wqf=2)
    want = brute.topk(["paragraph", "paragraph"])
    assert_mset(run(planner, node), want)


def test_bm25_parameter_sweep(simple_index, brute):
    """BM25 parameter grid, api_weight.cc:91-130 style."""
    for k1, b in [(0.0, 0.5), (1.0, 0.0), (2.0, 0.8), (1.5, 1.0)]:
        p = Planner(simple_index, weight=BM25Weight(k1=k1, b=b))
        got = run(p, ast.Term("paragraph"))
        want = brute.topk(["paragraph"], k1=k1, b=b)
        assert_mset(got, want)


# -- batched execution -------------------------------------------------------


def test_search_batch_matches_individual(planner):
    queries = {
        "t": ast.Term("paragraph"),
        "and": ast.And((ast.Term("search"), ast.Term("ranking"))),
        "or": ast.Or((ast.Term("search"), ast.Term("banana"))),
        "phrase": ast.Phrase((ast.Term("search"), ast.Term("engines")), 2),
        "syn": ast.Synonym((ast.Term("search"), ast.Term("indexing"))),
        "notq": ast.AndNot(ast.Term("paragraph"), ast.Term("ranking")),
    }
    batched = planner.search_batch(queries, k=10).collect()
    got = {}
    for r in batched:
        got.setdefault(r["query"], []).append((r["rank"], r["docid"], r["score"]))
    for name, node in queries.items():
        single = [
            (r["rank"], r["docid"], r["score"])
            for r in planner.search(node, k=10).collect()
        ]
        batch = sorted(got.get(name, []))
        assert [(rk, d) for rk, d, _ in batch] == [
            (rk, d) for rk, d, _ in single
        ], name
        for (_, _, s1), (_, _, s2) in zip(batch, single):
            assert s1 == pytest.approx(s2, abs=1e-12), name


def test_search_batch_or_matches_individual(planner):
    batches = {
        "q1": ["search", "ranking"],
        "q2": ["banana"],
        "q3": ["paragraph", "indexing", "search"],
        "q4": ["nosuchterm"],
    }
    got = {}
    for r in planner.search_batch_or(batches, k=10).collect():
        got.setdefault(r["query"], []).append((r["rank"], r["docid"], r["score"]))
    assert "q4" not in got  # no matching terms -> no rows
    for name, terms in batches.items():
        if name == "q4":
            continue
        node = (
            ast.Term(terms[0])
            if len(terms) == 1
            else ast.Or(tuple(ast.Term(t) for t in terms))
        )
        single = [
            (r["rank"], r["docid"], r["score"])
            for r in planner.search(node, k=10).collect()
        ]
        batch = sorted(got[name])
        assert [(rk, d) for rk, d, _ in batch] == [
            (rk, d) for rk, d, _ in single
        ], name
        for (_, _, s1), (_, _, s2) in zip(batch, single):
            assert s1 == pytest.approx(s2, rel=1e-12), name


def test_or_of_composite_gates_weights(planner, brute):
    """OR(AND(a,b), c): a doc containing a and c but not b scores ONLY c
    (matching-subquery sum, orpostlist.cc) — regression for ungated
    composite weights."""
    node = ast.Or((
        ast.And((ast.Term("search"), ast.Term("cooking"))),
        ast.Term("paragraph"),
    ))
    got = run(planner, node)
    # no doc has both search+cooking; scores must equal plain `paragraph`
    want = run(planner, ast.Term("paragraph"))
    assert got == want


def test_or_of_phrase_gates_weights(planner):
    """OR(PHRASE(search, engines), indexing): doc 2 has 'search' and
    'indexing' but not the phrase -> its score excludes 'search'."""
    node = ast.Or((
        ast.Phrase((ast.Term("search"), ast.Term("engines")), 2),
        ast.Term("indexing"),
    ))
    got = {r[0]: r[1] for r in run(planner, node)}
    only_indexing = {
        r[0]: r[1] for r in run(planner, ast.Term("indexing"))
    }
    assert got[2] == pytest.approx(only_indexing[2], abs=1e-12)


def test_wqf_affects_bm25_k3_part(planner, simple_index):
    """Repeated query terms: wqf=2 multiplies termweight by
    (k3+1)*wqf/(k3+wqf) = 4/3 with k3=1 (bm25weight.cc:102-111)."""
    single = {r["docid"]: r["score"] for r in
              planner.search(ast.Term("search"), k=10).collect()}
    doubled = {r["docid"]: r["score"] for r in
               planner.search(
                   ast.Or((ast.Term("search"), ast.Term("search"))), k=10
               ).collect()}
    assert set(single) == set(doubled)
    for d, s in single.items():
        # each leaf contributes wqf=2-weighted sumpart; two leaves -> x2
        assert doubled[d] == pytest.approx(2 * (4.0 / 3.0) * s, rel=1e-9)


def test_wildcard_limit_modes(simple_index):
    # "pa*" matches multiple dictionary terms (paragraph, pasta, ...)
    all_terms = simple_index.expand_wildcard("pa")
    assert len(all_terms) >= 2
    # FIRST: sort-order-first N (WILDCARD_LIMIT_FIRST)
    first = simple_index.expand_wildcard("pa", limit=1, limit_mode="first")
    assert first == all_terms[:1]
    # MOST_FREQUENT keeps the highest-tf term
    mf = simple_index.expand_wildcard(
        "pa", limit=1, limit_mode="most_frequent"
    )
    assert mf == ["paragraph"]
    # ERROR raises when over the limit
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simple_index.expand_wildcard("pa", limit=1)


def test_wildcard_unknown_limit_mode_rejected(simple_index):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="limit_mode"):
        simple_index.expand_wildcard("pa", limit=1, limit_mode="FIRST")


# -- OR under positional operators (orpositionlist.cc / orpospostlist.cc) --

def _mk_pos_index(spark):
    from xapian_spark.index.builder import build_index

    rows = [
        (1, "alpha beta gamma"),
        (2, "delta beta gamma"),
        (3, "alpha gamma beta"),
        (4, "beta alpha gamma epsilon"),
        (5, "alpha epsilon near gamma"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    return build_index(spark, docs, content_col="content", docid_col="docid")


def test_or_under_phrase(spark):
    """("alpha" OR "delta") PHRASE "beta": merged position lists — docs 1
    and 2 have alpha/delta immediately before beta; doc 3/4 do not."""
    idx = _mk_pos_index(spark)
    pl = Planner(idx)
    node = ast.Phrase(
        (ast.Or((ast.Term("alpha"), ast.Term("delta"))), ast.Term("beta")), 2
    )
    got = sorted(r["docid"] for r in pl.plan(node).collect())
    assert got == [1, 2]


def test_or_under_near(spark):
    """NEAR with an OR child: window over merged positions."""
    idx = _mk_pos_index(spark)
    pl = Planner(idx)
    node = ast.Near(
        (ast.Or((ast.Term("alpha"), ast.Term("delta"))),
         ast.Term("gamma")), 2
    )
    got = sorted(r["docid"] for r in pl.plan(node).collect())
    # window 2 -> |dist| <= 1: alpha adjacent to gamma in docs 3 and 4
    # (doc 2's delta..gamma distance is 2 -> excluded)
    assert got == [3, 4]


def test_synonym_under_phrase(spark):
    """Synonym child merges positions the same way, weighted as the
    synonym pseudo-term (synonympostlist.cc + orpositionlist.cc)."""
    idx = _mk_pos_index(spark)
    pl = Planner(idx)
    node = ast.Phrase(
        (ast.Synonym((ast.Term("alpha"), ast.Term("delta"))),
         ast.Term("beta")), 2
    )
    got = sorted(r["docid"] for r in pl.plan(node).collect())
    assert got == [1, 2]
    # scores positive and present
    scores = {r["docid"]: r["score"] for r in pl.plan(node).collect()}
    assert all(s > 0 for s in scores.values())


def test_or_under_phrase_three_groups(spark):
    """3-element phrase with an OR group falls through to the windowed
    sweep; merged lists must still produce exact matches."""
    idx = _mk_pos_index(spark)
    pl = Planner(idx)
    node = ast.Phrase(
        (ast.Or((ast.Term("beta"), ast.Term("epsilon"))),
         ast.Term("alpha"), ast.Term("gamma")), 3
    )
    got = sorted(r["docid"] for r in pl.plan(node).collect())
    assert got == [4]  # beta alpha gamma consecutively


def test_pure_value_range_query(spark, simple_index):
    """A bare ValueRange query (no terms anywhere) must return the
    in-range docs, not crash with cand=None (review finding); and a
    ValueRange under OR must match docs containing no query term."""
    from xapian_spark.query.planner import Planner
    from xapian_spark.query import ast

    # simple_index docs carry a 'lang' string column; use docid ranges
    # via the docs table's repo column? Use n/a — build a tiny index
    # with a numeric value column instead.
    docs = spark.createDataFrame(
        [(1, "alpha words", 5), (2, "bravo words", 15),
         (3, "charlie text", 25)],
        "docid long, content string, price long",
    )
    from xapian_spark.index.builder import build_index, persist_index

    idx = persist_index(
        build_index(spark, docs, content_col="content", docid_col="docid")
    )
    p = Planner(idx)
    got = {r["docid"] for r in p.plan(
        ast.ValueRange("price", 10, 30)).collect()}
    assert got == {2, 3}
    # OR with a term: doc 3 matches only via the range, doc 1 only via
    # the term
    got2 = {r["docid"] for r in p.plan(
        ast.Or((ast.Term("alpha"), ast.ValueRange("price", 20, 30)))
    ).collect()}
    assert got2 == {1, 3}
    # ANDed range stays term-gated (no all-docs scan needed for
    # correctness; just assert the result)
    got3 = {r["docid"] for r in p.plan(
        ast.Filter(ast.Term("words"), ast.ValueRange("price", 10, 30))
    ).collect()}
    assert got3 == {2}


def test_positional_with_empty_expansion(spark, simple_index):
    """Phrase/NEAR with a wildcard child that expands to nothing matches
    nothing instead of raising (review finding)."""
    from xapian_spark.query.planner import Planner
    from xapian_spark.query import ast

    p = Planner(simple_index)
    q = ast.Near(
        (ast.Term("paragraph"), ast.Wildcard("zzzqq", combiner="or")), 5
    )
    assert p.plan(q).count() == 0


def test_snippet_corpus_shape_assumption(spark):
    """The snippet_highlight driver oracle replays token char-spans with
    pure offset arithmetic, which is exact ONLY while the sf documents are
    single-space-separated lowercase-alnum tokens.  Pin that shape at every
    sf the driver/bench touch so a testdata change fails loudly here
    instead of as an opaque oracle hash-mismatch."""
    import os
    import re

    pat = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        texts = [r["text"] for r in spark.read.parquet(p).collect()]
        assert texts and all(pat.match(t) for t in texts), sf


def test_snippet_df_matches_scalar(spark):
    """snippet_df (mapInPandas batch highlighting) must equal the scalar
    snippet() on every row — same contract the driver entry relies on."""
    from xapian_spark.query.snippet import snippet, snippet_df

    rows = [(i, t) for i, t in enumerate(SIMPLE_PARAGRAPHS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tw = {"example": 2.0, "search": 1.0}
    got = {
        r["doc_id"]: r["snippet"]
        for r in snippet_df(df, tw, length=60, flags=0).collect()
    }
    for i, t in rows:
        assert got[i] == snippet(t, tw, length=60, flags=0)
