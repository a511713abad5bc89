"""QueryParser golden tests, modeled on the reference's
api_queryparser.cc:43-806 {query -> expected tree description} tables
(the strings below are OUR golden set, written for our describe() format;
the semantics they pin down mirror test_or_queries / test_and_queries /
love-hate / phrase / NEAR cases)."""

from __future__ import annotations

import pytest

from xapian_spark.query import ast
from xapian_spark.query.parser import QueryParser

GOLDEN = [
    ("simple-example", "(simple@1 PHRASE 2 example@2)"),
    ("time_t", "time_t@1"),
    ("a b", "(a@1 OR b@2)"),
    ("a AND b", "(a@1 AND b@2)"),
    ("a OR b AND c", "(a@1 OR (b@2 AND c@3))"),
    ("a AND b AND c", "(a@1 AND b@2 AND c@3)"),
    ("a XOR b", "(a@1 XOR b@2)"),
    ("cat AND NOT dog", "(cat@1 AND_NOT dog@2)"),
    ("cat NOT dog", "(cat@1 AND_NOT dog@2)"),
    ("+big -ugly cat", "((big@1 AND_MAYBE cat@3) AND_NOT ugly@2)"),
    ('"exact phrase here"', "(exact@1 PHRASE 3 phrase@2 PHRASE 3 here@3)"),
    ("a NEAR b", "(a@1 NEAR 10 b@2)"),
    ("a NEAR/3 b", "(a@1 NEAR 3 b@2)"),
    ("a ADJ/2 b", "(a@1 PHRASE 2 b@2)"),
    ("(a OR b) AND c", "((a@1 OR b@2) AND c@3)"),
    ("wild*", "WILDCARD SYNONYM wild"),
    ("U.N.C.L.E.", "uncle@1"),
    ("one two three", "(one@1 OR two@2 OR three@3)"),
]


@pytest.mark.parametrize("query,expected", GOLDEN)
def test_golden(query, expected):
    assert QueryParser().parse_query(query).describe() == expected


FIELD_GOLDEN = [
    ("title:hello", "XThello@1"),
    ("lang:en test", "(test@1 FILTER Len)"),
    (
        "lang:en lang:fr src:a test",
        "(test@1 FILTER ((Len OR Lfr) AND Sa))",
    ),
    ("size:10..20 cat", "(cat@1 FILTER VALUE_RANGE n_chars 10.0 20.0)"),
    ("lang:en", "Len"),
    ("size:..50", "VALUE_RANGE n_chars None 50.0"),
    ("title:multi-word", "(XTmulti@1 PHRASE 2 XTword@2)"),
]


@pytest.mark.parametrize("query,expected", FIELD_GOLDEN)
def test_field_golden(query, expected):
    qp = QueryParser(
        prefixes={"title": "XT"},
        boolean_prefixes={"lang": "L", "src": "S"},
        range_fields={"size": "n_chars"},
    )
    assert qp.parse_query(query).describe() == expected


def test_default_op_and():
    qp = QueryParser(default_op="and")
    assert qp.parse_query("a b c").describe() == "(a@1 AND b@2 AND c@3)"


def test_empty_and_garbage():
    assert isinstance(QueryParser().parse_query(""), ast.MatchNothing)
    assert isinstance(QueryParser().parse_query("   "), ast.MatchNothing)
    # stray operators degrade to terms / nothing, never crash
    QueryParser().parse_query("AND")
    QueryParser().parse_query(") ( OR")
    QueryParser().parse_query('"unclosed phrase')


def test_wqf_counted_via_leaves():
    node = QueryParser().parse_query("foo bar foo")
    leaves = ast.leaf_terms(node)
    assert [t.term for t in leaves] == ["foo", "bar", "foo"]


def test_parse_to_search(simple_index):
    """End to end: string -> AST -> DataFrame -> hits."""
    from xapian_spark.query.planner import Planner

    pl = Planner(simple_index)
    hits = pl.search(
        QueryParser().parse_query('"search engines"'), k=5
    ).collect()
    assert [r["docid"] for r in hits] == [1]
    hits2 = pl.search(
        QueryParser().parse_query("paragraph AND NOT banana"), k=10
    ).collect()
    assert all(r["docid"] != 5 for r in hits2)
    assert len(hits2) == 4
