"""QueryParser golden tests, modeled on the reference's
api_queryparser.cc:43-806 {query -> expected tree description} tables
(the strings below are OUR golden set, written for our describe() format;
the semantics they pin down mirror test_or_queries / test_and_queries /
love-hate / phrase / NEAR cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


# -- stemmed golden strings ported from api_queryparser.cc:48-130 ------------
# (STEM_SOME + English stemmer, prefixes author->A title/subject->XT,
# boolean site->H).  Where the reference's describe() nests binary ORs, our
# n-ary OR flattens — semantically identical; those expected strings are
# adjusted to the flat form and marked [flat].

STEM_GOLDEN = [
    ("stock -cooking", "(Zstock@1 AND_NOT Zcook@2)"),
    ("foo -baz bar", "((Zfoo@1 OR Zbar@3) AND_NOT Zbaz@2)"),
    ("d- school report", "(Zd@1 OR Zschool@2 OR Zreport@3)"),  # [flat]
    ("gtk+ -gnome", "(Zgtk+@1 AND_NOT Zgnome@2)"),
    ("c++ -d--", "(Zc++@1 AND_NOT Zd@2)"),
    ("Mg2+ Cl-", "(mg2+@1 OR cl@2)"),
    ('"c++ library"', "(c++@1 PHRASE 2 library@2)"),
    ("A&L A&RMCO AD&D", "(a&l@1 OR a&rmco@2 OR ad&d@3)"),
    ("C# vs C++", "(c#@1 OR Zvs@2 OR c++@3)"),
    ("j##", "Zj##@1"),
    ("a#b", "(Za@1 OR Zb@2)"),
    ("O.K. U.N.C.L.E XY.Z.", "(ok@1 OR uncle@2 OR (xy@3 PHRASE 2 z@4))"),
    ("author:orwell animal farm", "(ZAorwel@1 OR Zanim@2 OR Zfarm@3)"),
    ("author:Orwell Animal Farm", "(Aorwell@1 OR animal@2 OR farm@3)"),
    ('author:"orwell" title:"animal"', "(Aorwell@1 OR XTanimal@2)"),
    (
        '"hello world" +python',
        "(Zpython@3 AND_MAYBE (hello@1 PHRASE 2 world@2))",
    ),
    # reference recovers an unterminated quote as a 1-term phrase
    # (unstemmed); we stem it — semantically equivalent match set for a
    # 1-term phrase modulo stemming [divergence noted]
    ('unmatched"', "Zunmatch@1"),
    ('unmatched " " ', "Zunmatch@1"),
    ('"1.4"', "1.4@1"),
    ('"1."', "1@1"),
    ('"A#.B."', "(a#@1 PHRASE 2 b@2)"),
    (
        '" Xapian QueryParser" parses queries',
        "((xapian@1 PHRASE 2 queryparser@2) OR Zpars@3 OR Zqueri@4)",  # [flat]
    ),
    ("one +two three", "(Ztwo@2 AND_MAYBE (Zone@1 OR Zthree@3))"),
    ("subject:test other", "(ZXTtest@1 OR Zother@2)"),
    ('subject:"space flight"', "(XTspace@1 PHRASE 2 XTflight@2)"),
    ("title:2001 title:space", "(XT2001@1 OR ZXTspace@2)"),
    ('beer NOT "orange juice"', "(Zbeer@1 AND_NOT (orange@2 PHRASE 2 juice@3))"),
    ("beer AND NOT lager", "(Zbeer@1 AND_NOT Zlager@2)"),
    ("beer AND -lager", "(Zbeer@1 AND_NOT Zlager@2)"),
    ("A OR B NOT C", "(a@1 OR (b@2 AND_NOT c@3))"),
    ("A OR B AND NOT C", "(a@1 OR (b@2 AND_NOT c@3))"),
    ("A OR B AND -C", "(a@1 OR (b@2 AND_NOT c@3))"),
    ("A OR B XOR C", "(a@1 OR (b@2 XOR c@3))"),
    ("A XOR B NOT C", "(a@1 XOR (b@2 AND_NOT c@3))"),
    ("one AND two", "(Zone@1 AND Ztwo@2)"),
    ("one A.N.D. two", "(Zone@1 OR and@2 OR Ztwo@3)"),
    ("author:hyphen-ated", "(Ahyphen@1 PHRASE 2 Aated@2)"),
    ("cvs site:xapian.org", "(Zcvs@1 FILTER Hxapian.org)"),
]


@pytest.mark.parametrize("query,expected", STEM_GOLDEN)
def test_stemmed_golden(query, expected):
    from xapian_spark.text.stem import Stemmer

    qp = QueryParser(
        stemmer=Stemmer("en"),
        prefixes={"author": "A", "title": "XT", "subject": "XT"},
        boolean_prefixes={"site": "H"},
    )
    assert qp.parse_query(query).describe() == expected


@pytest.mark.parametrize(
    "query,expected",
    [
        ("-a OR b", "b@2"),
        ("-a AND b", "b@2"),
        ("-a XOR b", "b@2"),
        ("(-a) b", "b@2"),
        ("-a", ""),
        ("a AND -b OR c", "((a@1 AND_NOT b@2) OR c@3)"),
    ],
)
def test_hate_only_clauses_do_not_crash(query, expected):
    """Regression: hate-only prob clauses leaked an internal marker into
    composed AST nodes."""
    assert QueryParser().parse_query(query).describe() == expected


def test_field_processor():
    """FieldProcessor (queryparser.h): field:text handed to a callable
    returning a custom Node."""
    from xapian_spark.query import ast
    from xapian_spark.query.parser import QueryParser

    qp = QueryParser()
    qp.add_field_processor(
        "host", lambda text: ast.Term("H" + text.lower().removeprefix("www."))
    )
    node = qp.parse_query("host:WWW.Example.ORG")
    assert node == ast.Term("Hexample.org")
    # combined with a free term: default-op OR
    node2 = qp.parse_query("hello host:example.org")
    assert isinstance(node2, ast.Or)
    # returning None -> MatchNothing
    qp.add_field_processor("drop", lambda text: None)
    assert isinstance(qp.parse_query("drop:anything"), ast.MatchNothing)


# -- FLAG_PARTIAL (queryparser.h:528-556; PARTIAL_TERM lemony:1513-1528) -----

PARTIAL_GOLDEN = [
    # final word at end-of-string: OR of most-frequent wildcard + the term
    ("sea", "(WILDCARD SYNONYM sea OR sea@1)"),
    ("first sea", "(first@1 OR (WILDCARD SYNONYM sea OR sea@2))"),
    # trailing whitespace: the word is complete - no partial treatment
    ("sea ", "sea@1"),
    # too short (min_partial_prefix_len = 2)
    ("s", "s@1"),
    # explicit wildcard / fuzzy keep their own semantics
    ("sea*", "WILDCARD SYNONYM sea"),
    # quoted phrase final token: no partial
    ('"exact phrase"', "(exact@1 PHRASE 2 phrase@2)"),
    # compound (phrase-generating) final token: no partial
    ("simple-example", "(simple@1 PHRASE 2 example@2)"),
]


@pytest.mark.parametrize("query,expected", PARTIAL_GOLDEN)
def test_partial_golden(query, expected):
    assert (
        QueryParser(partial=True).parse_query(query).describe() == expected
    )


def test_partial_field_prefixes():
    qp = QueryParser(
        partial=True,
        prefixes={"title": "XT"},
        boolean_prefixes={"lang": "L"},
    )
    # probabilistic field prefix participates (root gets the prefix)
    assert (
        qp.parse_query("title:sea").describe()
        == "(WILDCARD SYNONYM XTsea OR XTsea@1)"
    )
    # boolean filter prefix does not (reference: PARTIAL skipped)
    assert qp.parse_query("lang:en").describe() == "Len"


def test_partial_wildcard_params():
    node = QueryParser(partial=True, max_partial_expansion=7).parse_query(
        "sea"
    )
    wc = node.subs[0]
    assert isinstance(wc, ast.Wildcard)
    assert wc.limit == 7 and wc.most_frequent and wc.combiner == "synonym"


def test_partial_search(simple_index):
    """Incremental search: 'parag' matches the paragraph docs via the
    prefix expansion even though 'parag' is not a term."""
    from xapian_spark.query.planner import Planner

    pl = Planner(simple_index)
    q = QueryParser(partial=True).parse_query("parag")
    got = {r["docid"] for r in pl.search(q, k=10).collect()}
    assert {1, 2, 4} <= got
    # the non-partial parse finds nothing
    q2 = QueryParser().parse_query("parag")
    assert pl.search(q2, k=10).count() == 0


def test_flag_pure_not(simple_index):
    """FLAG_PURE_NOT (queryparser.h:529-535; golden
    api_queryparser.cc:1717-1724): 'NOT x' = 0*<alldocuments> AND_NOT x."""
    qp = QueryParser(pure_not=True)
    assert (
        qp.parse_query("NOT dog").describe()
        == "(0.0 * <alldocuments> AND_NOT dog@1)"
    )
    assert (
        qp.parse_query("a AND (NOT b)").describe()
        == "(a@1 AND (0.0 * <alldocuments> AND_NOT b@2))"
    )
    # without the flag the negated clause degrades to nothing matched
    assert isinstance(QueryParser().parse_query("NOT dog"), ast.MatchNothing)
    # end to end: everything except the banana doc, all weights 0
    from xapian_spark.query.planner import Planner

    pl = Planner(simple_index)
    got = pl.search(qp.parse_query("NOT banana"), k=10).collect()
    assert {r["docid"] for r in got} == {1, 2, 3, 4, 6}
    assert all(r["score"] == 0.0 for r in got)


def test_flag_boolean_any_case():
    """FLAG_BOOLEAN_ANY_CASE (queryparser.h:511)."""
    qp = QueryParser(boolean_any_case=True)
    assert qp.parse_query("cat and dog").describe() == "(cat@1 AND dog@2)"
    assert qp.parse_query("cat Or dog").describe() == "(cat@1 OR dog@2)"
    assert qp.parse_query("a near/3 b").describe() == "(a@1 NEAR 3 b@2)"
    # default: only ALL-CAPS are operators
    assert (
        QueryParser().parse_query("cat and dog").describe()
        == "(cat@1 OR and@2 OR dog@3)"
    )


def test_glob_wildcards(simple_index):
    """FLAG_WILDCARD_MULTI / FLAG_WILDCARD_SINGLE (queryparser.h, Xapian
    1.5; pattern semantics query.h:327-339): '*' any run / '?' one char,
    anywhere in the word."""
    from xapian_spark.query.planner import Planner

    qp = QueryParser(wildcard_multi=True, wildcard_single=True)
    assert qp.parse_query("p?sta").describe() == "WILDCARD GLOB p?sta"
    assert qp.parse_query("c*ing").describe() == "WILDCARD GLOB c*ing"
    # without the flags, '?' folds away and '*' mid-word splits terms
    assert "GLOB" not in QueryParser().parse_query("p?sta").describe()

    idx = simple_index
    assert idx.expand_wildcard_pattern("p?sta") == ["pasta"]
    assert idx.expand_wildcard_pattern("c*ing") == ["cooking"]
    assert idx.expand_wildcard_pattern("par*ph") == ["paragraph"]
    assert idx.expand_wildcard_pattern("r?nking") == ["ranking"]
    # '?' is exactly one char: a length mismatch never matches
    assert idx.expand_wildcard_pattern("rank?ng") == ["ranking"]
    assert idx.expand_wildcard_pattern("ran?ng") == []
    # limit policies shared with the plain path
    with pytest.raises(ValueError):
        idx.expand_wildcard_pattern("*a*", limit=2)
    first2 = idx.expand_wildcard_pattern("*a*", limit=2, limit_mode="first")
    assert len(first2) == 2

    pl = Planner(idx)
    got = {r["docid"] for r in pl.search(qp.parse_query("p?sta"), k=10).collect()}
    assert got == {3}


def test_fractional_fuzzy():
    """FLAG_FUZZY fractional edit distance (queryparser.h: since~0.2 ->
    len * 0.2 = 1)."""
    node = QueryParser().parse_query("since~0.2")
    assert isinstance(node, ast.EditDistance)
    assert node.max_edit == 1
    node2 = QueryParser().parse_query("uncertain~0.5")
    assert node2.max_edit == 4


def test_stoplist_and_unstem():
    """QueryParser::stoplist_begin / unstem_begin (queryparser.h:1058-1066)
    + FLAG_ACCUMULATE (queryparser.h:705)."""
    from xapian_spark.text.stem import Stemmer

    qp = QueryParser(stemmer=Stemmer("english"), stopwords=frozenset({"the"}))
    qp.parse_query("the connection connected others")
    assert qp.get_stoplist() == ["the"]
    # both surface forms map to the same stem
    assert qp.unstem("Zconnect") == ["connection", "connected"]
    assert qp.unstem("Zother") == ["others"]
    assert qp.unstem("Znothere") == []
    # default: reset per parse
    qp.parse_query("fresh words")
    assert qp.get_stoplist() == [] and qp.unstem("Zconnect") == []
    # FLAG_ACCUMULATE keeps data across parses
    qa = QueryParser(stopwords=frozenset({"the"}), accumulate=True)
    qa.parse_query("the alpha")
    qa.parse_query("the beta")
    assert qa.get_stoplist() == ["the", "the"]
    assert qa.unstem("alpha") == ["alpha"]


def test_reference_named_setters():
    """QueryParser::add_prefix / add_boolean_prefix / set_default_op /
    set_stemmer / set_stemming_strategy / set_stopper / set_database
    (queryparser.h) configure the same state the constructor does."""
    from xapian_spark.text.stem import Stemmer

    qp = QueryParser()
    qp.add_prefix("title", "S")
    qp.add_boolean_prefix("lang", "L")
    qp.set_default_op("and")
    assert qp.get_default_op() == "and"
    qp.set_stopper({"the"})
    qp.set_stemmer(Stemmer("english"))
    node = qp.parse_query("title:connection lang:py")
    # probabilistic prefix stems under the prefix; boolean filters
    s = node.describe()
    assert "ZSconnect" in s and "Lpy" in s
    with pytest.raises(ValueError):
        qp.set_default_op("xor")


def test_stemming_strategies():
    """set_stemming_strategy none/all/all_z/some_full_pos
    (queryparser.h:448-480)."""
    from xapian_spark.text.stem import Stemmer

    st = Stemmer("english")
    base = dict(stemmer=st)
    assert QueryParser(**base).parse_query("connection").describe() \
        .startswith("Zconnect@")
    qp = QueryParser(**base); qp.set_stemming_strategy("none")
    assert qp.parse_query("connection").describe().startswith("connection@")
    qp = QueryParser(**base); qp.set_stemming_strategy("all")
    assert qp.parse_query("connection").describe().startswith("connect@")
    qp = QueryParser(**base); qp.set_stemming_strategy("all_z")
    assert qp.parse_query("connection").describe().startswith("Zconnect@")
    # some: positional contexts stay unstemmed; some_full_pos stems them
    qp = QueryParser(**base)
    assert "connection" in qp.parse_query('"connection refused"').describe()
    qp.set_stemming_strategy("some_full_pos")
    assert "Zconnect" in qp.parse_query('"connection refused"').describe()


def test_max_expansion_and_min_prefix(simple_index):
    """set_max_expansion / set_min_wildcard_prefix (queryparser.h:823-881):
    expansion caps reach the wildcard node; short fixed prefixes raise."""
    from xapian_spark.query.planner import Planner

    qp = QueryParser()
    qp.set_max_expansion(1, "error")
    node = qp.parse_query("s*")
    assert node.limit == 1 and node.limit_mode == "error"
    # 's*' matches many dictionary terms -> limit 1 errors
    with pytest.raises(Exception):
        Planner(simple_index).plan(node).count()
    qp.set_max_expansion(1, "first")
    assert qp.parse_query("s*").limit_mode == "first"
    assert Planner(simple_index).plan(qp.parse_query("s*")).count() > 0

    qp.set_min_wildcard_prefix(4)
    assert qp.parse_query("para*") is not None
    with pytest.raises(ValueError):
        qp.parse_query("pa*")
    # the partial analogue: a short final word simply doesn't expand
    qp2 = QueryParser(partial=True)
    qp2.set_min_wildcard_prefix(3, flags=("partial",))
    assert qp2.min_partial_prefix_len == 3


def test_termgen_flags_and_word_length():
    """TermGenerator::set_flags / set_max_word_length
    (termgenerator.h:117-137, 216-230)."""
    from xapian_spark.text.termgen import TermGenerator

    tg = TermGenerator()
    tg.set_flags({"ngrams"})
    with pytest.raises(ValueError):
        tg.set_flags({"bogus"})
    tg.set_max_word_length(5)
    tg.index_text("tiny elephantine words")
    terms = {t for t, _, _ in tg.get_document().termlist()}
    assert "tiny" in terms and "words" in terms
    assert "elephantine" not in terms
    with pytest.raises(ValueError):
        tg.set_max_word_length(100)


def test_query_introspection_and_serialise():
    """Query::get_type/get_num_subqueries/get_subquery/get_length/
    get_terms/serialise round-trip (query.h:560-660)."""
    q = QueryParser().parse_query('alpha AND (bravo OR "charlie delta")')
    assert q.get_type() == "and"
    assert q.get_num_subqueries() == 2
    assert q.get_subquery(1).get_type() == "or"
    assert q.get_length() == 4  # sum of wqf over leaf terms
    assert q.get_terms() == ["alpha", "bravo", "charlie", "delta"]
    assert not q.empty() and ast.MatchNothing().empty()
    q2 = ast.Node.unserialise(q.serialise())
    assert q2 == q and q2.describe() == q.describe()


# -- FLAG_AUTO_MULTIWORD_SYNONYMS (queryparser.h:590) ------------------------

# Goldens mirror the reference's qp_synonym2 set (api_queryparser.cc:
# 2649-2688), rewritten for our describe() format (synonym terms carry no
# position in our description; binary ORs are n-ary here).
MULTIWORD_SYNONYM_GOLDEN = [
    ("sun OR tan OR cream", "(Zsun@1 OR Ztan@2 OR Zcream@3)"),
    ("sun tan", "((Zsun@1 OR Ztan@2) SYNONYM bathe)"),
    ("sun tan cream", "((Zsun@1 OR Ztan@2 OR Zcream@3) SYNONYM lotion)"),
    (
        "beach sun tan holiday",
        "(Zbeach@1 OR ((Zsun@2 OR Ztan@3) SYNONYM bathe) OR Zholiday@4)",
    ),
    (
        "sun tan sun tan cream",
        "(((Zsun@1 OR Ztan@2) SYNONYM bathe)"
        " OR ((Zsun@3 OR Ztan@4 OR Zcream@5) SYNONYM lotion))",
    ),
    # single-word keys still expand (MASK_ENABLE_AUTO_SYNONYMS includes
    # the multiword flag, queryparser.lemony:434-441)
    ("single", "(Zsingl@1 SYNONYM record)"),
    # quoted phrases never trigger the walk (qp_synonym1 golden)
    ('"sun tan"', "(sun@1 PHRASE 2 tan@2)"),
]


@pytest.mark.parametrize("query,expected", MULTIWORD_SYNONYM_GOLDEN)
def test_auto_multiword_synonyms(query, expected):
    from xapian_spark.text.stem import Stemmer

    qp = QueryParser(
        stemmer=Stemmer("english"),
        synonyms={
            "sun tan cream": ("lotion",),
            "sun tan": ("bathe",),
            "single": ("record",),
        },
        auto_multiword_synonyms=True,
    )
    assert qp.parse_query(query).describe() == expected


def test_auto_multiword_longest_match_and_boundaries():
    """Greedy longest key wins; NEAR operands and registered field terms
    never join a span; default-op AND combines originals with AND."""
    syn = {"a b": ("ab",), "a b c": ("abc",)}
    qp = QueryParser(synonyms=syn, auto_multiword_synonyms=True)
    # longest exact key ("a b c") beats its prefix ("a b")
    assert (
        qp.parse_query("a b c").describe()
        == "((a@1 OR b@2 OR c@3) SYNONYM abc)"
    )
    # a word captured by NEAR belongs to the positional group
    qp2 = QueryParser(synonyms=syn, auto_multiword_synonyms=True)
    assert "SYNONYM" not in qp2.parse_query("a b NEAR/3 d").describe()
    # registered boolean-prefix tokens break the run
    qp3 = QueryParser(
        synonyms=syn,
        boolean_prefixes={"lang": "L"},
        auto_multiword_synonyms=True,
    )
    assert (
        qp3.parse_query("a lang:en b").describe()
        == "((a@1 OR b@2) FILTER Len)"
    )
    # default_op=and combines the originals with AND
    qp4 = QueryParser(
        default_op="and", synonyms=syn, auto_multiword_synonyms=True
    )
    assert (
        qp4.parse_query("a b c").describe()
        == "((a@1 AND b@2 AND c@3) SYNONYM abc)"
    )


def test_auto_multiword_without_flag_unchanged():
    """FLAG_AUTO_SYNONYMS alone must NOT enable multi-word matching
    (regression-tested in the reference for 1.3.0/1.2.9)."""
    qp = QueryParser(
        synonyms={"regression test": ("magic",)}, auto_synonyms=True
    )
    assert (
        qp.parse_query("regression test").describe()
        == "(regression@1 OR test@2)"
    )


def test_auto_multiword_stopwords_in_span():
    """Stopwords inside a matched span are dropped from the originals but
    still participate in the key (TermGroup::as_group applies the stopper
    only to subqs2, queryparser.lemony:1802-1810)."""
    qp = QueryParser(
        synonyms={"state of the art": ("sota",)},
        stopwords=frozenset({"of", "the"}),
        auto_multiword_synonyms=True,
    )
    assert (
        qp.parse_query("state of the art").describe()
        == "((state@1 OR art@4) SYNONYM sota)"
    )
    assert qp.get_stoplist() == ["of", "the"]


# -- FLAG_NO_POSITIONS (queryparser.h:716) -----------------------------------

NO_POSITIONS_GOLDEN = [
    # quoted phrase -> AND of the same unstemmed terms
    ('"dog food"', "(dog@1 AND food@2)"),
    # phrased compound -> AND
    ("simple-example", "(simple@1 AND example@2)"),
    # NEAR/ADJ -> AND (Terms::as_opwindow_query window=-1 -> OP_AND)
    ("cat NEAR/3 dog", "(cat@1 AND dog@2)"),
    ("cat ADJ dog", "(cat@1 AND dog@2)"),
    # non-positional syntax is untouched
    ("cat dog", "(cat@1 OR dog@2)"),
]


@pytest.mark.parametrize("query,expected", NO_POSITIONS_GOLDEN)
def test_no_positions_golden(query, expected):
    qp = QueryParser(no_positions=True)
    assert qp.parse_query(query).describe() == expected


def test_no_positions_field_phrase_and_stemming():
    """field:"quoted" degrades to AND of prefixed terms; with a stemmer,
    terms inside a degraded group stay unstemmed (they are still the
    positional-production terms, Terms::as_opwindow_query reuses
    make_term)."""
    from xapian_spark.text.stem import Stemmer

    qp = QueryParser(prefixes={"title": "XT"}, no_positions=True)
    assert (
        qp.parse_query('title:"dog food"').describe()
        == "(XTdog@1 AND XTfood@2)"
    )
    qp2 = QueryParser(stemmer=Stemmer("english"), no_positions=True)
    assert (
        qp2.parse_query('"connection refused"').describe()
        == "(connection@1 AND refused@2)"
    )


def test_no_positions_positionless_build(spark, simple_index):
    """End-to-end FLAG_NO_POSITIONS over a POSITIONLESS index: with the
    positions column nulled out (an index built without positional data),
    a quoted-phrase query parsed under the flag runs fine (its plan never
    touches positions) and matches the explicit AND query on the full
    index."""
    import dataclasses

    from xapian_spark.query.planner import Planner

    nopos_index = dataclasses.replace(
        simple_index,
        postings=simple_index.postings.withColumn(
            "positions", F.lit(None).cast("array<int>")
        ),
    )
    qp = QueryParser(no_positions=True)
    node = qp.parse_query('"search engines"')
    assert node.describe() == "(search@1 AND engines@2)"
    got = Planner(nopos_index).search(node, k=10)
    want = Planner(simple_index).search(
        QueryParser().parse_query("search AND engines"), k=10
    )
    assert sorted(r["docid"] for r in got.collect()) == sorted(
        r["docid"] for r in want.collect()
    )
    # sanity: the SAME quoted query without the flag needs positions and
    # must NOT silently equal the AND degradation path semantics
    assert QueryParser().parse_query(
        '"search engines"'
    ).describe() == "(search@1 PHRASE 2 engines@2)"


def test_synonym_unstemmed_key_not_from_dropped_stopword():
    """The unstemmed-key synonym lookup must use the raw word only when
    the token IS a single word — a stopword-dropped compound ("the-dog"
    -> terms [dog]) must not look up synonyms under 'the'."""
    qp = QueryParser(
        synonyms={"the": ("wrong",), "dog": ("canine",)},
        stopwords=frozenset({"the"}),
        auto_synonyms=True,
    )
    assert (
        qp.parse_query("the-dog").describe() == "(dog@2 SYNONYM canine)"
    )
