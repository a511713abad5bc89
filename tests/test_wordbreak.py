"""UAX#29 word segmentation: spec-rule goldens + differential check
against the icu4j BreakIterator bundled with Spark (restricted to
non-dictionary scripts, where ICU applies the same default rules)."""

from __future__ import annotations

import random

import pytest

from xapian_spark.text.wordbreak import (
    word_boundaries,
    word_segments,
    word_tokens,
)

# rule-by-rule goldens, inputs from the published UAX#29 rule table
GOLDENS = [
    # WB3/WB3a/WB3b: newlines always break, CR x LF stays one segment
    ("ab\r\ncd", ["ab", "\r\n", "cd"]),
    ("a\nb", ["a", "\n", "b"]),
    # WB3d: WSegSpace x WSegSpace
    ("a  b", ["a", "  ", "b"]),
    # WB4: Extend/Format/ZWJ attach to the preceding char
    ("étude", ["étude"]),
    # WB5: AHLetter x AHLetter
    ("hello", ["hello"]),
    # WB6/WB7: MidLetter / MidNumLet / Single_Quote between letters
    ("can't", ["can't"]),
    ("a:b", ["a:b"]),
    ("a.b", ["a.b"]),
    ("a.", ["a", "."]),
    (".b", [".", "b"]),
    # WB7a: Hebrew_Letter x Single_Quote
    ("א'", ["א'"]),
    # WB7b/WB7c: Hebrew_Letter Double_Quote Hebrew_Letter
    ('א"ב', ['א"ב']),
    ('a"b', ["a", '"', "b"]),
    # WB8/WB9/WB10: numeric runs and letter-digit adjacency
    ("1234", ["1234"]),
    ("v1", ["v1"]),
    ("1a", ["1a"]),
    # WB11/WB12: MidNum / MidNumLet between digits
    ("3.14", ["3.14"]),
    ("1,024", ["1,024"]),
    ("1,", ["1", ","]),
    # WB13: Katakana x Katakana
    ("カタカナ", ["カタカナ"]),
    # WB13a/WB13b: ExtendNumLet connectors
    ("a_b_1", ["a_b_1"]),
    ("_a", ["_a"]),
    ("1_", ["1_"]),
    ("カ_x", ["カ_x"]),
    # WB15/WB16: regional-indicator pairs
    ("\U0001f1fa\U0001f1f8\U0001f1ec\U0001f1e7",
     ["\U0001f1fa\U0001f1f8", "\U0001f1ec\U0001f1e7"]),
    # WB999 defaults: Han / Thai / Hiragana are per-codepoint segments
    ("中文abc", ["中", "文", "abc"]),
    ("ไทย", ["ไ", "ท", "ย"]),
    # Hangul syllables are ALetter: whole word joins
    ("한국어 test", ["한국어", " ", "test"]),
]


@pytest.mark.parametrize("text,want", GOLDENS)
def test_uax29_rule_goldens(text, want):
    assert word_segments(text) == want


def test_word_tokens_drops_space_and_punct():
    assert word_tokens("Hello, world!") == ["Hello", "world"]
    assert word_tokens("中文 ok") == ["中", "文", "ok"]
    assert word_tokens("") == []


def test_boundaries_cover_text():
    for text, _ in GOLDENS:
        b = word_boundaries(text)
        assert b[0] == 0 and b[-1] == len(text)
        assert b == sorted(set(b))


def _icu_boundaries(jvm, text: str) -> list[int]:
    bi = jvm.com.ibm.icu.text.BreakIterator.getWordInstance()
    bi.setText(text)
    out = [bi.first()]
    while True:
        n = bi.next()
        if n == -1:  # BreakIterator.DONE
            break
        out.append(n)
    return out


def test_tokenizer_word_breaks_positions():
    """FLAG_WORD_BREAKS index side: each UAX#29 segment of an unbroken
    run is one positional token — Katakana runs join (WB13), Thai chars
    split (WB999) — and no bigrams are emitted."""
    from xapian_spark.text.tokenizer import tokenize_with_positions

    toks = tokenize_with_positions("abcカタカナไทย xy", word_breaks=True)
    assert toks == [
        ("abc", 1), ("カタカナ", 2), ("ไ", 3), ("ท", 4), ("ย", 5),
        ("xy", 6),
    ]
    # without the flag the same text n-grams (bigram terms appear)
    ng = tokenize_with_positions("abcカタカナไทย xy", word_breaks=False)
    assert ("カタ", None) in ng


def test_invert_doc_word_breaks():
    from xapian_spark.text.tokenizer import invert_doc

    entries, doclen = invert_doc("カナ カナ ไท", word_breaks=True)
    d = {t: (w, ps) for t, w, ps in entries}
    assert d["カナ"] == (2, [1, 2])
    assert d["ไ"] == (1, [3])
    assert d["ท"] == (1, [4])
    assert doclen == 4


def test_termgen_word_breaks_flag():
    from xapian_spark.api import Document
    from xapian_spark.text.termgen import TermGenerator

    tg = TermGenerator()
    tg.set_flags({"word_breaks"})
    doc = Document()
    tg.set_document(doc)
    tg.index_text("カタカナไทย")
    terms = {t: ps for t, _w, ps in doc.termlist()}
    assert terms["カタカナ"] == [1]
    assert terms["ไ"] == [2] and terms["ท"] == [3] and terms["ย"] == [4]
    assert "カタ" not in terms  # no n-gram bigrams under the flag


def test_parser_word_breaks_run():
    """Query side (lemony:574-586): an unbroken run parses to an AND of
    its UAX#29 segments, all at ONE position."""
    from xapian_spark.query import ast
    from xapian_spark.query.parser import QueryParser

    qp = QueryParser(word_breaks=True)
    node = qp.parse_query("カタカナไทย hello")
    assert isinstance(node, ast.Or)
    run, latin = node.subs
    assert isinstance(run, ast.And)
    assert [t.term for t in run.subs] == ["カタカナ", "ไ", "ท", "ย"]
    assert {t.pos for t in run.subs} == {1}
    assert latin.term == "hello" and latin.pos == 2


def test_snippet_word_breaks_highlight():
    from xapian_spark.query.snippet import SNIPPET_WORD_BREAKS, snippet

    out = snippet(
        "アイウ카타ไทย", {"ไ": 2.0}, flags=SNIPPET_WORD_BREAKS,
    )
    assert "<b>ไ</b>" in out
    # the Katakana run stays one unhighlighted span
    assert "<b>アイウ</b>" not in out


def test_end_to_end_word_breaks_search(spark):
    """Index with word_breaks=True, query through the parser with the
    matching flag, get ranked matches (mirrors test_end_to_end_cjk_search)."""
    from xapian_spark.index.builder import build_index
    from xapian_spark.query.parser import QueryParser
    from xapian_spark.query.planner import Planner

    rows = [
        (1, "カタカナ ไทย news"),
        (2, "ไทย only here"),
        (3, "nothing relevant at all"),
        (4, "カタカナ remix"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    idx = build_index(
        spark, docs, content_col="content", docid_col="docid",
        word_breaks=True,
    )
    qp = QueryParser(word_breaks=True)
    got = [
        r["docid"]
        for r in Planner(idx).search(qp.parse_query("ไทย"), k=10).collect()
    ]
    assert set(got) == {1, 2}
    got2 = [
        r["docid"]
        for r in Planner(idx).search(
            qp.parse_query("カタカナ"), k=10
        ).collect()
    ]
    assert set(got2) == {1, 4}


def test_differential_vs_icu4j(spark):
    """Differential vs the icu4j word BreakIterator on scripts where ICU
    applies the pure UAX#29 default rules (no segmentation dictionary):
    Latin, digits, punctuation, Hebrew, Katakana, combining marks,
    ZWJ/emoji.  Dictionary scripts are excluded — there ICU adds
    dictionary segmentation on top of UAX#29, which is a documented
    divergence (see wordbreak.py docstring).  That includes HANGUL:
    the UCD assigns Hangul syllables Word_Break=ALetter (the behavior the
    spec goldens above pin), but ICU's word rules tailor Hangul into its
    CJ dictionary path and break between Hangul and other letters.

    Note: icu4j boundaries index UTF-16 code units; restrict the alphabet
    to BMP chars plus surrogate-PAIR emoji and convert via a UTF-16
    offset map.
    """
    jvm = spark._jvm
    alphabet = [
        "a", "B", "z", "é", "3", "0", ".", ",", ":", "'", '"', "_",
        "-", " ", "\r", "\n", "א", "ב", "ア", "カ",
        "́", "‍", "!", "?", "@",
    ]
    rnd = random.Random(29)
    for _ in range(300):
        text = "".join(
            rnd.choice(alphabet) for _ in range(rnd.randint(1, 12))
        )
        assert word_boundaries(text) == _icu_boundaries(jvm, text), repr(
            text
        )
