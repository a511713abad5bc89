"""TermGenerator / Document facade (termgenerator.h, document.h):
driver-side indexing verbs that must agree with the distributed build's
tokenizer (tokenizer.invert_doc is the shared implementation)."""

from __future__ import annotations

import pytest

from xapian_spark.text.stem import Stemmer
from xapian_spark.text.termgen import Document, TermGenerator
from xapian_spark.text.tokenizer import invert_doc


def test_index_text_matches_invert_doc():
    text = "The quick brown fox jumps over the lazy dog"
    tg = TermGenerator()
    tg.index_text(text)
    got = tg.get_document().termlist()
    want, doclen = invert_doc(text)
    assert got == sorted((t, w, ps) for t, w, ps in want)
    assert tg.get_document().get_doclength() == doclen


def test_stemming_and_prefix():
    tg = TermGenerator()
    tg.set_stemmer(Stemmer("english"))
    tg.index_text("connections matter", prefix="XT")
    terms = {t for t, _, _ in tg.get_document().termlist()}
    # stems carry Z BEFORE the prefix (Term::make_term,
    # queryparser.lemony:328-340)
    assert terms == {"XTconnections", "XTmatter", "ZXTconnect", "ZXTmatter"}


def test_termpos_gap_blocks_cross_field_phrases():
    tg = TermGenerator()
    tg.index_text("alpha beta")
    assert tg.get_termpos() == 2
    tg.increase_termpos()  # default 100 (termgenerator.h:205-214)
    tg.index_text("gamma delta")
    d = tg.get_document()
    poss = {t: ps for t, _, ps in d.termlist()}
    assert poss["beta"] == [2] and poss["gamma"] == [103]


def test_without_positions_and_wdf_inc():
    tg = TermGenerator()
    tg.index_text_without_positions("alpha beta alpha", wdf_inc=3)
    d = tg.get_document()
    assert d.termlist() == [("alpha", 6, []), ("beta", 3, [])]
    assert tg.get_termpos() == 0  # counter untouched


def test_stopper_modes():
    tg = TermGenerator()
    tg.set_stemmer(Stemmer("english"))
    tg.set_stopper({"the"}, mode="all")
    tg.index_text("the connection")
    terms = {t for t, _, _ in tg.get_document().termlist()}
    assert "the" not in terms and "Zthe" not in terms
    assert "connection" in terms and "Zconnect" in terms

    tg2 = TermGenerator()
    tg2.set_stemmer(Stemmer("english"))
    tg2.set_stopper({"the"}, mode="stemmed")
    tg2.index_text("the connection")
    terms2 = {t for t, _, _ in tg2.get_document().termlist()}
    # STOP_STEMMED keeps the unstemmed form, suppresses only the Z-stem
    assert "the" in terms2 and "Zthe" not in terms2


def test_document_verbs():
    d = Document()
    d.set_data("payload")
    d.add_posting("alpha", 1)
    d.add_posting("alpha", 5)
    d.add_term("beta", 0)  # boolean term, wdf 0
    d.add_value("lang", "en")
    assert d.get_data() == "payload"
    assert d.termlist() == [("alpha", 2, [1, 5]), ("beta", 0, [])]
    assert d.get_doclength() == 2 and d.get_unique_terms() == 2
    assert d.get_value("lang") == "en"
    d.remove_posting("alpha", 5)
    assert d.termlist()[0] == ("alpha", 1, [1])
    d.remove_term("beta")
    with pytest.raises(ValueError):
        d.remove_term("beta")
    with pytest.raises(ValueError):
        d.remove_posting("alpha", 99)
