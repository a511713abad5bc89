"""Snowball-English (Porter2) stemmer + TermGenerator stemming strategies.

Golden pairs derived by hand from the public Snowball English algorithm
(the algorithm the reference declares in
`xapian-core/languages/english.sbl`); strategy semantics mirror
`termgenerator_internal.cc:318-362`.
"""

from __future__ import annotations

import pytest

from xapian_spark.query import ast
from xapian_spark.query.parser import QueryParser
from xapian_spark.query.planner import Planner
from xapian_spark.text.stem import Stemmer, stem_en
from xapian_spark.text.tokenizer import invert_doc

GOLDEN = {
    # step 1a
    "caresses": "caress",
    "flies": "fli",
    "ties": "tie",
    "cries": "cri",
    "dies": "die",
    "gaps": "gap",
    "gas": "gas",
    "this": "this",
    # step 1b (+ fixups)
    "agreed": "agre",
    "feed": "feed",
    "plotted": "plot",
    "hopping": "hop",
    "hoping": "hope",
    "falling": "fall",
    "owned": "own",
    "sized": "size",
    "meeting": "meet",
    "stating": "state",
    # step 1c
    "cry": "cri",
    "by": "by",
    "say": "say",
    # step 2
    "sensational": "sensat",
    "conditional": "condit",
    "valenci": "valenc",
    "digitizer": "digit",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "cheerfully": "cheer",
    "knightly": "knight",
    # step 3
    "triplicate": "triplic",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "formative": "format",  # 'ative' not in R2; step4 strips 'ive'
    # step 4
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "communism",  # commun prefix -> R1 starts at 6
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # exceptions
    "skis": "ski",
    "dying": "die",
    "lying": "lie",
    "news": "news",
    "sky": "sky",
    "inning": "inning",
    "proceed": "proceed",
    "exceed": "exceed",
    "gently": "gentl",
    "singly": "singl",
    # region prefixes
    "generate": "generat",
    "generically": "generic",
    "arsenic": "arsenic",  # 'arsen' prefix shrinks R1: no 'ic' removal
    # short words
    "a": "a",
    "is": "is",
    "on": "on",
    "running": "run",
    "quickly": "quick",
}


@pytest.mark.parametrize("word,want", sorted(GOLDEN.items()))
def test_golden_stems(word, want):
    assert stem_en(word) == want


def test_stemmer_idempotent_on_stems_common():
    # stems of stems must not crash and stay lowercase ascii
    for w in GOLDEN.values():
        s = stem_en(w)
        assert isinstance(s, str) and s == s.lower()


def test_invert_doc_stem_some():
    """STEM_SOME: positional unstemmed + positionless Z-stems; doclen
    counts both (termgenerator_internal.cc:318-362)."""
    stemmer = Stemmer("en")
    entries, doclen = invert_doc(
        "running quickly", stemmer=stemmer, strategy="some"
    )
    d = {t: (w, ps) for t, w, ps in entries}
    assert d["running"] == (1, [1])
    assert d["quickly"] == (1, [2])
    assert d["Zrun"] == (1, [])
    assert d["Zquick"] == (1, [])
    assert doclen == 4


def test_invert_doc_stem_all():
    entries, doclen = invert_doc(
        "running runs run", stemmer=Stemmer("en"), strategy="all"
    )
    d = {t: (w, ps) for t, w, ps in entries}
    assert d == {"run": (3, [1, 2, 3])}
    assert doclen == 3


def test_invert_doc_stem_all_z():
    entries, _ = invert_doc(
        "running", stemmer=Stemmer("en"), strategy="all_z"
    )
    assert entries == [("Zrun", 1, [1])]


def test_invert_doc_digit_initial_not_stemmed():
    entries, _ = invert_doc(
        "123abc running", stemmer=Stemmer("en"), strategy="some"
    )
    terms = {t for t, _, _ in entries}
    assert "Zrun" in terms
    assert not any(t.startswith("Z1") for t in terms)


def test_invert_doc_stop_stemmed():
    """STOP_STEMMED: stopword stays unstemmed-indexed, gets no Z-stem."""
    entries, _ = invert_doc(
        "the running",
        stopwords=frozenset({"the"}),
        stemmer=Stemmer("en"),
        strategy="some",
        stop_mode="stemmed",
    )
    d = {t for t, _, _ in entries}
    assert "the" in d and "running" in d and "Zrun" in d
    assert "Zthe" not in d


def test_parser_stems_free_terms():
    qp = QueryParser(stemmer=Stemmer("en"))
    q = qp.parse_query("running quickly")
    assert isinstance(q, ast.Or)
    assert {t.term for t in q.subs} == {"Zrun", "Zquick"}


def test_parser_phrase_terms_unstemmed():
    qp = QueryParser(stemmer=Stemmer("en"))
    q = qp.parse_query('"running quickly"')
    assert isinstance(q, ast.Phrase)
    assert [t.term for t in q.subs] == ["running", "quickly"]


def test_parser_near_terms_unstemmed():
    qp = QueryParser(stemmer=Stemmer("en"))
    q = qp.parse_query("running NEAR quickly")
    assert isinstance(q, ast.Near)
    assert [t.term for t in q.subs] == ["running", "quickly"]


def test_parser_capitalized_unstemmed():
    qp = QueryParser(stemmer=Stemmer("en"))
    q = qp.parse_query("Running")
    assert isinstance(q, ast.Term) and q.term == "running"


def test_stemmed_search_end_to_end(spark):
    """Index with STEM_SOME, search with a stemmed parser: morphological
    variants all hit via the Z-term postings."""
    from xapian_spark.index.builder import build_index

    rows = [
        (1, "the dog was running fast"),
        (2, "three dogs run in the park"),
        (3, "he runs daily"),
        (4, "cats sleep all day"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    idx = build_index(
        spark, docs, content_col="content", docid_col="docid",
        stemmer=Stemmer("en"), stem_strategy="some",
    )
    qp = QueryParser(stemmer=Stemmer("en"))
    q = qp.parse_query("running")
    assert isinstance(q, ast.Term) and q.term == "Zrun"
    hits = Planner(idx).search(q, k=10).collect()
    assert {r["docid"] for r in hits} == {1, 2, 3}


def test_stemmed_search_oracle_closure():
    """Pin the dictionary-replay oracle for the stemmed_search driver entry
    (__spark_entry__.oracle_sql): (a) every surface form embedded in the
    oracle's IN lists stems to the intended stem, and (b) the lists are the
    COMPLETE closure of those stems over the sf0.01 and sf0.1 corpus
    vocabularies — so the SQL dictionary reproduces index-time Porter2
    behavior on the driver's data exactly."""
    import os

    import duckdb

    st = Stemmer("en")
    # agent nouns (merger/scanner) are their own Porter2 stems — excluded
    merg = ["merge", "merges", "merged", "merging"]
    scan = ["scan", "scans", "scanned", "scanning"]
    for w in merg:
        assert st(w) == "merg", w
    for w in scan:
        assert st(w) == "scan", w
    # query side: parse-time stems match the oracle's Z-terms
    assert st("merges") == "merg" and st("scanning") == "scan"
    con = duckdb.connect()
    for sf in ("sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        vocab = [
            r[0]
            for r in con.execute(
                "SELECT DISTINCT unnest(regexp_extract_all(lower(text),"
                f" '[a-z0-9_]+')) FROM '{path}'"
            ).fetchall()
        ]
        closure_merg = {v for v in vocab if st(v) == "merg"}
        closure_scan = {v for v in vocab if st(v) == "scan"}
        assert closure_merg == set(merg) & set(vocab), sf
        assert closure_scan == set(scan) & set(vocab), sf


def test_stemmed_search_fr_oracle_closure():
    """Pin the dictionary-replay oracle for the stemmed_search_fr driver
    entry: (a) the query forms and the oracle's IN-list forms stem to the
    intended French stems, and (b) those IN lists are the COMPLETE closure
    of the stems over the sf0.01 and sf0.1 corpus vocabularies — so the
    SQL dictionary reproduces index-time Snowball-French behavior on the
    driver's data exactly."""
    import os

    import duckdb

    st = Stemmer("french")
    # query side: parse-time stems match the oracle's Z-terms
    assert st("merges") == "merg" and st("tables") == "tabl"
    con = duckdb.connect()
    for sf in ("sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        vocab = [
            r[0]
            for r in con.execute(
                "SELECT DISTINCT unnest(regexp_extract_all(lower(text),"
                f" '[a-z0-9_]+')) FROM '{path}'"
            ).fetchall()
        ]
        closure_merg = {v for v in vocab if st(v) == "merg"}
        closure_tabl = {v for v in vocab if st(v) == "tabl"}
        # the oracle's IN lists (__spark_entry__.oracle_sql):
        assert closure_merg == {"merge"}, sf
        assert closure_tabl == {"table"}, sf
