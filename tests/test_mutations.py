"""WritableDatabase mutation verbs: delete_document / replace_document /
transactions / spelling + synonym maintenance / compact-folds-overlay.

Reference contract: database.h (delete_document, replace_document,
begin/commit/cancel_transaction, add_spelling, remove_spelling,
remove_synonym, clear_synonyms, get_revision).  The Spark re-expression
is LSM-shaped: commit() writes tombstones/delta overlays (cheap, no base
rewrite — what survives at 10^12 files), compact() folds them physically
like a Lucene segment merge / xapian-compact."""

from __future__ import annotations

import os

import pytest

from xapian_spark.api import Enquire, WritableDatabase
from xapian_spark.query import ast

DOCS = [
    (1, "alpha bravo charlie", "py"),
    (2, "bravo delta echo", "py"),
    (3, "charlie echo foxtrot", "go"),
    (4, "delta foxtrot golf", "go"),
    (5, "echo golf hotel unique_marker_five", "rs"),
    (6, "foxtrot hotel india", "rs"),
]


@pytest.fixture()
def wdb(spark, tmp_path):
    path = str(tmp_path / "mutdb")
    db = WritableDatabase(spark, path, n_ranges=2,
                          prefix_fields={"lang": "L"})
    docs = spark.createDataFrame(
        DOCS, "docid long, content string, lang string"
    )
    db.add_documents(docs, content_col="content", docid_col="docid")
    db.commit()
    return db


def _docids(db, term: str) -> set[int]:
    enq = Enquire(db)
    enq.set_query(ast.Term(term))
    return {m.docid for m in enq.get_mset(0, 10)}


def test_delete_by_docid_and_term(wdb):
    assert wdb.get_doccount() == 6
    assert wdb.get_revision() == 1

    wdb.delete_document(2)
    wdb.commit()
    assert wdb.get_doccount() == 5
    assert wdb.get_revision() == 2
    assert _docids(wdb, "bravo") == {1}
    assert 2 not in _docids(wdb, "echo")

    # unique-ID-term form deletes every doc indexed by the term
    wdb.delete_document("unique_marker_five")
    wdb.commit()
    assert wdb.get_doccount() == 4
    assert _docids(wdb, "hotel") == {6}
    # stats reflect the live view exactly
    assert wdb.get_total_length() == sum(
        len(c.split()) for d, c, _l in DOCS if d not in (2, 5)
    )


def test_replace_document(wdb):
    uuid_before = wdb.get_uuid()
    wdb.replace_document(3, {"content": "charlie zulu yankee", "lang": "py"})
    wdb.commit()
    assert wdb.get_doccount() == 6  # replace, not add
    assert _docids(wdb, "zulu") == {3}
    assert 3 not in _docids(wdb, "foxtrot")  # old postings gone
    assert 3 in _docids(wdb, "charlie")  # kept term still matches
    # the docdata row is the replacement (value slots updated)
    assert wdb.get_document(3)["lang"] == "py"
    # prefixed boolean field terms re-emitted for the new row
    assert 3 in _docids(wdb, "Lpy")
    assert wdb.get_uuid() == uuid_before  # same database identity


def test_compact_folds_overlay(wdb):
    wdb.delete_document(1)
    wdb.replace_document(4, {"content": "delta golf kilo", "lang": "go"})
    wdb.commit()
    before = {t: _docids(wdb, t) for t in ("kilo", "golf", "alpha", "delta")}
    uuid_before, rev_before = wdb.get_uuid(), wdb.get_revision()
    assert os.path.exists(os.path.join(wdb.path, "tombstones"))
    assert os.path.exists(os.path.join(wdb.path, "delta"))
    assert wdb.index.blocked is None  # overlay serves via row postings

    wdb.compact()
    assert not os.path.exists(os.path.join(wdb.path, "tombstones"))
    assert not os.path.exists(os.path.join(wdb.path, "delta"))
    assert not os.path.exists(os.path.join(wdb.path, "delta_docs"))
    assert wdb.index.blocked is not None  # WAND path restored
    assert wdb.get_doccount() == 5
    after = {t: _docids(wdb, t) for t in ("kilo", "golf", "alpha", "delta")}
    assert before == after
    assert wdb.get_uuid() == uuid_before  # uuid survives compaction
    assert wdb.get_revision() == rev_before + 1
    # docdata folded too: deleted doc gone, replacement row present
    assert wdb.get_document(4)["lang"] == "go"
    with pytest.raises(KeyError):
        wdb.get_document(1)


def test_transactions(wdb):
    wdb.begin_transaction()
    wdb.delete_document(6)
    wdb.cancel_transaction()
    wdb.commit()
    assert wdb.get_doccount() == 6  # rollback discarded the delete

    wdb.begin_transaction()
    wdb.delete_document(6)
    with pytest.raises(RuntimeError):
        wdb.commit()  # must resolve the transaction first
    wdb.commit_transaction()
    assert wdb.get_doccount() == 5

    with pytest.raises(RuntimeError):
        wdb.cancel_transaction()  # none in progress


def test_spelling_maintenance(wdb):
    # not an index term, not yet added: suggestion falls back to index terms
    assert wdb.get_spelling_suggestion("xylophone") is None
    wdb.add_spelling("xylophone")
    wdb.commit()
    assert wdb.get_spelling_suggestion("xylophone") is None  # now a word
    assert wdb.get_spelling_suggestion("xylophoen") == "xylophone"
    assert ("xylophone", 1) in wdb.spellings()
    wdb.remove_spelling("xylophone")
    wdb.commit()
    assert wdb.spellings() == []
    assert wdb.get_spelling_suggestion("xylophoen") is None


def test_synonym_maintenance(wdb):
    wdb.add_synonym("fast", "quick")
    wdb.add_synonym("fast", "rapid")
    wdb.add_synonym("slow", "sluggish")
    wdb.commit()
    assert sorted(wdb.get_synonyms("fast")) == ["quick", "rapid"]

    wdb.remove_synonym("fast", "rapid")
    wdb.commit()
    assert wdb.get_synonyms("fast") == ["quick"]

    wdb.clear_synonyms("fast")
    wdb.commit()
    assert wdb.get_synonyms("fast") == []
    assert wdb.get_synonyms("slow") == ["sluggish"]


def test_interleaved_delete_replace(wdb):
    """Per-docid last-op-wins within a commit, and tombstone-vs-delta
    generation ordering across commits (a later delete must never be
    resurrected by an earlier replacement's delta row)."""
    # replace then delete in ONE commit: the delete wins
    wdb.replace_document(2, {"content": "resurrect me", "lang": "py"})
    wdb.delete_document(2)
    wdb.commit()
    assert wdb.get_doccount() == 5
    assert _docids(wdb, "resurrect") == set()
    # delete then replace in ONE commit: the replace wins (doc lives on)
    wdb.delete_document(3)
    wdb.replace_document(3, {"content": "phoenix words", "lang": "go"})
    wdb.commit()
    assert wdb.get_doccount() == 5
    assert _docids(wdb, "phoenix") == {3}
    # replace in commit A, delete in commit B: tombstone is NEWER than
    # the delta row, so the doc is gone — postings AND docs view
    wdb.replace_document(4, {"content": "zombie content", "lang": "go"})
    wdb.commit()
    assert _docids(wdb, "zombie") == {4}
    wdb.delete_document(4)
    wdb.commit()
    assert wdb.get_doccount() == 4
    assert _docids(wdb, "zombie") == set()
    import pytest as _pytest

    with _pytest.raises(KeyError):
        wdb.get_document(4)
    # delete in commit A, replace in commit B: the doc comes back
    wdb.delete_document(5)
    wdb.commit()
    assert wdb.get_doccount() == 3
    wdb.replace_document(5, {"content": "lazarus five", "lang": "rs"})
    wdb.commit()
    assert wdb.get_doccount() == 4
    assert _docids(wdb, "lazarus") == {5}
    # compact folds the whole history to the same observable state
    before = {
        t: _docids(wdb, t)
        for t in ("resurrect", "phoenix", "zombie", "lazarus", "alpha")
    }
    wdb.compact()
    after = {
        t: _docids(wdb, t)
        for t in ("resurrect", "phoenix", "zombie", "lazarus", "alpha")
    }
    assert before == after
    assert wdb.get_doccount() == 4


def test_synonym_op_order(wdb):
    """Synonym ops honour call order: remove-then-add keeps the pair,
    clear-then-add keeps only the later add (review finding)."""
    wdb.add_synonym("fast", "quick")
    wdb.commit()
    wdb.remove_synonym("fast", "quick")
    wdb.add_synonym("fast", "quick")  # later add wins
    wdb.commit()
    assert wdb.get_synonyms("fast") == ["quick"]
    wdb.add_synonym("fast", "rapid")
    wdb.clear_synonyms("fast")
    wdb.add_synonym("fast", "speedy")  # add AFTER the clear survives
    wdb.commit()
    assert wdb.get_synonyms("fast") == ["speedy"]


def test_memos_invalidated_on_mutation(wdb):
    """Driver-side memoized aggregates refresh when the index view
    changes (review finding: a stale 'upper bound' is not a bound)."""
    ub_before = wdb.get_unique_terms_upper_bound()
    big = " ".join(f"uniq{i}" for i in range(ub_before + 20))
    wdb.replace_document(6, {"content": big, "lang": "rs"})
    wdb.commit()
    assert wdb.get_unique_terms_upper_bound() >= ub_before + 20
    assert wdb.get_lastdocid() == 6


def test_term_delete_sees_pending_replacement(wdb):
    """A term-delete AFTER a same-commit replacement that introduces the
    term must delete the replaced doc (reference call-order semantics)."""
    wdb.replace_document(1, {"content": "freshword bravo", "lang": "py"})
    wdb.delete_document("freshword")
    wdb.commit()
    assert wdb.get_doccount() == 5
    assert _docids(wdb, "freshword") == set()
    # reversed order: the replacement issued AFTER the term-delete lives
    wdb.delete_document("golf")  # matches docs 4,5 (committed postings)
    wdb.replace_document(4, {"content": "golf reborn", "lang": "go"})
    wdb.commit()
    assert _docids(wdb, "reborn") == {4}
    assert 5 not in _docids(wdb, "golf")


def test_null_collapse_key_not_collapsed(spark, tmp_path):
    """Docs with a NULL collapse key are never collapsed together
    (collapser.cc: an empty key leaves the doc uncollapsed)."""
    path = str(tmp_path / "nulldb")
    db = WritableDatabase(spark, path, n_ranges=2)
    docs = spark.createDataFrame(
        [(1, "shared words", "g1"), (2, "shared words", "g1"),
         (3, "shared words", None), (4, "shared words", None),
         (5, "shared words", None)],
        "docid long, content string, grp string",
    )
    db.add_documents(docs, content_col="content", docid_col="docid")
    db.commit()
    enq = Enquire(db)
    enq.set_query(ast.Term("shared"))
    enq.set_collapse_key("grp")
    m = enq.get_mset(0, 10)
    # one survivor for g1, ALL THREE null-key docs survive
    assert len(m) == 4
    assert {h.docid for h in m} >= {3, 4, 5}
    assert all(
        h.get_collapse_count() == 0 for h in m if h.get_collapse_key() is None
    )


def test_max_possible_covers_wildcards(wdb):
    """get_max_possible expands wildcard leaves before bounding (review
    finding: an unexpanded wildcard made the 'upper bound' 0)."""
    enq = Enquire(wdb)
    enq.set_query(ast.Wildcard("fox", combiner="or"))
    m = enq.get_mset(0, 10)
    assert len(m) > 0
    assert m.get_max_possible() >= m.get_max_attained() > 0


def test_multiple_add_batches_one_commit(spark, tmp_path):
    """Several add_documents calls fold into ONE build at commit() — the
    reference buffers add_document rows until flush the same way
    (glass_database.cc flush thresholds).  Batches with different
    content/docid column names and different value-slot columns union."""
    path = str(tmp_path / "multibatch")
    db = WritableDatabase(spark, path, n_ranges=2)
    b1 = spark.createDataFrame(
        [(1, "alpha bravo", "x")], "docid long, content string, tag string"
    )
    b2 = spark.createDataFrame(
        [(2, "bravo charlie")], "doc_id long, body string"
    )
    db.add_documents(b1, content_col="content", docid_col="docid")
    db.add_documents(b2, content_col="body", docid_col="doc_id")
    db.commit()
    assert db.get_doccount() == 2
    assert _docids(db, "bravo") == {1, 2}
    assert _docids(db, "alpha") == {1}
    assert _docids(db, "charlie") == {2}
