"""Multi-database search (Database::add_database, backends/multi.h docid
interleaving) and multi-source compaction (xapian::Compactor /
xapian-compact)."""

from __future__ import annotations

import pytest

from xapian_spark.api import Database, Enquire, WritableDatabase
from xapian_spark.index.compactor import Compactor, compact_databases
from xapian_spark.query import ast

SHARD1 = [(1, "alpha bravo"), (2, "bravo charlie"), (3, "charlie delta")]
SHARD2 = [(1, "echo alpha"), (2, "foxtrot golf")]


@pytest.fixture()
def shards(spark, tmp_path):
    paths = []
    for name, rows in (("s1", SHARD1), ("s2", SHARD2)):
        p = str(tmp_path / name)
        db = WritableDatabase(spark, p, n_ranges=2)
        db.add_documents(
            spark.createDataFrame(rows, "docid long, content string"),
            content_col="content", docid_col="docid",
        )
        db.set_metadata("shared", f"from-{name}")
        db.set_metadata(f"only-{name}", name)
        db.add_synonym("fast", "quick" if name == "s1" else "rapid")
        db.commit()
        paths.append(p)
    return paths


def test_add_database(spark, shards):
    db = Database(spark, shards[0])
    other = Database(spark, shards[1])
    assert db.size() == 1
    db.add_database(other)
    assert db.size() == 2
    assert db.get_doccount() == 5
    # combined stats are exact sums
    assert db.get_termfreq("alpha") == 2  # one per shard
    assert db.get_termfreq("bravo") == 2
    assert db.get_termfreq("foxtrot") == 1
    # interleaved docids: shard docid d of shard i -> (d-1)*n + i + 1
    enq = Enquire(db)
    enq.set_query(ast.Term("alpha"))
    hits = {h.docid for h in enq.get_mset(0, 10)}
    assert hits == {1, 2}  # s1 doc1 -> 1, s2 doc1 -> 2
    assert "alpha bravo" in db.get_document(1)["content"]
    assert "echo alpha" in db.get_document(2)["content"]
    # synonyms union
    assert sorted(db.get_synonyms("fast")) == ["quick", "rapid"]


class _StatusSpy(Compactor):
    def __init__(self, spark):
        super().__init__(spark)
        self.calls = []

    def set_status(self, table, status):
        self.calls.append((table, status))

    def resolve_duplicate_metadata(self, key, values):
        return "|".join(values)


def test_compactor_multi_source(spark, shards, tmp_path):
    dest = str(tmp_path / "combined")
    c = _StatusSpy(spark)
    c.add_source(shards[0])
    c.add_source(shards[1])
    c.set_destdir(dest)
    c.compact()
    assert ("postlist", "done") in c.calls

    db = Database(spark, dest)
    assert db.get_doccount() == 5
    # contiguous renumber: shard2 offset by shard1's max docid (3)
    enq = Enquire(db)
    enq.set_query(ast.Term("alpha"))
    assert {h.docid for h in enq.get_mset(0, 10)} == {1, 4}
    assert "echo" in db.get_document(4)["content"]
    # WAND blocks exist in the compacted warehouse
    assert db.index.blocked is not None
    # metadata: distinct keys kept, conflicting key resolved by override
    assert db.get_metadata("only-s1") == "s1"
    assert db.get_metadata("shared") == "from-s1|from-s2"
    # synonyms + spellings folded
    assert sorted(db.get_synonyms("fast")) == ["quick", "rapid"]


def test_compactor_no_renumber_overlap(spark, shards, tmp_path):
    c = Compactor(spark)
    c.add_source(shards[0])
    c.add_source(shards[1])  # docids 1.. overlap with shard1's
    c.set_destdir(str(tmp_path / "nope"))
    c.set_renumber(False)
    with pytest.raises(ValueError):
        c.compact()


def test_compact_databases_convenience(spark, shards, tmp_path):
    dest = str(tmp_path / "conv")
    compact_databases(spark, shards, dest)
    assert Database(spark, dest).get_doccount() == 5


def test_document_facade_tail():
    """Document::add_boolean_term / remove_postings / clear_* /
    values_count / serialise round-trip (document.h)."""
    from xapian_spark.text.termgen import Document

    d = Document()
    d.set_data("payload")
    d.add_posting("alpha", 1)
    d.add_posting("alpha", 2)
    d.add_posting("alpha", 5)
    d.add_boolean_term("Lpy")
    d.add_value("lang", "py")
    assert d.termlist_count() == 2 and d.values_count() == 1
    assert d.remove_postings("alpha", 1, 2) == 2
    (term, wdf, positions), *_ = [
        e for e in d.termlist() if e[0] == "alpha"
    ]
    assert positions == [5] and wdf == 1
    # serialise round-trips the full state
    d2 = Document.unserialise(d.serialise())
    assert d2.termlist() == d.termlist()
    assert d2.get_data() == "payload" and d2.get_value("lang") == "py"
    d.remove_value("lang")
    assert d.values_count() == 0
    d.clear_terms()
    assert d.termlist_count() == 0
    d.clear_values()
    assert d.values_count() == 0


def test_compactor_consumes_live_views(spark, shards, tmp_path):
    """A committed delete/replace overlay in a source must survive
    multi-source compaction: deleted docs stay deleted, replacements win
    (review finding: raw termlists would resurrect doc 1 here)."""
    db = WritableDatabase(spark, shards[0], n_ranges=2)
    db.delete_document(1)
    db.replace_document(2, {"content": "modified bravo text"})
    db.commit()
    dest = str(tmp_path / "live")
    compact_databases(spark, shards, dest)
    out = Database(spark, dest)
    assert out.get_doccount() == 4  # (3 - 1 deleted) + 2
    enq = Enquire(out)
    enq.set_query(ast.Term("alpha"))
    # shard1's 'alpha bravo' doc is gone; only shard2's doc matches
    # (shard2 offset by shard1's max docid 3 -> docid 4)
    assert {h.docid for h in enq.get_mset(0, 10)} == {4}
    enq.set_query(ast.Term("modified"))
    assert {h.docid for h in enq.get_mset(0, 10)} == {2}
    enq.set_query(ast.Term("charlie"))  # old doc-2 term replaced away
    assert {h.docid for h in enq.get_mset(0, 10)} == {3}
