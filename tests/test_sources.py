"""Corpus I/O surface (xapian_spark/io/sources.py): the north-rule input
shape — a table of source-code files (repo, path, commit, lang, content)
— synthesized deterministically per FIXTURES.md §1, round-tripped through
every in-container format, and driven end-to-end through the warehouse
build with the content_sha256 row invariant verified.

(The "iceberg" branch of read_corpus is `spark.read.table`, which needs a
catalog this container doesn't ship; its format DISPATCH is covered here,
the actual read is exercised in production via the same DataSource V2
path parquet uses.)
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from xapian_spark.index import merge
from xapian_spark.io.sources import (
    CORPUS_COLUMNS,
    read_corpus,
    with_content_hash,
    write_corpus,
)

EXT = {"c": "c", "cpp": "cc", "py": "py", "java": "java",
       "go": "go", "rs": "rs", "js": "js", "txt": "txt"}
LANGS = list(EXT)

WORDS = ["merge", "vector", "fast", "dup", "index", "parse", "block",
         "query", "token", "hash", "scan", "sort"]


def synth_corpus(spark, n: int = 30, seed: int = 7):
    """FIXTURES.md §1 generator rules, tiny scale (hand-checkable)."""
    rows = []
    for i in range(n):
        lang = LANGS[i % len(LANGS)]
        content = " ".join(
            WORDS[(seed + i * 13 + j * 5) % len(WORDS)] for j in range(12)
        )
        rows.append((
            f"org{i % 7}/proj{i % 23}",
            f"src/mod{i % 41}/file{i}.{EXT[lang]}",
            hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(),
            lang,
            content,
        ))
    return spark.createDataFrame(rows, list(CORPUS_COLUMNS))


class TestReadWrite:
    @pytest.mark.parametrize("fmt,ext", [
        ("parquet", "pq"), ("json", "jsonl"), ("csv", "csv"),
    ])
    def test_roundtrip_all_formats(self, spark, tmp_path, fmt, ext):
        src = synth_corpus(spark)
        path = str(tmp_path / f"corpus_{fmt}")
        write_corpus(src, path, fmt=fmt)
        back = read_corpus(spark, path, fmt=fmt)
        assert set(CORPUS_COLUMNS) <= set(back.columns)
        a = {tuple(r) for r in src.select(*CORPUS_COLUMNS).collect()}
        b = {tuple(r) for r in back.select(*CORPUS_COLUMNS).collect()}
        assert a == b

    def test_auto_format_detection(self, spark, tmp_path):
        src = synth_corpus(spark, n=8)
        pq = str(tmp_path / "corpus_dir")  # no extension -> parquet
        write_corpus(src, pq, fmt="parquet")
        assert read_corpus(spark, pq).count() == 8
        js = str(tmp_path / "corpus.jsonl")
        write_corpus(src, js, fmt="json")
        assert read_corpus(spark, js).count() == 8

    def test_text_format_one_doc_per_line(self, spark, tmp_path):
        p = tmp_path / "docs.txt"
        p.write_text("alpha beta\ngamma delta\n")
        df = read_corpus(spark, str(p))
        assert df.columns == ["content"]
        assert df.count() == 2

    def test_missing_content_column_rejected(self, spark, tmp_path):
        path = str(tmp_path / "bad")
        spark.range(3).write.parquet(path)
        with pytest.raises(ValueError, match="missing content column"):
            read_corpus(spark, path)

    def test_partitioned_write_prunes(self, spark, tmp_path):
        # lang partitioning: the 10^12-file layout lever — a lang filter
        # must prune at the file listing, visible as PartitionFilters
        src = synth_corpus(spark, n=24)
        path = str(tmp_path / "by_lang")
        write_corpus(src, path, fmt="parquet", partition_by=["lang"])
        back = read_corpus(spark, path).where(F.col("lang") == "py")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert back.count() == 3

    def test_content_hash_matches_hashlib(self, spark):
        src = with_content_hash(synth_corpus(spark, n=5))
        for r in src.collect():
            assert (
                r["content_sha256"]
                == hashlib.sha256(r["content"].encode()).hexdigest()
            )


class TestEndToEnd:
    def test_corpus_to_warehouse_with_sha_invariant(self, spark, tmp_path):
        """The north-rule pipeline shape: synthesized corpus table ->
        read_corpus -> docid assignment -> warehouse build -> reopened
        index answers a query; verify_invariants confirms the
        content_sha256 row invariant survived the whole pipeline."""
        from xapian_spark.index.builder import assign_docids
        from xapian_spark.query import ast
        from xapian_spark.query.planner import Planner

        corpus_path = str(tmp_path / "corpus")
        write_corpus(synth_corpus(spark), corpus_path, fmt="parquet")
        docs = assign_docids(
            read_corpus(spark, corpus_path), ["repo", "path"]
        )

        wh = str(tmp_path / "wh")
        merge.build_warehouse(spark, docs, wh, n_ranges=2)
        assert merge.warehouse_complete(wh)

        out = merge.verify_invariants(spark, wh, docs=docs)
        assert out["sha256_mismatches"] == 0
        assert all(v == 0 for v in out.values())

        idx = merge.read_warehouse(spark, wh)
        hits = Planner(idx).search(ast.Term("merge"), k=5).collect()
        assert hits and all(r["score"] > 0 for r in hits)
