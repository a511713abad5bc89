"""Index-build invariants, mirroring xapian-check's structural checks
(`xapian-core/bin/xapian-check.cc`, FIXTURES.md §5):

- per-term tf == number of postings; cf == sum(wdf)
- doclen == sum(wdf) per doc; total_doclen == sum(doclen)
- positions sorted, count == wdf
- content sha256 row invariant survives the pipeline
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tests.conftest import SIMPLE_PARAGRAPHS
from tests.oracle import BruteForceIndex


def _brute(simple_corpus=None):
    docs = {i + 1: t for i, t in enumerate(SIMPLE_PARAGRAPHS)}
    return BruteForceIndex(docs)


def test_global_stats(simple_index):
    b = _brute()
    assert simple_index.stats.doccount == b.N
    assert simple_index.stats.total_doclen == b.total_len


def test_doclens_match_bruteforce(simple_index):
    got = {
        r["docid"]: r["doclen"] for r in simple_index.doclens.collect()
    }
    b = _brute()
    assert got == b.doclen


def test_term_stats_match_bruteforce(simple_index):
    b = _brute()
    rows = simple_index.term_stats.collect()
    got = {r["term"]: (r["tf"], r["cf"], r["wdf_max"]) for r in rows}
    for term, posts in b.postings.items():
        assert got[term][0] == len(posts), term
        assert got[term][1] == sum(posts.values()), term
        assert got[term][2] == max(posts.values()), term


def test_postings_positions_consistent(simple_index):
    rows = simple_index.postings.where(F.col("wdf") > 0).collect()
    b = _brute()
    for r in rows:
        pos = r["positions"]
        assert pos == sorted(pos)
        assert len(pos) == r["wdf"]
        assert pos == b.positions[(r["term"], r["docid"])]


def test_boolean_prefix_terms(simple_index):
    rows = simple_index.postings.where(F.col("term") == "Ltxt").collect()
    assert len(rows) == len(SIMPLE_PARAGRAPHS)
    assert all(r["wdf"] == 0 for r in rows)


def test_doclen_denormalized(simple_index):
    joined = (
        simple_index.postings.alias("p")
        .join(simple_index.doclens.alias("d"), "docid")
        .where(F.col("p.doclen") != F.col("d.doclen"))
        .count()
    )
    assert joined == 0


def test_sha256_invariant(spark, simple_corpus):
    """content sha256 equality end-to-end (BASELINE.json input_hint)."""
    before = {
        r["docid"]: hashlib.sha256(r["content"].encode()).hexdigest()
        for r in simple_corpus.collect()
    }
    from xapian_spark.index.builder import build_index

    idx = build_index(spark, simple_corpus, content_col="content",
                      docid_col="docid")
    after = {
        r["docid"]: r["sha"]
        for r in idx.docs.withColumn(
            "sha", F.sha2(F.col("content"), 256)
        ).collect()
    }
    assert before == after


def test_assign_docids_parallel(spark):
    """Docid assignment must be (a) identical to a global sorted rank,
    (b) identical at every parallelism, (c) free of single-partition
    execution (VERDICT r1 #1: the old global Window moved the whole corpus
    through one task)."""
    from xapian_spark.index.builder import assign_docids

    n = 500
    rows = [((i * 7919) % n, f"repo{(i * 31) % 17}", f"p/{i:05d}")
            for i in range(n)]
    df = spark.createDataFrame(rows, "key int, repo string, path string")
    expected = {
        (r, p): rank + 1
        for rank, (_, r, p) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[2]))
        )
    }
    for nparts in (1, 4, 13):
        out = assign_docids(df, ["repo", "path"], num_partitions=nparts)
        got = {(r["repo"], r["path"]): r["docid"] for r in out.collect()}
        assert got == expected, f"nparts={nparts}"
    # no WindowExec anywhere in the plan, and the data flows through >1
    # partition at nparts > 1
    out = assign_docids(df, ["repo", "path"], num_partitions=4)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    npart_seen = out.select(F.spark_partition_id().alias("p")).distinct().count()
    assert npart_seen > 1


def test_write_read_roundtrip(tmp_path, spark, simple_index):
    from xapian_spark.index.builder import read_index, write_index

    path = str(tmp_path / "warehouse")
    write_index(simple_index, path, term_buckets=4)
    idx2 = read_index(spark, path)
    assert idx2.stats == simple_index.stats
    assert idx2.postings.count() == simple_index.postings.count()
    a = sorted(
        map(tuple, simple_index.postings.select("term", "docid", "wdf").collect())
    )
    c = sorted(map(tuple, idx2.postings.select("term", "docid", "wdf").collect()))
    assert a == c


def test_warehouse_term_filter_pushdown(tmp_path, spark, simple_index):
    """The 100-TB serving claim rests on term predicates reaching the
    parquet scan of the warehouse postings (write_index lays them out
    range-partitioned by (term, docid) precisely so a scan prunes to the
    buckets holding its terms).  Assert the filter is actually pushed:
    the FileScan must advertise it in PushedFilters, not re-check it
    post-scan only."""
    import io
    from contextlib import redirect_stdout

    from xapian_spark.index.builder import read_index, write_index

    path = str(tmp_path / "warehouse_pd")
    write_index(simple_index, path, term_buckets=4)
    idx2 = read_index(spark, path)
    some_term = idx2.postings.select("term").first()["term"]
    filtered = idx2.postings.where(F.col("term") == some_term)

    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    scan = [seg for seg in plan.split("\n\n") if "Scan parquet" in seg]
    assert scan, plan
    assert any(
        "PushedFilters" in seg and "EqualTo(term" in seg for seg in scan
    ), plan
    # and column pruning: a (term, docid) projection must not drag the
    # positions payload through the scan
    buf = io.StringIO()
    with redirect_stdout(buf):
        idx2.postings.select("term", "docid").where(
            F.col("term") == some_term
        ).explain("formatted")
    plan2 = buf.getvalue()
    scan2 = [seg for seg in plan2.split("\n\n") if "Scan parquet" in seg]
    assert scan2 and all("positions" not in seg for seg in scan2), plan2


def test_invert_arrow_fast_slow_parity(spark):
    """The vectorized simple-class path inside invert_arrow must produce
    exactly what the per-doc state-machine path produces — same entries
    (term, wdf, positions) and doclen per doc.  The corpus mixes
    fast-class rows (lowercase words, odd whitespace, empties, a 64-char
    token) with rows the gate must route to the slow path (uppercase,
    acronyms, 65-char token, punctuation, non-ASCII)."""
    from xapian_spark.index.builder import invert_arrow
    from xapian_spark.text.tokenizer import invert_doc

    texts = [
        "plain lower case words",
        "dup dup dup  spaced\tout\nlines",
        "",
        "   ",
        "x_1 9 x_1 " + "a" * 64,
        "a" * 65 + " tail",          # 65-char token -> slow path
        "Upper Case Words",           # slow
        "U.N.C.L.E acronym",          # slow
        "fish+chips c++ done",        # slow
        "café unicode",          # slow
        None,
    ]
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "docid long, text string"
    ).repartition(2)
    out = invert_arrow(df, "text", keep_cols=["docid"]).collect()
    assert len(out) == len(texts)
    for r in out:
        want_entries, want_dl = invert_doc(texts[r["docid"] - 1] or "")
        got = sorted(
            (e["term"], e["wdf"], list(e["positions"])) for e in r["plist"]
        )
        assert got == sorted(want_entries), f"docid {r['docid']}"
        assert r["doclen"] == want_dl


def test_pack_group_duplicate_docids():
    """Duplicate (term, docid) postings must not underflow the delta-1
    coding (uint64 wrap corrupted the rest of the block — review
    finding); duplicates collapse by summing wdf."""
    import numpy as np

    from xapian_spark.index.blocks import _pack_group, vbyte_decode

    rows = _pack_group(
        "t",
        np.array([1, 5, 5, 9], dtype=np.int64),
        np.array([2, 3, 4, 1], dtype=np.int64),
        np.array([10, 10, 10, 10], dtype=np.int64),
        block_size=512,
    )
    assert len(rows) == 1
    term, first, last, n, wdf_max, payload = rows[0]
    assert (first, last, n) == (1, 9, 3)
    ints = vbyte_decode(payload)
    deltas, wdfs = ints[:n], ints[n:2 * n]
    docids = [int(deltas[0])]
    for d in deltas[1:]:
        docids.append(docids[-1] + int(d) + 1)
    assert docids == [1, 5, 9]
    assert list(wdfs) == [2, 7, 1]  # collapsed wdf sum


def test_pack_stream_hot_term_flush_byte_identical():
    """A stopword-class hot term whose carry exceeds the flush threshold is
    packed in block-aligned pieces — the emitted blocks must be
    byte-identical to packing the COMPLETE posting list (blocks restart at
    every block_size boundary with a raw docid, so the cut is invisible)."""
    import numpy as np

    from xapian_spark.index.blocks import _pack_group, _pack_stream

    rng = np.random.default_rng(3)
    n = 10_000  # hot term: many multiples of the tiny flush threshold
    docids = np.cumsum(rng.integers(1, 20, size=n)).astype(np.int64)
    wdfs = rng.integers(1, 9, size=n).astype(np.int64)
    doclens = rng.integers(20, 99, size=n).astype(np.int64)
    terms = np.array(["zhot"] * n, dtype=object)

    ref = _pack_group("zhot", docids, wdfs, doclens, block_size=64)

    # stream it in 17 batches with a flush threshold far below n
    cuts = np.linspace(0, n, 18).astype(int)
    batches = [
        (terms[a:b], docids[a:b], wdfs[a:b], doclens[a:b])
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    got = []
    for tpb, first, last, nb, wmax, stream, offs in _pack_stream(
        iter(batches), block_size=64, flush_postings=1000
    ):
        for i in range(len(tpb)):
            got.append((
                tpb[i], int(first[i]), int(last[i]), int(nb[i]),
                int(wmax[i]), stream[offs[i]:offs[i + 1]].tobytes(),
            ))

    assert len(got) == len(ref) > 100  # the flush actually fired repeatedly
    for r, g in zip(ref, got):
        assert r[0] == g[0] and r[1:5] == g[1:5]
        assert bytes(r[5]) == g[5]


def test_pack_stream_matches_scalar_reference():
    """The vectorized packer (_pack_stream/_pack_region, what the build
    runs via mapInArrow) must emit byte-identical blocks to the scalar
    per-term reference (_pack_group) — including the duplicate-docid
    collapse path and terms spanning batch boundaries."""
    import numpy as np
    import pandas as pd

    from xapian_spark.index.blocks import _pack_group, _pack_stream

    rng = np.random.default_rng(42)
    rows = []
    docid_base = 1
    for t in range(400):
        term = f"t{rng.integers(0, 10**6):06d}"
        n = int(rng.choice([1, 2, 3, 7, 40, 600, 1300]))
        docids = np.sort(rng.choice(50_000, size=n, replace=False)) + docid_base
        for d in docids:
            rows.append((term, int(d), int(rng.integers(1, 9)),
                         int(rng.integers(20, 99))))
            if rng.random() < 0.02:  # inject duplicate (term, docid)
                rows.append((term, int(d), int(rng.integers(1, 9)),
                             int(rng.integers(20, 99))))
    rows.sort(key=lambda r: (r[0], r[1]))
    df = pd.DataFrame(rows, columns=["term", "docid", "wdf", "doclen"])

    # scalar reference: per-term _pack_group over the full posting list
    ref = []
    for term, g in df.groupby("term", sort=True):
        ref += _pack_group(
            term,
            g["docid"].to_numpy(np.int64),
            g["wdf"].to_numpy(np.int64),
            g["doclen"].to_numpy(np.int64),
            block_size=64,
        )

    # vectorized path over awkward batch cuts (terms split across batches)
    cuts = [0, 113, 114, 1000, 2531, len(df)]
    batches = [
        (
            df["term"].to_numpy()[a:b],
            df["docid"].to_numpy(np.int64)[a:b],
            df["wdf"].to_numpy(np.int64)[a:b],
            df["doclen"].to_numpy(np.int64)[a:b],
        )
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    got = []
    for tpb, first, last, nb, wmax, stream, offs in _pack_stream(
        iter(batches), block_size=64
    ):
        for i in range(len(tpb)):
            got.append((
                tpb[i], int(first[i]), int(last[i]), int(nb[i]),
                int(wmax[i]), bytes(stream[offs[i]:offs[i + 1]].tobytes()),
            ))

    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert r[0] == g[0] and r[1:5] == g[1:5]
        assert bytes(r[5]) == g[5]


def test_null_prefix_field_value(spark, tmp_path):
    """A NULL prefix-field value must not emit a NULL boolean term
    (NULL terms fall out of every stage-2 term range and fail the
    blocked-vs-runs invariant — review finding)."""
    from xapian_spark.api import WritableDatabase

    docs = spark.createDataFrame(
        [(1, "alpha words", "py"), (2, "bravo words", None)],
        "docid long, content string, lang string",
    )
    db = WritableDatabase(spark, str(tmp_path / "nullpf"), n_ranges=2,
                          prefix_fields={"lang": "L"})
    db.add_documents(docs, content_col="content", docid_col="docid")
    db.commit()
    assert db.index.postings.where("term IS NULL").count() == 0
    assert db.get_unique_terms(1) == 3  # alpha, words, Lpy
    assert db.get_unique_terms(2) == 2  # no NULL boolean term
    rep = db.check()
    assert all(v == 0 for v in rep.values()), rep


def test_right_size_upsizes_narrow_generated_input(spark):
    """A generated/exploded corpus inherits its base's (often single)
    split, capping the Arrow tokenize pass at one task no matter how many
    cores exist — measured: an 8M-doc exploded corpus built no faster at
    32 cores than at 8.  _right_size must repartition such inputs UP.
    Catalyst stats cannot gate this case (Generate multiplicity is
    invisible to sizeInBytes), so only provably-tiny Generate-free inputs
    are exempt from the upsize."""
    from xapian_spark.index.builder import _right_size

    par = spark.sparkContext.defaultParallelism

    base = spark.createDataFrame(
        [(1, "hello world")], "docid long, content string"
    ).coalesce(1)
    amp = base.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(999)))
    )
    assert amp.rdd.getNumPartitions() == 1
    assert _right_size(amp).rdd.getNumPartitions() == 2 * par

    # provably-tiny Generate-free input (accurate parquet stats) stays
    # untouched — no pointless shuffle on a small single-split table.
    # (Arrow createDataFrame inputs arrive as LogicalRDD with UNKNOWN
    # stats and are upsized conservatively; that costs a trivial 8-task
    # shuffle and is correct for large driver-side corpora.)
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert tiny.rdd.getNumPartitions() == 1
    assert _right_size(tiny).rdd.getNumPartitions() == 1
