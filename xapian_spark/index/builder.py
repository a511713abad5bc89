"""Distributed inverted-index build.

Spark-first re-expression of the reference write path
(`WritableDatabase::add_document` -> `Inverter` -> `merge_changes`;
`xapian-core/backends/glass/glass_inverter.h:43-170`,
`glass_postlist.h:86-97`):

    corpus
      -> deterministic dense docid (row_number over natural key)
      -> Arrow-batched tokenizer UDF (text -> [(term, pos)])
      -> posexplode -> groupBy(term, docid): wdf + sorted positions
      -> doclen denormalized onto every posting row (kills the query-time
         doclens join; the reference reads doclen from a co-resident
         postlist, glass_postlist.h:53-56 — same locality idea)
      -> term_stats (tf, cf, wdf_max) + global stats

The *inversion* is Spark's shuffle itself: groupBy(term, docid) is the
map-side-combined equivalent of the reference's in-memory `Inverter` maps,
and the blocked layout (see blocks.py / merge.py) is the analogue of
`merge_postlists` in xapian-compact (glass_compact.cc:80-340).

Skew: term frequency is Zipfian — stopword-class terms ("the", "int",
"license") produce hot keys.  groupBy(term, docid) is NOT skewed by term
alone (docid spreads the key space).  The skew-sensitive stage is the
per-term block layout, which merge.py handles by splitting each term's
postings into bounded blocks (window row_number -> block_no) so no single
task ever holds a whole hot term. AQE skew-join splitting is on as a
backstop (session.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xapian_spark.ranking.weights import GlobalStats, TermStats
from xapian_spark.text.tokenizer import (
    invert_doc,
    tokenize_batch,
    tokenize_with_positions,
)

TOKENS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

# Map-side-inverted per-doc postings: the UDF output is already aggregated
# per (doc, term), so no cluster-wide groupBy is needed for wdf/positions.
INVERTED_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("wdf", T.IntegerType()),
            T.StructField("positions", T.ArrayType(T.IntegerType())),
        ]
    )
)


def tokenizer_udf(mode: str = "xapian", stopwords: frozenset[str] | None = None):
    """Arrow-batched pandas UDF: text -> array<struct<term,pos>>."""

    def _tok(texts: pd.Series) -> pd.Series:
        return pd.Series(
            tokenize_batch(texts.tolist(), mode=mode, stopwords=stopwords)
        )

    return F.pandas_udf(_tok, TOKENS_TYPE)


def inverter_udf(mode: str = "xapian", stopwords: frozenset[str] | None = None):
    """Arrow-batched pandas UDF: text -> array<struct<term,wdf,positions>>.

    This is the Spark analogue of the reference's in-memory `Inverter`
    (glass_inverter.h:43-170): each document is inverted LOCALLY inside the
    UDF (one dict pass per doc), so wdf, positions and doclen never need a
    cluster-wide shuffle — the only shuffles left in the index build are the
    term-major layout repartition and the per-term stats aggregation.  At
    10^12 docs this removes the dominant (term, docid) shuffle entirely.

    NOTE: prefer invert_arrow() in the build hot path — same semantics,
    but it constructs the nested Arrow output from flat offset arrays
    instead of Python object trees (~3x faster end to end).
    """

    def _inv(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts.tolist():
            # ngram bigrams arrive with position None (wdf-only) — track
            # wdf and positions separately, same as invert_doc
            wdf_acc: dict[str, int] = {}
            pos_acc: dict[str, list[int]] = {}
            for term, pos in tokenize_with_positions(
                text or "", mode=mode, stopwords=stopwords
            ):
                wdf_acc[term] = wdf_acc.get(term, 0) + 1
                if pos is not None:
                    pos_acc.setdefault(term, []).append(pos)
            out.append(
                [(t, w, pos_acc.get(t, [])) for t, w in wdf_acc.items()]
            )
        return pd.Series(out)

    return F.pandas_udf(_inv, INVERTED_TYPE)


def invert_arrow(
    df: DataFrame,
    content_col: str,
    keep_cols: list[str],
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    stemmer=None,
    stem_strategy: str = "some",
    stop_mode: str = "all",
    word_breaks: bool = False,
) -> DataFrame:
    """mapInArrow inverter: (keep_cols..., content) ->
    (keep_cols..., plist, doclen).

    The Python work per doc is one dict pass (the `Inverter` buffer); the
    nested Arrow output is assembled from FLAT value+offset arrays
    (pa.ListArray.from_arrays), avoiding per-object Python->Arrow
    conversion.  Texts in the "simple" class (`^[a-z0-9_\\s]*$`, no
    65+-char token — detected per row with Arrow's RE2 kernel) skip
    per-doc Python entirely: the whole sub-batch is inverted with
    NumPy/Arrow-native ops (C-level whitespace split, dictionary encode,
    one lexsort) at ~7x the per-doc throughput; only rows outside the
    class take the exact state-machine path.  Differential parity between
    the two paths is pinned in tests/test_index.py.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    in_schema = df.schema
    keep_fields = ", ".join(
        f"`{c}` {in_schema[c].dataType.simpleString()}" for c in keep_cols
    )
    out_schema = (
        keep_fields
        + ", plist array<struct<term:string,wdf:int,positions:array<int>>>"
        + ", doclen bigint"
    )
    # the vectorized path computes exactly invert_doc's default semantics,
    # so it only applies under default options
    # (word_breaks doesn't gate vectorizability: the fast path only takes
    # simple-class ASCII rows, which contain no unbroken-script runs)
    vectorizable = (
        mode == "xapian" and stemmer is None and stopwords is None
    )

    def invert_fast_block(texts: pa.Array):
        """Vectorized inversion of simple-class texts.

        ascii_split_whitespace == the tokenizer for this class (every
        separator is ASCII whitespace, every token is [a-z0-9_]+ <= 64
        bytes); empty tokens from leading/trailing runs are masked out
        before position assignment.  One lexsort by (doc, term-code)
        groups postings; positions stay ascending because lexsort is
        stable and input positions are in document order.
        """
        toks = pc.ascii_split_whitespace(texts)
        off = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.flatten()
        ndocs = len(texts)
        raw_counts = np.diff(off)
        doc_idx_all = np.repeat(np.arange(ndocs, dtype=np.int64), raw_counts)
        keep = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx_all[keep]
        counts = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
        kstart = np.concatenate(([0], np.cumsum(counts)[:-1]))
        total = int(counts.sum())
        pos = (
            np.arange(total, dtype=np.int64) - kstart[doc_idx] + 1
        ).astype(np.int32)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((codes, doc_idx))
        sd, sc, sp = doc_idx[order], codes[order], pos[order]
        if total:
            change = np.concatenate(
                ([True], (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1]))
            )
            estarts = np.flatnonzero(change)
            eends = np.concatenate((estarts[1:], [total]))
            edoc, ecode = sd[estarts], sc[estarts]
            terms = denc.dictionary.take(pa.array(ecode, pa.int64()))
            wdf = (eends - estarts).astype(np.int32)
            per_doc = np.bincount(edoc, minlength=ndocs)
        else:
            estarts = np.zeros(0, dtype=np.int64)
            terms = pa.array([], pa.string())
            wdf = np.zeros(0, dtype=np.int32)
            per_doc = np.zeros(ndocs, dtype=np.int64)
        pos_list = pa.ListArray.from_arrays(
            pa.array(np.concatenate((estarts, [total])), pa.int32()),
            pa.array(sp, pa.int32()),
        )
        struct = pa.StructArray.from_arrays(
            [terms, pa.array(wdf, pa.int32()), pos_list],
            names=["term", "wdf", "positions"],
        )
        doc_off = pa.array(
            np.concatenate(([0], np.cumsum(per_doc))), pa.int32()
        )
        return (
            pa.ListArray.from_arrays(doc_off, struct),
            pa.array(counts, pa.int64()),
        )

    def invert_slow_block(texts_py):
        doc_off = [0]
        terms: list[str] = []
        wdfs: list[int] = []
        pos_off = [0]
        flat_pos: list[int] = []
        doclens: list[int] = []
        for text in texts_py:
            entries, dl = invert_doc(
                text or "", mode=mode, stopwords=stopwords,
                stemmer=stemmer, strategy=stem_strategy,
                stop_mode=stop_mode, word_breaks=word_breaks,
            )
            for t, w, ps in entries:
                terms.append(t)
                wdfs.append(w)
                flat_pos.extend(ps)
                pos_off.append(len(flat_pos))
            doc_off.append(len(terms))
            doclens.append(dl)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(terms, pa.string()),
                pa.array(wdfs, pa.int32()),
                pa.ListArray.from_arrays(
                    pa.array(pos_off, pa.int32()),
                    pa.array(flat_pos, pa.int32()),
                ),
            ],
            names=["term", "wdf", "positions"],
        )
        return (
            pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()), struct),
            pa.array(doclens, pa.int64()),
        )

    def emit(batch, idx, plist, doclen):
        cols = [batch.column(c).take(idx) for c in keep_cols]
        return pa.RecordBatch.from_arrays(
            cols + [plist, doclen], names=keep_cols + ["plist", "doclen"]
        )

    def fn(batches):
        for batch in batches:
            texts = batch.column(content_col)
            if vectorizable:
                # gate class chars == Arrow's ASCII-whitespace set, so the
                # C splitter and the state machine agree on this class
                fast = pc.fill_null(
                    pc.and_(
                        pc.match_substring_regex(
                            texts, r"^[a-z0-9_ \t\n\v\f\r]*$"
                        ),
                        pc.invert(
                            pc.match_substring_regex(texts, r"[a-z0-9_]{65}")
                        ),
                    ),
                    False,
                ).to_numpy(zero_copy_only=False)
            else:
                fast = np.zeros(len(texts), dtype=bool)
            if fast.all():
                plist, doclen = invert_fast_block(texts)
                idx = pa.array(np.arange(len(texts), dtype=np.int64))
                yield emit(batch, idx, plist, doclen)
                continue
            fast_idx = pa.array(np.flatnonzero(fast))
            slow_idx = pa.array(np.flatnonzero(~fast))
            if len(fast_idx):
                plist, doclen = invert_fast_block(texts.take(fast_idx))
                yield emit(batch, fast_idx, plist, doclen)
            if len(slow_idx):
                plist, doclen = invert_slow_block(
                    texts.take(slow_idx).to_pylist()
                )
                yield emit(batch, slow_idx, plist, doclen)

    return df.mapInArrow(fn, out_schema)


@dataclass
class InvertedIndex:
    """Logical handle over the index tables.

    postings:   (term, docid, wdf, doclen, positions array<int>)
    doclens:    (docid, doclen, uniqterms)
    term_stats: (term, tf, cf, wdf_max)
    _stats:     GlobalStats, or None to compute lazily from doclens on
                first access (via the ``stats`` property) — build_index
                stays action-free so the first real job (usually the
                term-stats materialization) pays the inversion exactly
                once instead of across two job barriers
    docs:       original corpus with docid (the `docdata` analogue)
    blocked:    optional blocked postings table (see merge.py)
    """

    spark: SparkSession
    postings: DataFrame
    doclens: DataFrame
    term_stats: DataFrame
    _stats: GlobalStats | None
    docs: DataFrame
    tokenizer_mode: str = "xapian"
    blocked: DataFrame | None = None
    termlists: DataFrame | None = None
    # synonym table (term, synonym) — the glass synonym B-tree analogue
    # (backends/glass/glass_synonym.h); queried by the parser for ~term
    # and FLAG_AUTO_SYNONYMS expansion
    synonyms: DataFrame | None = None

    def __post_init__(self):
        # Driver-side memo of per-term stats: repeated-query workloads skip
        # the stats job for already-seen terms (the reference keeps these hot
        # in the version file / B-tree cache for the same reason).
        self._ts_cache: dict[str, TermStats] = {}

    @property
    def stats(self) -> GlobalStats:
        """Collection-wide stats (glass_version.h:127-273), computed lazily
        from doclens on first access.  Read paths that know the stats from
        stored metadata pass them in; build_index defers so its first
        materializing action runs the inversion once."""
        if self._stats is None:
            row = self.doclens.agg(
                F.count(F.lit(1)).alias("doccount"),
                F.coalesce(F.sum("doclen"), F.lit(0)).alias("total_doclen"),
                F.coalesce(F.min("doclen"), F.lit(0)).alias("doclen_lb"),
                F.coalesce(F.max("doclen"), F.lit(0)).alias("doclen_ub"),
            ).collect()[0]
            self._stats = GlobalStats(
                doccount=row["doccount"],
                total_doclen=row["total_doclen"],
                doclen_lower_bound=row["doclen_lb"],
                doclen_upper_bound=row["doclen_ub"],
            )
        return self._stats

    @stats.setter
    def stats(self, value: GlobalStats | None) -> None:
        self._stats = value

    def collect_term_stats(self, terms: list[str]) -> dict[str, TermStats]:
        """Driver-side stats for a (small) query-term set — the analogue of
        the reference's stats-gathering pass 1 (matcher.cc:314-337)."""
        missing = [t for t in terms if t not in self._ts_cache]
        if missing:
            rows = self.term_stats.where(F.col("term").isin(missing)).collect()
            for r in rows:
                self._ts_cache[r["term"]] = TermStats(
                    term=r["term"], tf=r["tf"], cf=r["cf"], wdf_max=r["wdf_max"]
                )
            for t in missing:
                # negative-cache absent terms (tf=0)
                self._ts_cache.setdefault(t, TermStats(t, 0, 0, 0))
        return {t: self._ts_cache[t] for t in terms if t in self._ts_cache}

    def get_synonyms(self, term: str) -> list[str]:
        """Synonyms of one term from the synonym table
        (Database::synonyms_begin, glass_synonym.h) — driver-side lookup
        for query expansion; memoized per index."""
        if self.synonyms is None:
            return []
        cache = getattr(self, "_synonym_cache", None)
        if cache is None:
            cache = {}
            self._synonym_cache = cache
        if term not in cache:
            rows = (
                self.synonyms.where(F.col("term") == term)
                .select("synonym")
                .collect()
            )
            cache[term] = sorted(r["synonym"] for r in rows)
        return cache[term]

    def synonym_keys(self, prefix: str = "") -> list[str]:
        """Terms that have synonyms (Database::synonym_keys_begin)."""
        if self.synonyms is None:
            return []
        df = self.synonyms.select("term").distinct()
        if prefix:
            df = df.where(F.col("term").startswith(prefix))
        return sorted(r["term"] for r in df.collect())

    def expand_edit_distance(
        self, pattern: str, max_edit: int = 2, prefix: str = ""
    ) -> list[str]:
        """OP_EDIT_DISTANCE expansion (queryinternal.cc:2005-2059):
        dictionary terms within TRANSPOSITION-AWARE edit distance, matching
        the reference's editdistance.cc (teh~1 finds "the").

        Two stages, both distributed: a cheap JVM prefilter (length delta
        <= k, levenshtein <= 2k — valid since lev <= 2*osa), then the exact
        restricted Damerau-Levenshtein DP in an Arrow-batched UDF over the
        few surviving candidates."""
        import pandas as pd

        from xapian_spark.text.editdistance import osa_distance

        df = self.term_stats
        col = F.col("term")
        if prefix:
            df = df.where(col.startswith(prefix))
            col = F.expr(f"substring(term, {len(prefix) + 1})")
        # cheap JVM prefilters before the Python DP distance
        df = df.where(
            F.abs(F.length(col) - F.lit(len(pattern))) <= max_edit
        ).where(F.levenshtein(col, F.lit(pattern)) <= 2 * max_edit)

        def _osa(terms: pd.Series) -> pd.Series:
            return pd.Series(
                [osa_distance(t, pattern) <= max_edit for t in terms]
            )

        osa_udf = F.pandas_udf(_osa, T.BooleanType())
        rows = df.where(osa_udf(col)).select("term").collect()
        return sorted(r["term"] for r in rows)

    def expand_wildcard(
        self, pattern_head: str, limit: int | None = None,
        most_frequent: bool = False, limit_mode: str = "error",
    ) -> list[str]:
        """OP_WILDCARD expansion against the term dictionary
        (queryinternal.cc:213-267).  Limit policies: ERROR raises,
        FIRST keeps the sort-order-first N (WILDCARD_LIMIT_FIRST),
        MOST_FREQUENT keeps the N highest-tf (WILDCARD_LIMIT_MOST_FREQUENT,
        orderBy(tf desc).limit(m) -- a tiny driver-side top-k over the
        dictionary)."""
        if most_frequent:
            limit_mode = "most_frequent"
        if limit_mode not in ("error", "first", "most_frequent"):
            raise ValueError(f"unknown wildcard limit_mode: {limit_mode!r}")
        df = self.term_stats.where(F.col("term").startswith(pattern_head))
        if limit and limit_mode == "most_frequent":
            df = df.orderBy(F.col("tf").desc(), F.col("term")).limit(limit)
        rows = df.select("term").collect()
        terms = sorted(r["term"] for r in rows)
        if limit and len(terms) > limit:
            if limit_mode == "error":
                raise ValueError(
                    f"wildcard expands to {len(terms)} terms > limit {limit}"
                )
            if limit_mode == "first":
                terms = terms[:limit]
        return terms

    def expand_wildcard_pattern(
        self, pattern: str, multi: bool = True, single: bool = True,
        limit: int | None = None, most_frequent: bool = False,
        limit_mode: str = "error",
    ) -> list[str]:
        """Glob-style OP_WILDCARD expansion (query.h:327-339,
        WILDCARD_PATTERN_MULTI '*' / WILDCARD_PATTERN_SINGLE '?', Xapian
        1.5): the wildcards may appear anywhere in the word.  The literal
        head before the first wildcard prunes the dictionary scan
        (startswith pushes to the stats table's sort/partition order);
        the full pattern is then a JVM-side rlike."""
        import re as _re

        if most_frequent:
            limit_mode = "most_frequent"
        wildchars = ("*" if multi else "") + ("?" if single else "")
        head_len = next(
            (j for j, ch in enumerate(pattern) if ch in wildchars),
            len(pattern),
        )
        parts = []
        for ch in pattern:
            if multi and ch == "*":
                parts.append(".*")
            elif single and ch == "?":
                parts.append(".")
            else:
                parts.append(_re.escape(ch))
        regex = "^" + "".join(parts) + "$"
        df = self.term_stats
        if head_len:
            df = df.where(F.col("term").startswith(pattern[:head_len]))
        else:
            # leading-wildcard pattern with no fixed head: keep the scan
            # off internal terms (Z-stems and capital field/boolean
            # prefixes) — the reference expands wildcards within the
            # user's prefix only, never across the Z/prefix namespaces
            df = df.where(~F.col("term").rlike("^[A-Z]"))
        df = df.where(F.col("term").rlike(regex))
        if limit and limit_mode == "most_frequent":
            df = df.orderBy(F.col("tf").desc(), F.col("term")).limit(limit)
        terms = sorted(r["term"] for r in df.select("term").collect())
        if limit and len(terms) > limit:
            if limit_mode == "error":
                raise ValueError(
                    f"wildcard expands to {len(terms)} terms > limit {limit}"
                )
            if limit_mode == "first":
                terms = terms[:limit]
        return terms


def assign_docids(
    docs: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Deterministic dense 1-based docid by natural-key order — in PARALLEL.

    Two-phase range-partitioned ranking (the reference assigns docids
    serially in add_document, `backends/glass/glass_database.cc`; a
    distributed build needs the same dense ordering without a serial pass):

      1. range-shuffle + local sort by the natural key
         (repartitionByRange -> sortWithinPartitions): partition p holds a
         contiguous key range, keys in p sorted — a true distributed sort,
         every partition works in parallel;
      2. one TINY driver collect of per-partition row counts -> prefix-sum
         offsets (num_partitions integers, not data);
      3. a narrow mapInArrow pass stamps docid = offset[pid] + local row
         number.

    Identical docids to a global row_number at any parallelism (order_cols
    must form a unique key for full determinism — ties within a duplicate
    key get arbitrary but range-local order, same as before).  No
    single-partition WindowExec anywhere: this is the path that survives a
    10^12-row corpus.
    """
    import pyarrow as pa

    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32") or "32"
        )
    cols = [F.col(c) for c in order_cols]
    sorted_df = (
        docs.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        # persist so the counts job and the stamping job see the SAME
        # materialized range partitioning (boundaries come from sampling)
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in sorted_df.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(counts, default=-1) + 1):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    out_schema = out_fields + ", docid bigint"
    keep = [f.name for f in docs.schema.fields]

    def stamp(batches):
        local = 0
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            pid = batch.column("_pid")[0].as_py()
            start = offsets[pid] + local + 1  # 1-based docids
            local += n
            docid = pa.array(range(start, start + n), pa.int64())
            cols_out = [batch.column(c) for c in keep] + [docid]
            yield pa.RecordBatch.from_arrays(cols_out, names=keep + ["docid"])

    # materialize the stamped output once (checkpoint), then free the
    # sorted intermediate EXPLICITLY — leaving it persisted leaked one
    # cached corpus copy per build for the session's lifetime; the
    # checkpointed result is released with the returned DataFrame
    stamped = sorted_df.mapInArrow(stamp, out_schema).localCheckpoint(
        eager=True
    )
    sorted_df.unpersist()
    return stamped


def _right_size(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Right-size a degenerate input layout before the Arrow pass.

    TOO MANY tiny partitions: each mapInArrow task pays a fixed
    JVM<->Python round-trip cost (worker handshake, Arrow stream
    setup/flush) that measured ~8 ms/task regardless of task size — an
    input split into 4 MB partitions spends more wall time on IPC setup
    than on tokenizing (a 1M-doc build's noop round-trip: 2.4 s at 256
    partitions vs 0.8 s at 64, same bytes).  At cluster scale healthy
    inputs already carry 128-256 MB per split
    (spark.sql.files.maxPartitionBytes), so this only rewrites degenerate
    layouts: if the optimizer's size estimate says partitions average well
    under ``target_bytes``, coalesce (no shuffle) down to the byte-derived
    count, floored at 2x defaultParallelism to keep every core busy with
    scheduling headroom.  Unknown/absurd size estimates leave the input
    untouched.

    TOO FEW partitions (fewer than cores): the tokenize pass — the bulk
    of build CPU — is capped at n tasks no matter how many cores exist
    (a 1-partition generated corpus tokenizes single-threaded on a
    32-core node; measured: an 8M-doc exploded corpus built no faster at
    32 cores than 8).  Catalyst's size estimate CANNOT gate this case:
    explode/Generate multiplicity is invisible to plan stats (that same
    8M-doc corpus reads 0.6 MB), so the only safe small-input exemption
    is an accurate-small estimate on a Generate-free plan.  The shuffle
    this inserts costs one pass over the raw content — noise next to the
    tokenize work it unblocks — and on healthy cluster layouts
    (splits >= cores) it never fires."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n < par:
        try:
            plan = df._jdf.queryExecution().optimizedPlan()
            size = int(plan.stats().sizeInBytes())
            trustworthy = "Generate" not in plan.toString()
        except Exception:
            size, trustworthy = -1, False
        if trustworthy and 0 <= size < target_bytes // 8:
            return df  # provably tiny: parallelism is irrelevant
        return df.repartition(2 * par)
    if n <= 2 * par:
        return df
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    # 1 PB cap guards the "unknown" sentinel (Long.MaxValue-ish estimates)
    if size <= 0 or size > (1 << 50) or size >= n * target_bytes:
        return df
    want = max(2 * par, -(-size // target_bytes))
    return df.coalesce(want) if want < n else df


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    content_col: str = "content",
    docid_col: str | None = None,
    order_cols: list[str] | None = None,
    prefix_fields: dict[str, str] | None = None,
    mode: str = "xapian",
    stopwords: frozenset[str] | None = None,
    stemmer=None,
    stem_strategy: str = "some",
    stop_mode: str = "all",
    word_breaks: bool = False,
) -> InvertedIndex:
    """Build the logical index tables from a corpus DataFrame.

    prefix_fields: {column -> term prefix} indexed as boolean terms (wdf=0,
    no positions), the omega `add_boolean_prefix` convention
    (api_queryparser.cc:63-79).

    stemmer/stem_strategy/stop_mode: TermGenerator stemming strategies
    (termgenerator_internal.cc:318-362); see tokenizer.invert_doc.  With a
    stemmer and the default "some" strategy, positionless Z-prefixed stems
    are indexed alongside the unstemmed positional terms.
    """
    if docid_col is None:
        docs = assign_docids(docs, order_cols or docs.columns[:1])
        docid_col = "docid"
    docs = docs.withColumn("docid", F.col(docid_col).cast("long"))

    # Map-side inversion: one Arrow UDF pass produces the complete per-doc
    # termlist (term, wdf, positions) AND doclen — zero shuffles.  This is
    # the distributed twin of `Inverter` buffering per-document deltas
    # (glass_inverter.h:43-170); the shuffle happens only where the
    # reference also pays I/O: term-major layout + per-term stats.
    pf_cols = list(prefix_fields.keys()) if prefix_fields else []
    termlists = invert_arrow(
        _right_size(docs.select("docid", *pf_cols, content_col)),
        content_col,
        keep_cols=["docid", *pf_cols],
        mode=mode,
        stopwords=stopwords,
        stemmer=stemmer,
        stem_strategy=stem_strategy,
        stop_mode=stop_mode,
        word_breaks=word_breaks,
    )

    if prefix_fields:
        # Boolean field terms (wdf=0, positionless) appended to the termlist
        # map-side — the omega add_boolean_prefix convention
        # (api_queryparser.cc:63-79); they don't contribute to doclen.
        bool_entries = F.array_distinct(F.filter(
            F.array(
                *[
                    F.struct(
                        F.concat(
                            F.lit(prefix), F.lower(F.col(col))
                        ).alias("term"),
                        F.lit(0).cast("int").alias("wdf"),
                        F.lit(None).cast("array<int>").alias("positions"),
                    )
                    for col, prefix in prefix_fields.items()
                ]
            ),
            # a NULL field value must not become a NULL term (it would
            # fall out of every term range downstream), and two fields
            # mapping to one identical term must not emit a duplicate
            # (term, docid) posting (delta coding requires strictly
            # increasing docids per term)
            lambda e: e["term"].isNotNull(),
        ))
        termlists = termlists.withColumn(
            "plist", F.concat("plist", bool_entries)
        )
    # uniqterms counts the FULL termlist, boolean field terms included,
    # matching the reference's get_unique_terms() (the termlist B-tree row
    # count per doc; used by DiceCoeffWeight).
    termlists = termlists.withColumn(
        "uniqterms", F.coalesce(F.size("plist"), F.lit(0)).cast("long")
    ).select("docid", "plist", "doclen", "uniqterms")

    # One in-memory materialization of the termlists feeds every derived
    # table (postings, doclens, stats) without re-running the tokenizer.
    termlists = termlists.persist()

    postings = termlists.select(
        "docid", "doclen", F.explode("plist").alias("e")
    ).select(
        F.col("e.term").alias("term"),
        "docid",
        F.col("e.wdf").alias("wdf"),
        "doclen",
        F.col("e.positions").alias("positions"),
    )

    doclens = termlists.select("docid", "doclen", "uniqterms")

    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sum("wdf").cast("long").alias("cf"),
        F.max("wdf").cast("int").alias("wdf_max"),
    )

    # Global stats are NOT collected here: build_index runs zero jobs, so
    # the caller's first materializing action (typically the term-stats
    # cache fill) pays the inversion in ONE job instead of two barriers —
    # part of the measured Amdahl fixed-cost shave (BASELINE.md).  The
    # stats property computes them from the (by then warm) doclens cache.
    return InvertedIndex(
        spark=spark,
        postings=postings,
        doclens=doclens,
        term_stats=term_stats,
        _stats=None,
        docs=docs,
        tokenizer_mode=mode,
        termlists=termlists,
    )


def persist_index(index: InvertedIndex, cache: bool = True) -> InvertedIndex:
    """Cache the hot tables (repeated-query workloads / tests)."""
    if cache:
        index.postings = index.postings.persist()
        index.doclens = index.doclens.persist()
        index.term_stats = index.term_stats.persist()
    return index


def write_index(index: InvertedIndex, path: str, term_buckets: int = 16) -> None:
    """Write the warehouse: postings range-partitioned+sorted by (term,docid)
    — explicit term-hash-range layout so a 1000-executor query prunes to the
    partitions holding its terms; stats as JSON manifest."""
    os.makedirs(path, exist_ok=True)
    (
        index.postings.repartitionByRange(term_buckets, "term", "docid")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "postings"))
    )
    index.doclens.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
    index.term_stats.write.mode("overwrite").parquet(
        os.path.join(path, "term_stats")
    )
    index.docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))
    manifest = {
        "doccount": index.stats.doccount,
        "total_doclen": index.stats.total_doclen,
        "doclen_lower_bound": index.stats.doclen_lower_bound,
        "doclen_upper_bound": index.stats.doclen_upper_bound,
        "tokenizer_mode": index.tokenizer_mode,
    }
    with open(os.path.join(path, "stats.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def read_index(spark: SparkSession, path: str) -> InvertedIndex:
    with open(os.path.join(path, "stats.json")) as f:
        m = json.load(f)
    return InvertedIndex(
        spark=spark,
        postings=spark.read.parquet(os.path.join(path, "postings")),
        doclens=spark.read.parquet(os.path.join(path, "doclens")),
        term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
        docs=spark.read.parquet(os.path.join(path, "docs")),
        _stats=GlobalStats(
            doccount=m["doccount"],
            total_doclen=m["total_doclen"],
            doclen_lower_bound=m["doclen_lower_bound"],
            doclen_upper_bound=m["doclen_upper_bound"],
        ),
        tokenizer_mode=m.get("tokenizer_mode", "xapian"),
    )
