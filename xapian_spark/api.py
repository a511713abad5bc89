"""User-facing facade mirroring the reference's Python-bindings surface.

A user of the reference works with `xapian.WritableDatabase`,
`xapian.TermGenerator`, `xapian.QueryParser`, `xapian.Enquire`,
`xapian.MSet` (xapian-core/include/xapian/*.h; docs/getting-started-
guide style flow).  This module provides the same nouns and verbs on
Spark so existing call sites translate 1:1:

    db = WritableDatabase(spark, "/data/idx")        # open/create
    db.add_documents(df, content_col="text")         # index a DataFrame
    db.commit()                                      # build/refresh

    enq = Enquire(db)
    enq.set_query(QueryParser().parse_query("error AND handling"))
    for hit in enq.get_mset(0, 10):
        print(hit.docid, hit.weight, hit.percent, hit.rank)

Differences by design (Spark-first): documents arrive as DataFrames, not
one at a time; commit() is a (checkpointed, resumable) batch job; reads
see the last commit (snapshot semantics, like a glass revision).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xapian_spark.index import merge
from xapian_spark.index.builder import InvertedIndex, build_index, persist_index
from xapian_spark.query import ast
from xapian_spark.query.expand import (
    bo1_eset,
    suggest_spelling,
    trad_eset,
    with_percent,
)
from xapian_spark.query.parser import QueryParser  # re-export  # noqa: F401
from xapian_spark.text.termgen import (  # re-export  # noqa: F401
    Document,
    TermGenerator,
)
from xapian_spark.query.planner import Planner
from xapian_spark.ranking.weights import WEIGHT_SCHEMES, Weight


@dataclass
class MSetItem:
    rank: int  # 0-based like the reference's MSetIterator.get_rank()
    docid: int
    weight: float
    percent: int
    # collapse bookkeeping (MSetIterator::get_collapse_key/_count,
    # mset.h:260-290): the collapse key value this hit represents and how
    # many lower-ranked same-key docs were eliminated onto it (attached to
    # the group's best hit, 0 elsewhere — exact, not the reference's
    # matcher-progress estimate)
    collapse_key: object = None
    collapse_count: int = 0
    # the value-sort key tuple (MSetIterator::get_sort_key) when the mset
    # was sorted by value slots
    sort_key: tuple | None = None

    # reference-named accessors (MSetIterator surface)
    def get_docid(self) -> int:
        return self.docid

    def get_weight(self) -> float:
        return self.weight

    def get_percent(self) -> int:
        return self.percent

    def get_rank(self) -> int:
        return self.rank

    def get_collapse_key(self):
        return self.collapse_key

    def get_collapse_count(self) -> int:
        return self.collapse_count

    def get_sort_key(self):
        return self.sort_key


class ESet(list):
    """list[(term, weight)] + ESet::get_ebound (eset.h:80-95): how many
    expansion terms COULD have been returned had maxitems been larger —
    evaluated lazily (one count job over the unlimited candidate set)."""

    _ebound_fn = None
    _ebound: int | None = None

    def get_ebound(self) -> int:
        if self._ebound is None:
            self._ebound = (
                int(self._ebound_fn()) if self._ebound_fn else len(self)
            )
        return self._ebound


def _query_terms_in_order(node: ast.Node):
    """Terms of a query AST in ascending query position (left-to-right
    traversal — the order the parser assigns positions in)."""
    if isinstance(node, ast.Term):
        yield node.term
    elif hasattr(node, "subs"):
        for s in node.subs:
            yield from _query_terms_in_order(s)
    elif hasattr(node, "left"):
        yield from _query_terms_in_order(node.left)
        yield from _query_terms_in_order(node.right)
    elif hasattr(node, "sub"):
        yield from _query_terms_in_order(node.sub)


class MSet(list):
    """list[MSetItem] + the reference's convenience accessors.

    The reference ESTIMATES the total match count from how far the matcher
    got before terminating (matcher.cc:434-475); a Spark match is a full
    set-at-a-time evaluation, so the count is EXACT and lower bound ==
    estimate == upper bound (the reference also collapses the three when
    it has seen every match).  The count job runs LAZILY on first access,
    so callers that never read the match counts pay nothing extra."""

    _count_fn = None
    _matches: int | None = None

    def get_matches_estimated(self) -> int:
        if self._matches is None:
            self._matches = (
                int(self._count_fn()) if self._count_fn else len(self)
            )
        return self._matches

    def get_matches_lower_bound(self) -> int:
        return self.get_matches_estimated()

    def get_matches_upper_bound(self) -> int:
        return self.get_matches_estimated()

    _enquire = None  # set by Enquire.get_mset (reference: MSet::Internal)
    _max_attained: float | None = None  # best weight over the whole match
    _max_possible: float | None = None  # the WAND-style weight upper bound
    _uncollapsed_fn = None  # lazy pre-collapse match count
    _uncollapsed: int | None = None
    _firstitem: int = 0

    def get_max_attained(self) -> float:
        """MSet::get_max_attained: the best weight over the WHOLE match
        (exact — the reference's value can be a lower bound when the
        matcher terminated early)."""
        return float(self._max_attained or 0.0)

    def get_max_possible(self) -> float:
        """MSet::get_max_possible: the a-priori upper bound on any
        document's weight — sum of per-term maxparts plus maxextra, the
        same bound the block-max WAND pruning uses."""
        return float(self._max_possible or 0.0)

    def get_firstitem(self) -> int:
        """MSet::get_firstitem: the `first` passed to get_mset."""
        return self._firstitem

    def get_uncollapsed_matches_estimated(self) -> int:
        """MSet::get_uncollapsed_matches_estimated: match count before
        collapsing (exact here, so lower == estimate == upper)."""
        if self._uncollapsed is None:
            self._uncollapsed = (
                int(self._uncollapsed_fn())
                if self._uncollapsed_fn
                else self.get_matches_estimated()
            )
        return self._uncollapsed

    def get_uncollapsed_matches_lower_bound(self) -> int:
        return self.get_uncollapsed_matches_estimated()

    def get_uncollapsed_matches_upper_bound(self) -> int:
        return self.get_uncollapsed_matches_estimated()

    def get_termweight(self, term: str) -> float:
        """MSet::get_termweight (mset.h): the term's maximum possible
        contribution to any document's weight in this match — the same
        maxpart the snippet highlighter and block-max pruning use."""
        enq = self._enquire
        if enq is None:
            return 0.0
        scheme = getattr(enq, "_weight", None) or WEIGHT_SCHEMES["bm25"]()
        if not hasattr(scheme, "init_term"):
            return 0.0
        ts = enq.db.index.collect_term_stats([term]).get(term)
        if ts is None or ts.tf == 0:
            return 0.0
        stats = enq.db.index.stats
        tw = scheme.init_term(stats, ts, wqf=1)
        return tw.maxpart(ts.wdf_max, stats.doclen_lower_bound)

    def fetch(self, first=None, last=None) -> None:
        """MSet::fetch (mset.h:330-360): a prefetch hint for lazy remote
        backends.  Every collected MSet here is already materialized on
        the driver — no-op, like the reference's inmemory/glass case."""

    def get_termfreq(self, term: str) -> int:
        """MSet::get_termfreq (api/mset.cc:84-103): termfreq of a term,
        answered from the searched database (the reference first consults
        the match's cached stats, then falls back to the db — same
        numbers)."""
        if self._enquire is None:
            return 0
        return self._enquire.db.get_termfreq(term)

    def convert_to_percent(self, weight) -> int:
        """MSet::convert_to_percent (api/mset.cc:253-283): map a weight (or
        an MSetItem) to this mset's percent scale — 100 for an unweighted
        search, 0 for non-positive weights, else round(100 * w / best)
        clamped to [1, 100].  Rounding is HALF_UP, matching the percent
        column this engine computes everywhere else (the reference
        truncates after a DBL_EPSILON nudge — same value except on exact
        representability edges)."""
        if isinstance(weight, MSetItem):
            weight = weight.weight
        mx = self._max_attained
        if mx is None:
            mx = max((it.weight for it in self), default=0.0)
        if mx <= 0:
            return 100  # unweighted search: every match is 100%
        if weight <= 0:
            return 0
        return min(100, max(1, int(math.floor(100.0 * weight / mx + 0.5))))

    def snippet(
        self,
        text: str,
        length: int = 500,
        stemmer=None,
        flags: int | None = None,
        hi_start: str = "<b>",
        hi_end: str = "</b>",
        omit: str = "...",
    ) -> str:
        """MSet::snippet (mset.h; termgenerator_internal.cc:380-720):
        best window of `text` within a `length` UTF-8-byte budget with
        query terms highlighted.  Query-term relevance = the weighting
        scheme's maxpart (the same per-term upper bound block-max pruning
        uses — the analogue of the matcher termweights the reference
        feeds its SnipPipe); stemmed query terms (Z prefix) match via
        `stemmer`."""
        from xapian_spark.query.snippet import (
            SNIPPET_BACKGROUND_MODEL,
            snippet as _snippet,
            words_with_spans,
        )

        if flags is None:
            flags = SNIPPET_BACKGROUND_MODEL
        term_weights: dict[str, float] = {}
        stems: dict[str, float] = {}
        bg: dict[str, int] = {}
        doccount = 0
        enq = self._enquire
        if enq is not None and enq._query is not None:
            qterms = list(dict.fromkeys(_query_terms_in_order(enq._query)))
            idx = enq.db.index
            tstats = idx.collect_term_stats(qterms)
            weight = enq._weight or WEIGHT_SCHEMES["bm25"]()
            if hasattr(weight, "set_query_length"):
                weight.set_query_length(len(qterms))
            for t in qterms:
                ts = tstats.get(t)
                w = 0.0
                if ts is not None and ts.tf > 0:
                    tw = weight.init_term(idx.stats, ts, wqf=1)
                    w = tw.maxpart(
                        ts.wdf_max, idx.stats.doclen_lower_bound
                    )
                if t.startswith("Z") and len(t) > 1:
                    stems[t[1:]] = w
                else:
                    term_weights[t] = w
            if flags & SNIPPET_BACKGROUND_MODEL:
                doccount = idx.stats.doccount
                words = sorted({t for _, _, t in words_with_spans(text)})
                bg = {
                    t: ts.tf
                    for t, ts in idx.collect_term_stats(words).items()
                    if ts.tf > 0
                }
        return _snippet(
            text,
            term_weights,
            stems=stems,
            stemmer=stemmer,
            length=length,
            flags=flags,
            hi_start=hi_start,
            hi_end=hi_end,
            omit=omit,
            background_freq=bg,
            doccount=doccount,
        )


class Database:
    """Read-only handle over a warehouse directory (xapian::Database)."""

    def __init__(self, spark: SparkSession, path: str | None = None,
                 index: InvertedIndex | None = None):
        if index is None:
            if path is None:
                raise ValueError("need path or index")
            index = merge.read_warehouse(spark, path)
        self.spark = spark
        self.path = path
        self.index = index

    # -- reference Database surface ----------------------------------------

    def add_database(self, other: "Database") -> None:
        """Database::add_database (database.h): search several databases
        as one.  The reference interleaves docids — combined docid =
        (shard_docid - 1) * n_shards + shard_index + 1, unsharded on the
        way back out (backends/multi.h) — and combined ids change when
        another shard is added; this engine applies the SAME reversible
        remap as a JVM column expression per shard and unions the tables.
        At cluster scale each shard keeps its own parquet files, so the
        union is a multi-scan plan, not a data move; collection statistics
        are combined exactly (tf/cf sums, bound min/max).  The blocked
        WAND table is dropped from the combined view (its packed payloads
        can't be remapped row-wise) — serving falls back to row postings,
        and a compact of the combined termlists rebuilds blocks."""
        shards = list(getattr(self, "_shards", None) or [self.index])
        shards.append(other.index)
        self._shards = shards
        n = len(shards)

        def remap(df: DataFrame, i: int) -> DataFrame:
            return df.withColumn(
                "docid", ((F.col("docid") - 1) * n + i + 1).cast("long")
            )

        postings = doclens = docs = ts = syn = None
        for i, idx in enumerate(shards):
            p, d, dd = (
                remap(idx.postings, i), remap(idx.doclens, i),
                remap(idx.docs, i),
            )
            postings = p if postings is None else postings.unionByName(p)
            doclens = (
                d if doclens is None
                else doclens.unionByName(d, allowMissingColumns=True)
            )
            docs = (
                dd if docs is None
                else docs.unionByName(dd, allowMissingColumns=True)
            )
            ts = (
                idx.term_stats if ts is None
                else ts.unionByName(idx.term_stats)
            )
            if idx.synonyms is not None:
                syn = (
                    idx.synonyms if syn is None
                    else syn.unionByName(idx.synonyms).distinct()
                )
        term_stats = ts.groupBy("term").agg(
            F.sum("tf").alias("tf"),
            F.sum("cf").alias("cf"),
            F.max("wdf_max").alias("wdf_max"),
        )
        from xapian_spark.ranking.weights import GlobalStats

        sts = [s.stats for s in shards]
        self.index = InvertedIndex(
            spark=self.spark,
            postings=postings,
            doclens=doclens,
            term_stats=term_stats,
            _stats=GlobalStats(
                doccount=sum(s.doccount for s in sts),
                total_doclen=sum(s.total_doclen for s in sts),
                doclen_lower_bound=min(s.doclen_lower_bound for s in sts),
                doclen_upper_bound=max(s.doclen_upper_bound for s in sts),
            ),
            docs=docs,
            tokenizer_mode=shards[0].tokenizer_mode,
            blocked=None,
            synonyms=syn,
        )
        self.path = None  # a combined view has no single warehouse
        self._invalidate_memos()

    def size(self) -> int:
        """Database::size: number of shards this database aggregates."""
        return len(getattr(self, "_shards", None) or [self.index])

    def get_doccount(self) -> int:
        return self.index.stats.doccount

    def get_avlength(self) -> float:
        return self.index.stats.average_length

    def get_termfreq(self, term: str) -> int:
        ts = self.index.collect_term_stats([term]).get(term)
        return ts.tf if ts else 0

    def get_collection_freq(self, term: str) -> int:
        ts = self.index.collect_term_stats([term]).get(term)
        return ts.cf if ts else 0

    def term_exists(self, term: str) -> bool:
        return self.get_termfreq(term) > 0

    # -- per-document accessors (Database::get_document / get_doclength /
    #    get_unique_terms / termlist_begin / positionlist_begin) ----------

    def get_lastdocid(self) -> int:
        """Highest used docid (Database::get_lastdocid) — memoized agg."""
        if not hasattr(self, "_lastdocid"):
            row = self.index.doclens.agg(F.max("docid")).first()
            self._lastdocid = int(row[0] or 0)
        return self._lastdocid

    def get_doclength(self, docid: int) -> int:
        row = (
            self.index.doclens.where(F.col("docid") == docid)
            .select("doclen").first()
        )
        if row is None:
            raise KeyError(f"docid {docid} not found")  # DocNotFoundError
        return row["doclen"]

    def get_unique_terms(self, docid: int) -> int:
        row = (
            self.index.doclens.where(F.col("docid") == docid)
            .select("uniqterms").first()
        )
        if row is None:
            raise KeyError(f"docid {docid} not found")
        return row["uniqterms"]

    def get_doclength_lower_bound(self) -> int:
        return self.index.stats.doclen_lower_bound

    def get_doclength_upper_bound(self) -> int:
        return self.index.stats.doclen_upper_bound

    def get_wdf_upper_bound(self, term: str) -> int:
        """Max wdf of term across the corpus (used by block-max bounds)."""
        ts = self.index.collect_term_stats([term]).get(term)
        return ts.wdf_max if ts else 0

    def get_document(self, docid: int) -> dict:
        """Stored document row (the docdata analogue): every corpus column
        for this docid.  Raises KeyError for absent ids (DocNotFoundError)."""
        row = self.index.docs.where(F.col("docid") == docid).first()
        if row is None:
            raise KeyError(f"docid {docid} not found")
        return row.asDict()

    def termlist(self, docid: int) -> list[tuple[str, int, list[int]]]:
        """(term, wdf, positions) of one document, term-ordered
        (Database::termlist_begin).  One narrow filter on the postings
        table — at warehouse scale the term-major layout makes this a
        scan, which is why the reference keeps a separate termlist B-tree;
        the builder's resident `termlists` table serves the same role when
        present."""
        src = self.index.termlists
        if src is not None:
            row = src.where(F.col("docid") == docid).select("plist").first()
            if row is None:
                raise KeyError(f"docid {docid} not found")
            return sorted(
                (e["term"], e["wdf"], list(e["positions"] or []))
                for e in row["plist"]
            )
        rows = (
            self.index.postings.where(F.col("docid") == docid)
            .select("term", "wdf", "positions")
            .collect()
        )
        if not rows:
            raise KeyError(f"docid {docid} not found")
        return sorted(
            (r["term"], r["wdf"], list(r["positions"] or [])) for r in rows
        )

    def positionlist(self, docid: int, term: str) -> list[int]:
        """Ascending positions of term in doc (positionlist_begin)."""
        row = (
            self.index.postings.where(
                (F.col("docid") == docid) & (F.col("term") == term)
            )
            .select("positions").first()
        )
        return list(row["positions"] or []) if row is not None else []

    def has_positions(self) -> bool:
        """True if any posting carries positional data — memoized probe."""
        if not hasattr(self, "_has_positions"):
            row = (
                self.index.postings
                .where(F.size(F.col("positions")) > 0).limit(1).collect()
            )
            self._has_positions = bool(row)
        return self._has_positions

    def _spellings_df(self) -> DataFrame | None:
        """Explicit spelling entries (WritableDatabase::add_spelling) —
        (term, tf) parquet, or None."""
        if not self.path:
            return None
        sp = os.path.join(self.path, "spellings")
        if not os.path.exists(sp):
            return None
        return self.spark.read.parquet(sp)

    def postlist(self, term: str,
                 limit: int | None = 100_000) -> list[tuple[int, int]]:
        """(docid, wdf) postings of one term, docid-ordered
        (Database::postlist_begin/_end).  SCALE CONTRACT like allterms():
        a stopword-class term's posting list can be billions of rows, so
        this driver-side listing is capped; distributed consumers should
        filter `index.postings` instead (term-major parquet layout makes
        that a pruned range scan, not a full pass)."""
        df = (
            self.index.postings.where(F.col("term") == term)
            .select("docid", "wdf").orderBy("docid")
        )
        if limit is not None:
            df = df.limit(limit)
        return [(r["docid"], r["wdf"]) for r in df.collect()]

    def get_wdfdocmax(self, docid: int) -> int:
        """Database::get_wdfdocmax (database.h): highest wdf of any term
        in the document."""
        return max((w for _, w, _ in self.termlist(docid)), default=0)

    def _uniq_bounds(self) -> tuple[int, int]:
        if not hasattr(self, "_uniq_bounds_memo"):
            g = self.index.doclens.agg(
                F.coalesce(F.min("uniqterms"), F.lit(0)).alias("lb"),
                F.coalesce(F.max("uniqterms"), F.lit(0)).alias("ub"),
            ).collect()[0]
            self._uniq_bounds_memo = (int(g["lb"]), int(g["ub"]))
        return self._uniq_bounds_memo

    def get_unique_terms_lower_bound(self) -> int:
        """Database::get_unique_terms_lower_bound — exact min here (the
        reference returns a cheaper stored bound); memoized, one agg job."""
        return self._uniq_bounds()[0]

    def get_unique_terms_upper_bound(self) -> int:
        return self._uniq_bounds()[1]

    def reconstruct_text(self, docid: int, length: int = 0,
                         prefix: str = "", start_pos: int = 0,
                         end_pos: int = 0) -> str:
        """Database::reconstruct_text (database.h:575-607): rebuild an
        approximation of the document text by laying the (folded,
        possibly stemmed) terms back out in position order.  Zero-wdf
        boolean terms, Z-stem terms and other-prefix terms are skipped,
        like the reference's prefix filtering."""
        by_pos: dict[int, str] = {}
        plen = len(prefix)
        for term, _wdf, positions in self.termlist(docid):
            if prefix:
                if not term.startswith(prefix):
                    continue
                word = term[plen:]
            else:
                if term[:1].isupper():  # Z-stems / prefixed boolean terms
                    continue
                word = term
            for p in positions or []:
                if start_pos and p < start_pos:
                    continue
                if end_pos and p > end_pos:
                    continue
                by_pos.setdefault(p, word)
        text = " ".join(by_pos[p] for p in sorted(by_pos))
        if length and len(text) > length:
            # cut at a word boundary within the byte budget (database.cc)
            cut = text.rfind(" ", 0, length + 1)
            text = text[:cut] if cut > 0 else text[:length]
        return text

    def valuestream(self, column: str,
                    limit: int | None = 100_000) -> list[tuple[int, object]]:
        """Database::valuestream_begin/_end: (docid, value) for every
        document with a value in the slot, docid-ordered.  Driver-side
        capped like allterms(); distributed consumers read the docs table
        column directly."""
        df = (
            self.index.docs.select("docid", column)
            .where(F.col(column).isNotNull())
            .orderBy("docid")
        )
        if limit is not None:
            df = df.limit(limit)
        return [(r["docid"], r[column]) for r in df.collect()]

    def get_spelling_suggestion(self, word: str, max_edit: int = 2):
        return suggest_spelling(
            self.index, word, max_edit=max_edit,
            extra_terms=self._spellings_df(),
        )

    def spellings(self, limit: int = 100_000) -> list[tuple[str, int]]:
        """Database::spellings_begin/_end: the explicit spelling entries
        (word, freq), word-ordered.  Index terms are implicitly
        correctable in this engine (documented divergence) and are not
        repeated here."""
        df = self._spellings_df()
        if df is None:
            return []
        return [
            (r["term"], r["tf"])
            for r in df.orderBy("term").limit(limit).collect()
        ]

    def allterms(self, prefix: str = "", limit: int | None = 100_000):
        """Iterator over dictionary terms (Database::allterms_begin).

        SCALE CONTRACT: the reference walks a B-tree cursor; a distributed
        dictionary can be billions of terms, so this driver-side iterator
        is guarded by `limit` (default 100k).  Pass limit=None to stream
        the full dictionary via toLocalIterator (one partition at a time
        on the driver — bounded memory, still a full scan)."""
        df = self.index.term_stats
        if prefix:
            df = df.where(F.col("term").startswith(prefix))
        df = df.select("term").orderBy("term")
        if limit is not None:
            rows = df.limit(limit + 1).collect()
            if len(rows) > limit:
                raise ValueError(
                    f"allterms: dictionary exceeds limit={limit}; raise the "
                    "limit or pass limit=None to stream via toLocalIterator"
                )
            return [r["term"] for r in rows]
        return (r["term"] for r in df.toLocalIterator())

    # -- synonym table (glass_synonym.h; Database::synonyms_begin) ---------

    def get_synonyms(self, term: str) -> list[str]:
        return self.index.get_synonyms(term)

    def synonym_keys(self, prefix: str = "") -> list[str]:
        return self.index.synonym_keys(prefix)

    # -- value-slot statistics (Database::get_value_freq /
    #    get_value_lower_bound / get_value_upper_bound; per-slot stats the
    #    glass backend keeps in its value-stats chunks, valuestats.h:30-41.
    #    A "slot" here is a typed column on the docs table per the data
    #    model mapping in SURVEY §1.1) --------------------------------------

    def _value_stats(self, column: str):
        cache = getattr(self, "_vstats_cache", None)
        if cache is None:
            cache = {}
            self._vstats_cache = cache
        if column not in cache:
            if column not in self.index.docs.columns:
                cache[column] = (0, None, None)
            else:
                row = self.index.docs.agg(
                    F.count(F.col(column)).alias("freq"),
                    F.min(F.col(column)).alias("lo"),
                    F.max(F.col(column)).alias("hi"),
                ).first()
                cache[column] = (row["freq"], row["lo"], row["hi"])
        return cache[column]

    def get_value_freq(self, column: str) -> int:
        """Documents with a non-null value in the slot (valuestats.h:30)."""
        return self._value_stats(column)[0]

    def get_value_lower_bound(self, column: str):
        return self._value_stats(column)[1]

    def get_value_upper_bound(self, column: str):
        return self._value_stats(column)[2]

    # -- user metadata (Database::get_metadata, database.h:510-533;
    #    stored per-warehouse like glass's \x00\xc0-prefixed postlist keys,
    #    glass_database.cc:1714-1724) ------------------------------------

    def _metadata_df(self) -> DataFrame | None:
        if self.path is None:
            return None  # backend without metadata support: get returns ""
        mpath = os.path.join(self.path, "metadata")
        if not os.path.exists(mpath):
            return None
        return self.spark.read.parquet(mpath)

    def get_metadata(self, key: str) -> str:
        """User metadata value for key; '' when absent (reference contract:
        empty string even for backends without metadata support)."""
        if not key:
            raise ValueError("empty metadata key is invalid")
        df = self._metadata_df()
        if df is None:
            return ""
        row = df.where(F.col("key") == key).select("value").first()
        return row["value"] if row is not None else ""

    def metadata_keys(self, prefix: str = "") -> list[str]:
        """All user metadata keys (metadata_keys_begin), optional prefix."""
        df = self._metadata_df()
        if df is None:
            return []
        if prefix:
            df = df.where(F.col("key").startswith(prefix))
        return [r["key"] for r in df.select("key").orderBy("key").collect()]

    def get_uuid(self) -> str:
        """Database::get_uuid (database.h): the uuid minted when the
        warehouse's stats were committed; "" for an in-memory index (the
        reference's inmemory backend also returns an empty uuid)."""
        if not self.path or not merge._done(self.path, "stats"):
            return ""
        return merge._read_meta(self.path, "stats").get("uuid", "")

    def check(self, docs: DataFrame | None = None,
              content_col: str = "content",
              docid_col: str = "docid") -> dict:
        """Database::check / xapian-check (database.h:1570-1640,
        bin/xapian-check.cc): verify the structural invariants of the
        committed warehouse — term_stats vs recomputed postings, doclens
        vs sum(wdf), blocked vs row postings, and (when the source table
        is supplied) the content sha256 row invariant.  Returns the
        per-invariant mismatch counts; all zeros == clean."""
        if not self.path:
            raise ValueError("check() needs an on-disk warehouse")
        return merge.verify_invariants(
            self.spark, self.path, docs,
            content_col=content_col, docid_col=docid_col,
        )

    def _invalidate_memos(self) -> None:
        """Drop driver-side memoized aggregates after the index view
        changes (reopen / mutating commit / compact) — a stale bound is
        not a bound."""
        for attr in ("_lastdocid", "_has_positions", "_uniq_bounds_memo",
                     "_vstats_cache"):
            if hasattr(self, attr):
                delattr(self, attr)

    def get_revision(self) -> int:
        """Database::get_revision (database.h): the committed revision
        number — 1 after the initial build, +1 per mutating commit() and
        per compact() (glass_version.h revision counter); 0 for an
        in-memory index."""
        if not self.path or not merge._done(self.path, "stats"):
            return 0
        return int(merge._read_meta(self.path, "stats").get("revision", 1))

    def get_average_length(self) -> float:
        """Database::get_average_length (the get_avlength alias in current
        reference releases)."""
        return self.get_avlength()

    def get_total_length(self) -> int:
        """Database::get_total_length: sum of document lengths."""
        return int(self.index.stats.total_doclen)

    def keep_alive(self) -> None:
        """Database::keep_alive (database.h): a remote-backend heartbeat.
        Spark sessions are kept alive by the driver; no-op."""

    def lock(self) -> None:
        """Database::lock (database.h): the reference locks the on-disk
        database against concurrent writers.  A warehouse revision is an
        immutable snapshot (writers produce a NEW revision and flip
        metadata atomically), so readers never need a lock — no-op,
        documented divergence that is strictly safer."""

    def unlock(self) -> None:
        """See lock() — no-op over immutable snapshots."""

    def locked(self) -> bool:
        """Database::locked: never, see lock()."""
        return False

    def close(self) -> None:
        """Database::close (database.h): release cached resources.  Spark
        DataFrames hold no file handles; this unpersists any cached index
        tables (reopening is just re-reading the warehouse)."""
        for df in (self.index.postings, self.index.doclens,
                   self.index.term_stats, self.index.blocked,
                   self.index.termlists):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass

    def reopen(self) -> None:
        """Database::reopen (database.h): refresh to the latest committed
        revision of the warehouse."""
        if self.path:
            self.index = merge.read_warehouse(self.spark, self.path)
            self._invalidate_memos()


class WritableDatabase(Database):
    """Batch-oriented WritableDatabase: buffer DataFrames, commit() builds
    the warehouse (one checkpointed job == one glass revision)."""

    def __init__(self, spark: SparkSession, path: str,
                 mode: str = "xapian",
                 prefix_fields: dict[str, str] | None = None,
                 n_ranges: int = 8):
        self.spark = spark
        self.path = path
        self.mode = mode
        self.prefix_fields = prefix_fields
        self.n_ranges = n_ranges
        self._pending: list[tuple[DataFrame, str, str]] = []
        # ordered synonym ops: ("add"|"remove"|"clear", term, synonym) —
        # replayed in call order at commit
        self._pending_syn_ops: list[tuple[str, str, str | None]] = []
        self._pending_metadata: dict[str, str] = {}
        # mutation buffers carry a per-op sequence number so interleaved
        # delete/replace of the SAME docid resolves last-op-wins at
        # commit, like the reference applying ops in call order
        self._mut_seq = 0
        self._pending_delete_ids: list[tuple[int, int]] = []  # (seq, docid)
        self._pending_delete_terms: list[tuple[int, str]] = []
        # (seq, docid, doc, content_col)
        self._pending_replacements: list[tuple[int, int, dict, str]] = []
        self._pending_spellings: dict[str, int] = {}
        self._txn_snapshot: dict | None = None
        self.index = None
        if os.path.exists(path) and merge.warehouse_complete(path):
            self.index = merge.read_warehouse(spark, path)

    def add_documents(self, docs: DataFrame, content_col: str = "content",
                      docid_col: str = "docid") -> None:
        self._pending.append((docs, content_col, docid_col))

    def delete_document(self, docid_or_term) -> None:
        """WritableDatabase::delete_document (database.h): by docid, or by
        unique-ID term (string form — deletes every document indexed by
        that term).  Buffered; commit() appends the dead docids to
        `{path}/tombstones` — the LSM re-expression of glass's in-place
        postlist removal.  Matching excludes tombstoned docs from the very
        next open; compact() reclaims the space physically (the Lucene
        segment-merge shape, which is what survives at 10^12 files where a
        per-delete posting-list rewrite cannot)."""
        self._mut_seq += 1
        if isinstance(docid_or_term, str):
            self._pending_delete_terms.append((self._mut_seq, docid_or_term))
        else:
            self._pending_delete_ids.append(
                (self._mut_seq, int(docid_or_term))
            )

    def replace_document(self, docid: int, doc: dict,
                         content_col: str = "content") -> None:
        """WritableDatabase::replace_document (database.h): atomically
        delete+reindex one document under the same docid.  `doc` is a dict
        of column values including the content column (extra columns become
        value slots, like add_documents rows).  Buffered; commit() appends
        the new termlist to the `{path}/delta` overlay — last-writer-wins
        per docid, the exact resolution the streaming path and compact()
        already apply — so no base posting list is rewritten."""
        if not isinstance(doc, dict):
            raise TypeError("doc must be a dict of column values")
        if content_col not in doc:
            raise ValueError(f"doc must include the {content_col!r} column")
        self._mut_seq += 1
        self._pending_replacements.append(
            (self._mut_seq, int(docid), dict(doc), content_col)
        )

    def add_spelling(self, word: str, freqinc: int = 1) -> None:
        """WritableDatabase::add_spelling (database.h): add a word to the
        spelling dictionary.  This engine already treats every indexed term
        as spelling-correctable (richer than the reference's opt-in
        FLAG_SPELLING table — documented divergence); add_spelling adds
        EXTRA words that aren't index terms.  Buffered until commit()."""
        self._pending_spellings[word.lower()] = (
            self._pending_spellings.get(word.lower(), 0) + int(freqinc)
        )

    def remove_spelling(self, word: str, freqdec: int = 1) -> None:
        """WritableDatabase::remove_spelling: decrement an explicitly added
        spelling entry (index terms remain correctable — see add_spelling)."""
        self._pending_spellings[word.lower()] = (
            self._pending_spellings.get(word.lower(), 0) - int(freqdec)
        )

    def add_synonym(self, term: str, synonym: str) -> None:
        """WritableDatabase::add_synonym (glass synonym table): buffered,
        applied in call order at commit()."""
        self._pending_syn_ops.append(("add", term, synonym))

    def remove_synonym(self, term: str, synonym: str) -> None:
        """WritableDatabase::remove_synonym: drop one synonym of a term at
        commit() (call order honoured — a later add wins)."""
        self._pending_syn_ops.append(("remove", term, synonym))

    def clear_synonyms(self, term: str) -> None:
        """WritableDatabase::clear_synonyms: drop every synonym of a term
        at commit() (adds issued after the clear survive)."""
        self._pending_syn_ops.append(("clear", term, None))

    # -- transactions (database.h:1140-1230) ------------------------------
    # The reference batches changes so they apply atomically or not at all;
    # commit() here is already atomic per buffer (checkpointed stages plus
    # driver-side metadata renames), so a transaction is a snapshot of the
    # pending buffers that cancel_transaction can roll back to.

    def begin_transaction(self, flushed: bool = True) -> None:
        if self._txn_snapshot is not None:
            raise RuntimeError("transaction already in progress")
        import copy

        self._txn_snapshot = {
            "pending": list(self._pending),
            "syn_ops": list(self._pending_syn_ops),
            "metadata": dict(self._pending_metadata),
            "delete_ids": list(self._pending_delete_ids),
            "delete_terms": list(self._pending_delete_terms),
            "replacements": copy.deepcopy(self._pending_replacements),
            "spellings": dict(self._pending_spellings),
        }

    def commit_transaction(self) -> None:
        if self._txn_snapshot is None:
            raise RuntimeError("no transaction in progress")
        self._txn_snapshot = None
        self.commit()

    def cancel_transaction(self) -> None:
        if self._txn_snapshot is None:
            raise RuntimeError("no transaction in progress")
        s = self._txn_snapshot
        self._pending = s["pending"]
        self._pending_syn_ops = s["syn_ops"]
        self._pending_metadata = s["metadata"]
        self._pending_delete_ids = s["delete_ids"]
        self._pending_delete_terms = s["delete_terms"]
        self._pending_replacements = s["replacements"]
        self._pending_spellings = s["spellings"]
        self._txn_snapshot = None

    def set_metadata(self, key: str, value: str) -> None:
        """WritableDatabase::set_metadata (database.h:1340-1370): buffered,
        atomic at commit() like document changes.  An empty value deletes
        the key (glass_database.cc:1719-1721)."""
        if not key:
            raise ValueError("empty metadata key is invalid")
        self._pending_metadata[key] = value

    def _next_batch_id(self) -> int:
        """Monotonic mutation-generation counter across the delta AND
        tombstone overlays (their relative order decides which wins per
        docid at read time)."""
        hi = 0
        for name in ("delta", "tombstones"):
            d = os.path.join(self.path, name)
            if not os.path.exists(d):
                continue
            row = (
                self.spark.read.parquet(d)
                .agg(F.max("_batch_id").alias("m")).collect()[0]
            )
            hi = max(hi, int(row["m"] or 0))
        return hi + 1

    def commit(self) -> None:
        if self._txn_snapshot is not None:
            raise RuntimeError(
                "transaction in progress: commit_transaction or "
                "cancel_transaction first"
            )
        mutated = False
        if self._pending:
            # several add_documents calls per commit fold into ONE build
            # (the reference buffers add_document rows the same way,
            # glass_database.cc flush thresholds); batches may differ in
            # column sets (value slots) and in content/docid column names
            docs, content_col, docid_col = self._pending[0]
            for extra, cc, dc in self._pending[1:]:
                if cc != content_col:
                    extra = extra.withColumnRenamed(cc, content_col)
                if dc != docid_col:
                    extra = extra.withColumnRenamed(dc, docid_col)
                docs = docs.unionByName(extra, allowMissingColumns=True)
            self._pending.clear()
            merge.build_warehouse(
                self.spark, docs, self.path,
                content_col=content_col, docid_col=docid_col, mode=self.mode,
                prefix_fields=self.prefix_fields, n_ranges=self.n_ranges,
            )
            # a fresh build stamps revision 1 itself — only overlay
            # mutations below bump the revision
        if (self._pending_delete_ids or self._pending_delete_terms
                or self._pending_replacements):
            if not merge.warehouse_complete(self.path):
                raise RuntimeError(
                    "delete/replace need a committed revision to apply to"
                )
            mutated = True
        # resolve interleaved delete/replace per docid: the op with the
        # highest sequence number wins, matching the reference applying
        # mutations in call order within a transaction
        del_seq: dict[int, int] = {}
        for seq, d in self._pending_delete_ids:
            del_seq[d] = max(del_seq.get(d, 0), seq)
        repl_by_id: dict[int, tuple[int, dict, str]] = {}
        for seq, did, doc, cc in self._pending_replacements:
            if did not in repl_by_id or seq > repl_by_id[did][0]:
                repl_by_id[did] = (seq, doc, cc)
        if self._pending_delete_terms:
            idx = self.index or merge.read_warehouse(self.spark, self.path)
            tdf = self.spark.createDataFrame(
                [(t,) for t in {t for _, t in self._pending_delete_terms}],
                "term string",
            )
            term_seq: dict[str, int] = {}
            for s, t in self._pending_delete_terms:
                term_seq[t] = max(term_seq.get(t, 0), s)
            for r in (
                idx.postings.join(F.broadcast(tdf), "term")
                .select("term", "docid").distinct().collect()
            ):
                d = r["docid"]
                del_seq[d] = max(del_seq.get(d, 0), term_seq[r["term"]])
            # a same-commit replacement may INTRODUCE the deleted term:
            # a later term-delete must see the replacement's content,
            # like the reference applying ops in call order (tokenize the
            # few pending docs driver-side with the build tokenizer)
            if repl_by_id:
                from xapian_spark.text.tokenizer import invert_doc

                for did, (rseq, doc, cc) in repl_by_id.items():
                    later = {
                        t: s for t, s in term_seq.items() if s > rseq
                    }
                    if not later:
                        continue
                    entries, _dl = invert_doc(str(doc[cc]), mode=self.mode)
                    new_terms = {t for t, _w, _p in entries}
                    if self.prefix_fields:
                        for c, p in self.prefix_fields.items():
                            if c in doc:
                                new_terms.add(p + str(doc[c]).lower())
                    for t, s in later.items():
                        if t in new_terms:
                            del_seq[did] = max(del_seq.get(did, 0), s)
        final_deletes = sorted(
            d for d, s in del_seq.items()
            if d not in repl_by_id or s > repl_by_id[d][0]
        )
        final_repls = [
            (did, doc, cc)
            for did, (s, doc, cc) in sorted(repl_by_id.items())
            if did not in del_seq or s > del_seq[did]
        ]
        self._pending_delete_ids = []
        self._pending_delete_terms = []
        self._pending_replacements = []
        bid = (
            self._next_batch_id()
            if (final_deletes or final_repls)
            else 0
        )
        # deletes -> tombstones (append-only parquet of dead docids;
        # _batch_id orders them against delta rows so a later delete is
        # never resurrected by an earlier replacement's delta row)
        if final_deletes:
            self.spark.createDataFrame(
                [(int(d), bid) for d in final_deletes],
                "docid long, _batch_id long",
            ).coalesce(1).write.mode("append").parquet(
                os.path.join(self.path, "tombstones")
            )
        # replacements -> delta termlists + delta_docs (last-writer-wins)
        if final_repls:
            from xapian_spark.streaming.incremental import _batch_termlists

            by_cc: dict[str, list[tuple[int, dict]]] = {}
            for did, doc, cc in final_repls:
                by_cc.setdefault(cc, []).append((did, doc))
            for cc, rows in by_cc.items():
                df = self.spark.createDataFrame(
                    [{**doc, "docid": did} for did, doc in rows]
                )
                tl = _batch_termlists(df, cc, "docid", self.mode)
                if self.prefix_fields:
                    # same boolean field terms the base build emits
                    pf = {
                        c: p for c, p in self.prefix_fields.items()
                        if c in df.columns
                    }
                    if pf:
                        src = df.withColumn(
                            "docid", F.col("docid").cast("long")
                        )
                        bool_entries = F.array_distinct(F.filter(
                            F.array(*[
                                F.struct(
                                    F.concat(
                                        F.lit(p), F.lower(F.col(c))
                                    ).alias("term"),
                                    F.lit(0).cast("int").alias("wdf"),
                                    F.lit(None).cast("array<int>").alias(
                                        "positions"
                                    ),
                                )
                                for c, p in pf.items()
                            ]),
                            lambda e: e["term"].isNotNull(),
                        ))
                        tl = tl.join(
                            src.select(
                                "docid", bool_entries.alias("_bools")
                            ),
                            "docid",
                        ).withColumn(
                            "plist", F.concat("plist", "_bools")
                        ).drop("_bools")
                tl.select(
                    "docid", "content_sha256", "doclen", "plist"
                ).withColumn("_batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(os.path.join(self.path, "delta"))
                df.withColumn(
                    "docid", F.col("docid").cast("long")
                ).withColumn(
                    "content_sha256",
                    F.sha2(F.col(cc).cast("binary"), 256),
                ).withColumn("_batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(os.path.join(self.path, "delta_docs"))
        # explicit spelling dictionary entries (word, freq)
        if self._pending_spellings:
            sp_path = os.path.join(self.path, "spellings")
            new = self.spark.createDataFrame(
                list(self._pending_spellings.items()),
                "term string, tf long",
            )
            if os.path.exists(sp_path):
                new = self.spark.read.parquet(sp_path).unionByName(new)
            folded = (
                new.groupBy("term").agg(F.sum("tf").alias("tf"))
                .where(F.col("tf") > 0)
            )
            folded.write.mode("overwrite").parquet(sp_path + ".tmp")
            import shutil

            if os.path.exists(sp_path):
                shutil.rmtree(sp_path)
            os.replace(sp_path + ".tmp", sp_path)
            self._pending_spellings = {}
        if self._pending_syn_ops:
            syn_path = os.path.join(self.path, "synonyms")
            # replay ops in call order: a clear voids every earlier pair
            # op for that term; the LAST add/remove of a pair wins
            clear_terms: set[str] = set()
            pair_state: dict[tuple[str, str], tuple[int, str]] = {}
            for i, (op, t, s) in enumerate(self._pending_syn_ops):
                if op == "clear":
                    clear_terms.add(t)
                    for k in [
                        k for k, (j, _o) in pair_state.items()
                        if k[0] == t and j < i
                    ]:
                        del pair_state[k]
                else:
                    pair_state[(t, s)] = (i, op)
            base = (
                self.spark.read.parquet(syn_path)
                if os.path.exists(syn_path)
                else self.spark.createDataFrame(
                    [], "term string, synonym string"
                )
            )
            if clear_terms:
                base = base.where(~F.col("term").isin(list(clear_terms)))
            removes = [
                k for k, (_i, op) in pair_state.items() if op == "remove"
            ]
            adds = [k for k, (_i, op) in pair_state.items() if op == "add"]
            if removes:
                rm = self.spark.createDataFrame(
                    removes, "term string, synonym string"
                )
                base = base.join(rm, ["term", "synonym"], "left_anti")
            if adds:
                base = base.unionByName(
                    self.spark.createDataFrame(
                        adds, "term string, synonym string"
                    )
                )
            # write to .tmp then rename: the source parquet is never
            # overwritten while being read, so no materialization needed
            base.distinct().write.mode("overwrite").parquet(
                syn_path + ".tmp"
            )
            import shutil

            if os.path.exists(syn_path):
                shutil.rmtree(syn_path)
            os.replace(syn_path + ".tmp", syn_path)
            self._pending_syn_ops = []
        if self._pending_metadata:
            mpath = os.path.join(self.path, "metadata")
            new = self.spark.createDataFrame(
                list(self._pending_metadata.items()),
                "key string, value string",
            )
            if os.path.exists(mpath):
                old = self.spark.read.parquet(mpath).join(
                    new.select("key"), "key", "left_anti"
                )
                new = old.unionByName(new)
            # empty value == deletion (glass_database.cc:1719-1721)
            new = new.where(F.col("value") != "")
            new.write.mode("overwrite").parquet(mpath + ".tmp")
            import shutil

            if os.path.exists(mpath):
                shutil.rmtree(mpath)
            os.replace(mpath + ".tmp", mpath)
            self._pending_metadata = {}
        if mutated and merge.warehouse_complete(self.path):
            # one more revision of the same database (glass_version.h)
            meta = merge._read_meta(self.path, "stats")
            meta["revision"] = int(meta.get("revision", 1)) + 1
            merge._commit(self.path, "stats", meta)
        if merge.warehouse_complete(self.path):
            self.index = merge.read_warehouse(self.spark, self.path)
            self._invalidate_memos()

    def compact(self, n_ranges: int | None = None,
                block_size: int = 512) -> None:
        """xapian-compact / Database::compact: fold the delete/replace
        overlay (tombstones + delta) physically into the base tables and
        rebuild the derived stages — one more revision, same uuid."""
        import shutil

        from xapian_spark.streaming.incremental import compact as _compact

        # fold the docdata overlay FIRST (the live view reads the
        # tombstone/delta dirs that the postings fold deletes): dead rows
        # drop, replacement rows win, and a warehouse with no docs table
        # but pending delta_docs gains one instead of orphaning them
        docs_dir = os.path.join(self.path, "docs")
        dd_dir = os.path.join(self.path, "delta_docs")
        folded = merge.live_docs(self.spark, self.path)
        had_overlay = os.path.exists(dd_dir) or os.path.exists(
            os.path.join(self.path, "tombstones")
        )
        if folded is not None and had_overlay:
            folded.write.mode("overwrite").parquet(docs_dir + ".tmp")
            if os.path.exists(docs_dir):
                shutil.rmtree(docs_dir)
            os.replace(docs_dir + ".tmp", docs_dir)
        if os.path.exists(dd_dir):
            shutil.rmtree(dd_dir)

        _compact(
            self.spark, self.path, mode=self.mode,
            n_ranges=n_ranges or self.n_ranges, block_size=block_size,
        )
        self.index = merge.read_warehouse(self.spark, self.path)
        self._invalidate_memos()


class InMemoryDatabase(Database):
    """Ephemeral database (the reference's InMemory backend): index a
    DataFrame without writing a warehouse."""

    def __init__(self, spark: SparkSession, docs: DataFrame,
                 content_col: str = "content", docid_col: str = "docid",
                 mode: str = "xapian",
                 prefix_fields: dict[str, str] | None = None,
                 synonyms: dict[str, list[str]] | None = None):
        idx = persist_index(
            build_index(
                spark, docs, content_col=content_col, docid_col=docid_col,
                mode=mode, prefix_fields=prefix_fields,
            )
        )
        if synonyms:
            rows = [(t, s) for t, ss in synonyms.items() for s in ss]
            idx.synonyms = spark.createDataFrame(
                rows, "term string, synonym string"
            )
        super().__init__(spark, index=idx)


class Registry:
    """xapian::Registry (registry.h:36-130): name -> implementation lookup
    used when unserialising custom Weight / PostingSource / KeyMaker /
    MatchSpy objects.  Pre-registered: every built-in weighting scheme
    (the 17 of `ranking/weights.py`) and the built-in posting sources —
    the same defaults the reference's Registry constructor installs."""

    def __init__(self):
        self._weights = dict(WEIGHT_SCHEMES)
        self._sources = {
            "Xapian::ValueWeightPostingSource": ast.ValueWeightSource,
            "Xapian::DecreasingValueWeightPostingSource":
                ast.DecreasingValueWeightSource,
            "Xapian::FixedWeightPostingSource": ast.FixedWeightSource,
            "Xapian::ValueMapPostingSource": ast.ValueMapSource,
        }
        self._keymakers = {
            "Xapian::MultiValueKeyMaker": MultiValueKeyMaker,
        }

    def register_weighting_scheme(self, name: str, cls) -> None:
        self._weights[name] = cls

    def get_weighting_scheme(self, name: str):
        """The scheme class for a name, or None (like the reference
        returning NULL for unknown names)."""
        return self._weights.get(name)

    def register_posting_source(self, name: str, cls) -> None:
        self._sources[name] = cls

    def get_posting_source(self, name: str):
        return self._sources.get(name)

    def register_key_maker(self, name: str, cls) -> None:
        self._keymakers[name] = cls

    def get_key_maker(self, name: str):
        return self._keymakers.get(name)


class MultiValueKeyMaker:
    """xapian::MultiValueKeyMaker (api/keymaker.cc:36-70): a composite sort
    key built from value slots, each ascending or descending.  The reference
    concatenates byte-flipped serialized values into one sortable string;
    Spark sorts by the typed columns directly with per-column direction —
    same total order, no serialization."""

    def __init__(self):
        self.keys: list[tuple[str, bool]] = []

    def add_value(self, column: str, reverse: bool = False) -> "MultiValueKeyMaker":
        self.keys.append((column, reverse))
        return self


class ValueSetMatchDecider:
    """ValueSetMatchDecider (valuesetmatchdecider.h:43-100): keep (or, with
    inclusive=False, drop) documents whose value column is in a given set.
    Renders to a SQL predicate, so Enquire.set_match_decider can take it
    directly and Catalyst pushes it at the candidates."""

    def __init__(self, column: str, inclusive: bool = True,
                 values: set[str] | None = None):
        self.column = column
        self.inclusive = inclusive
        self.values: set = set(values or ())

    def add_value(self, value) -> None:
        self.values.add(value)

    def remove_value(self, value) -> None:
        self.values.discard(value)

    def sql(self) -> str:
        if not self.values:
            # empty set: inclusive matches nothing, exclusive everything
            return "false" if self.inclusive else "true"
        lits = ", ".join(
            "'" + str(v).replace("'", "''") + "'"
            for v in sorted(self.values, key=str)
        )
        col = f"CAST(`{self.column}` AS STRING)"
        if self.inclusive:
            return f"{col} IN ({lits})"
        # exclusive: a doc with NO value in the slot is not in the set and
        # must match (NULL NOT IN (...) is NULL, which where() drops)
        return f"({col} IS NULL OR {col} NOT IN ({lits}))"


@dataclass
class RSet:
    """Relevance set (xapian::RSet)."""

    docids: list[int] = field(default_factory=list)

    def add_document(self, docid: int) -> None:
        self.docids.append(docid)


class Enquire:
    """xapian::Enquire: set_query -> get_mset, plus collapse/sort/expand."""

    def __init__(self, db: Database):
        self.db = db
        self._query: ast.Node | None = None
        self._weight: Weight | None = None
        self._collapse_key: str | None = None
        self._collapse_max = 1
        self._sort_by: list[tuple[str, bool]] | None = None
        self._sort_mode: str = "relevance"  # enquire.h:170-270 sort modes
        self._docid_asc = True  # set_docid_order(ASCENDING) default
        self._percent_cutoff = 0
        self._weight_cutoff = 0.0
        self._decider_sql: str | None = None
        self._matchspies: list[str] = []
        self._spy_results: dict[str, list[tuple]] = {}

    def set_query(self, query: ast.Node | str) -> None:
        if isinstance(query, str):
            query = QueryParser().parse_query(query)
        self._query = query

    def set_weighting_scheme(self, scheme: str | Weight) -> None:
        self._weight = (
            WEIGHT_SCHEMES[scheme]() if isinstance(scheme, str) else scheme
        )

    def set_collapse_key(self, column: str, collapse_max: int = 1) -> None:
        """Collapser analogue (collapser.h:135-260) over a docs column."""
        self._collapse_key = column
        self._collapse_max = collapse_max

    def set_sort_by_relevance(self) -> None:
        self._sort_by = None
        self._sort_mode = "relevance"

    def set_sort_by_value(self, column: str, reverse: bool = False) -> None:
        """Pure value sort; docid breaks ties (msetcmp.cc value order)."""
        self._sort_by = [(column, reverse)]
        self._sort_mode = "value"

    def set_sort_by_value_then_relevance(
        self, column: str, reverse: bool = False
    ) -> None:
        self._sort_by = [(column, reverse)]
        self._sort_mode = "value_then_relevance"

    def set_sort_by_relevance_then_value(
        self, column: str, reverse: bool = False
    ) -> None:
        self._sort_by = [(column, reverse)]
        self._sort_mode = "relevance_then_value"

    def _km_keys(
        self, keymaker: "MultiValueKeyMaker | list[tuple[str, bool]]",
        reverse: bool,
    ) -> list[tuple[str, bool]]:
        keys = keymaker.keys if isinstance(keymaker, MultiValueKeyMaker) \
            else list(keymaker)
        # Enquire::set_sort_by_key's `reverse` flips the WHOLE key order
        # (enquire.h:206-214), i.e. every component's direction.
        return [(c, rev != reverse) for c, rev in keys]

    def set_sort_by_key(
        self, keymaker: "MultiValueKeyMaker | list[tuple[str, bool]]",
        reverse: bool = False,
    ) -> None:
        """Enquire::set_sort_by_key (KeyMaker sort, enquire.h:196-214):
        composite multi-column sort key, docid breaks ties."""
        self._sort_by = self._km_keys(keymaker, reverse)
        self._sort_mode = "value"

    def set_sort_by_key_then_relevance(
        self, keymaker: "MultiValueKeyMaker | list[tuple[str, bool]]",
        reverse: bool = False,
    ) -> None:
        self._sort_by = self._km_keys(keymaker, reverse)
        self._sort_mode = "value_then_relevance"

    def set_sort_by_relevance_then_key(
        self, keymaker: "MultiValueKeyMaker | list[tuple[str, bool]]",
        reverse: bool = False,
    ) -> None:
        self._sort_by = self._km_keys(keymaker, reverse)
        self._sort_mode = "relevance_then_value"

    def set_docid_order(self, ascending: bool = True) -> None:
        """Enquire::set_docid_order (enquire.h): tie-break direction.
        ASCENDING (default) / DESCENDING; DONT_CARE == ASCENDING here."""
        self._docid_asc = ascending

    def set_time_limit(self, time_limit: float) -> None:
        """Enquire::set_time_limit (enquire.h:339-359): in the reference
        this arms a timer that forces the match to stop early, trading
        accuracy for latency.  This engine's match is a set-at-a-time
        Spark job that always completes exactly, which is a permitted
        behavior of the contract (the limit is best-effort; finishing with
        exact results is never wrong) — the value is accepted and recorded
        but no early stop occurs.  Documented divergence."""
        self._time_limit = float(time_limit)

    def set_cutoff(self, percent_cutoff: int, weight_cutoff: float = 0.0) -> None:
        """Enquire::set_cutoff: drop results below a percent of the best
        weight and/or below an absolute weight."""
        self._percent_cutoff = percent_cutoff
        self._weight_cutoff = weight_cutoff

    def get_matching_terms(self, docid: int) -> list[str]:
        """Query terms that index the given document, in ascending query
        position with duplicates reported once at their lowest position
        (Enquire::get_matching_terms_begin, enquire.h:408-421).  Query
        position == left-to-right order in the AST, which is how the
        parser assigns positions."""
        if self._query is None:
            return []
        doc_terms = {t for t, _, _ in self.db.termlist(docid)}
        out: list[str] = []
        seen: set[str] = set()
        for t in _query_terms_in_order(self._query):
            if t in doc_terms and t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def set_match_decider(self, decider) -> None:
        """MatchDecider (deciderpostlist.cc): arbitrary row predicate over
        the doc columns, applied to candidates — a SQL boolean expression
        string (e.g. "n_chars > 100 AND lang = 'en'") or an object with a
        .sql() method such as ValueSetMatchDecider."""
        self._decider_sql = (
            decider.sql() if hasattr(decider, "sql") else decider
        )

    def get_query(self):
        """Enquire::get_query (enquire.h): the query set by set_query
        (MatchNothing when none has been set, like the reference)."""
        return self._query if self._query is not None else ast.MatchNothing()

    def add_matchspy(self, column: str) -> None:
        """ValueCountMatchSpy (matchspy.h:205): collect value->count facets
        over the FULL match set during get_mset."""
        self._matchspies.append(column)

    def clear_matchspies(self) -> None:
        """Enquire::clear_matchspies (enquire.h)."""
        self._matchspies.clear()
        self._spy_results.clear()

    def get_matchspy_results(self, column: str) -> list[tuple]:
        """[(value, count)] sorted by count desc, value — docs/facets.rst."""
        return self._spy_results.get(column, [])

    def get_matchspy_top_values(self, column: str,
                                maxvalues: int) -> list[tuple]:
        """ValueCountMatchSpy::top_values_begin (matchspy.h:240-270): the
        maxvalues most frequent facet values.  The spy ran distributed
        over the FULL match set during get_mset; merge_results across
        shards is the groupBy that computed it — no driver-side merge
        step exists to expose."""
        return self.get_matchspy_results(column)[:maxvalues]

    def get_matchspy_total(self, column: str) -> int:
        """MatchSpy::get_total: documents the spy saw (the full match)."""
        return sum(c for _, c in self._spy_results.get(column, []))

    def _matches(self) -> DataFrame:
        if self._query is None:
            raise ValueError("set_query first")
        m = Planner(self.db.index, self._weight).plan(self._query)
        if self._decider_sql:
            docs = self.db.index.docs
            m = m.join(
                docs.select(
                    *[c for c in docs.columns if c != "score"]
                ),
                "docid",
            ).where(F.expr(self._decider_sql)).select("docid", "score")
        if self._matchspies:
            docs = self.db.index.docs
            spy_df = m.join(
                docs.select("docid", *self._matchspies), "docid"
            )
            for col in self._matchspies:
                rows = (
                    spy_df.groupBy(col)
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .orderBy(F.desc("cnt"), F.asc(col))
                    .collect()
                )
                self._spy_results[col] = [(r[col], r["cnt"]) for r in rows]
        return m

    def get_mset(self, first: int, maxitems: int) -> MSet:
        m = self._matches()
        uncollapsed_fn = None
        if self._collapse_key:
            from pyspark.sql import Window

            uncollapsed_fn = m.count  # lazy, pre-collapse (mset.h:300-330)
            docs = self.db.index.docs.select("docid", self._collapse_key)
            m = m.join(docs, "docid")
            w = Window.partitionBy(self._collapse_key).orderBy(
                F.desc("score"), F.asc("docid")
            )
            wn = Window.partitionBy(self._collapse_key)
            m = (
                m.withColumn("_cr", F.row_number().over(w))
                .withColumn("_ckn", F.count(F.lit(1)).over(wn))
                # a NULL key never collapses (the reference leaves docs
                # with an empty collapse key uncollapsed, collapser.cc)
                .where(
                    F.col(self._collapse_key).isNull()
                    | (F.col("_cr") <= self._collapse_max)
                )
                .withColumn("_ckey", F.col(self._collapse_key))
                .withColumn(
                    "_ccount",
                    # eliminated docs are attributed to the group's best
                    # hit (MSetIterator::get_collapse_count)
                    F.when(F.col(self._collapse_key).isNull(), F.lit(0))
                    .when(
                        F.col("_cr") == 1,
                        F.greatest(
                            F.lit(0),
                            F.col("_ckn") - F.lit(self._collapse_max),
                        ),
                    ).otherwise(F.lit(0)),
                )
                .drop("_cr", "_ckn", self._collapse_key)
            )
        if self._weight_cutoff:
            m = m.where(F.col("score") >= F.lit(self._weight_cutoff))
        # exact total match count, evaluated lazily on first
        # get_matches_estimated() call (see MSet).  With a percent cutoff
        # the count must honour it (the reference scales its estimates by
        # the cutoff, mset.cc): count docs whose percent — computed
        # against the GLOBAL best weight exactly like the page filter
        # below — clears the bar, so lower == estimate == upper stays
        # exact under set_cutoff(percent).
        if self._percent_cutoff:
            pct_cut, counted = self._percent_cutoff, m

            def count_fn(counted=counted, pct_cut=pct_cut):
                gmax = counted.agg(F.max("score")).collect()[0][0] or 0.0
                if gmax <= 0:
                    return 0
                pct = F.greatest(
                    F.lit(1),
                    F.round(F.lit(100.0) * F.col("score") / F.lit(gmax))
                    .cast("int"),
                )
                return (
                    counted.where(F.col("score") > 0)
                    .where(pct >= F.lit(pct_cut))
                    .count()
                )
        else:
            count_fn = m.count
        did = F.asc("docid") if self._docid_asc else F.desc("docid")
        if self._sort_by:
            vals = [
                (F.asc(c) if not rev else F.desc(c))
                for c, rev in self._sort_by
            ]
            if self._sort_mode == "value":
                order = vals + [did]
            elif self._sort_mode == "relevance_then_value":
                order = [F.desc("score")] + vals + [did]
            else:  # value_then_relevance (and legacy set_sort_by_value path)
                order = vals + [F.desc("score"), did]
            cols = [c for c, _ in self._sort_by]
            m = m.join(self.db.index.docs.select("docid", *cols), "docid")
            # Under a value sort the collected window need not contain the
            # best-weight doc, and percents are relative to the best weight
            # OVERALL (mset.cc:253-271) — fetch the global max separately.
            global_max = m.agg(F.max("score")).collect()[0][0] or 0.0
            if self._percent_cutoff:
                # the cutoff applies DURING the match (mset.cc), so it
                # must filter before the page window is cut — filtering
                # the collected page afterwards would return short pages
                # while above-cutoff docs sit just outside the window
                if global_max > 0:
                    pct = F.greatest(
                        F.lit(1),
                        F.round(
                            F.lit(100.0) * F.col("score")
                            / F.lit(global_max)
                        ).cast("int"),
                    )
                    m = m.where(F.col("score") > 0).where(
                        pct >= F.lit(self._percent_cutoff)
                    )
                else:
                    m = m.where(F.lit(False))
            top = m.orderBy(*order).limit(first + maxitems)
        else:
            top = m.orderBy(F.desc("score"), did).limit(
                first + maxitems
            )
        if self._sort_by:
            # HALF_UP like Spark's F.round (and the reference's +0.5
            # truncation, mset.cc) — Python round() is HALF_EVEN and would
            # disagree with count_fn/with_percent on exact .5 boundaries
            pct_of = lambda s: (  # noqa: E731
                max(1, int(math.floor(100.0 * s / global_max + 0.5)))
                if s > 0 and global_max > 0
                else 0
            )
            rows = [(r, pct_of(r["score"])) for r in top.collect()]
        else:
            rows = [
                (r, r["percent"])
                for r in with_percent(top, "score").collect()
            ]
        out = MSet()
        out._count_fn = count_fn
        out._uncollapsed_fn = uncollapsed_fn
        out._firstitem = first
        out._enquire = self  # for MSet.snippet (reference: MSet::Internal)
        # best attained weight, for convert_to_percent: the relevance-sorted
        # window contains the global best; under a value sort it was
        # fetched separately above
        out._max_attained = (
            global_max if self._sort_by
            else max((r["score"] for r, _ in rows), default=0.0)
        )
        out._max_possible = self._weight_upper_bound()
        sort_cols = [c for c, _ in self._sort_by] if self._sort_by else []
        rank = -1
        for i, (r, percent) in enumerate(rows):
            if i < first:
                continue
            if self._percent_cutoff and percent < self._percent_cutoff:
                continue
            rank += 1
            d = r.asDict()
            out.append(
                MSetItem(
                    rank=first + rank, docid=r["docid"], weight=r["score"],
                    percent=percent,
                    collapse_key=d.get("_ckey"),
                    collapse_count=int(d.get("_ccount") or 0),
                    sort_key=(
                        tuple(d.get(c) for c in sort_cols)
                        if sort_cols else None
                    ),
                )
            )
        return out

    def _weight_upper_bound(self) -> float:
        """MSet::get_max_possible: sum of per-term weight maxparts plus
        the document-independent maxextra — the same bound block-max WAND
        prunes with (matcher.cc max_possible accounting).  0 for a pure
        boolean / empty query."""
        if self._query is None:
            return 0.0
        scheme = getattr(self, "_weight", None) or WEIGHT_SCHEMES["bm25"]()
        if not hasattr(scheme, "init_term"):
            return 0.0
        # expand wildcard/fuzzy leaves to their dictionary terms first —
        # leaf_terms() alone would return nothing for OP_WILDCARD and
        # break the upper-bound contract (bound < attained)
        try:
            q = Planner(self.db.index, weight=scheme)._expand(self._query)
        except Exception:
            q = self._query
        terms = [t for t in ast.leaf_terms(q)]
        if not terms:
            return 0.0
        stats = self.db.index.stats
        names = sorted({t.term for t in terms})
        ts = self.db.index.collect_term_stats(names)
        bound = 0.0
        for t in terms:
            s = ts.get(t.term)
            if s is None or s.tf == 0:
                continue
            tw = scheme.init_term(stats, s, wqf=getattr(t, "wqf", 1))
            bound += tw.maxpart(s.wdf_max, stats.doclen_lower_bound)
        if hasattr(scheme, "maxextra"):
            bound += scheme.maxextra(stats, len(terms))
        return bound

    def get_expansion_scheme(self) -> tuple:
        """Enquire::get_expansion_scheme: (name, k) as configured."""
        return getattr(self, "_expand_scheme", ("bo1", 1.0))

    def set_expansion_scheme(self, eweightname: str,
                             expand_k: float = 1.0) -> None:
        """Enquire::set_expansion_scheme (enquire.cc:216-226): "bo1"
        (the default) or "trad" (TradEWeight with parameter k)."""
        if eweightname not in ("bo1", "trad"):
            raise ValueError(
                "eweightname must be 'bo1' or 'trad'"
            )
        self._expand_scheme = (eweightname, expand_k)

    def get_eset(self, maxitems: int, rset: RSet,
                 exclude_query_terms: bool = True,
                 decider=None) -> list[tuple[str, float]]:
        """Enquire::get_eset (enquire.h:500-520).  decider: optional
        ExpandDecider — a SQL boolean over `term` or a Python callable
        term -> bool (e.g. expand.ExpandDeciderFilterPrefix)."""
        exclude: set[str] = set()
        if exclude_query_terms and self._query is not None:
            exclude = {t.term for t in ast.leaf_terms(self._query)}
        scheme, ek = getattr(self, "_expand_scheme", ("bo1", 1.0))
        if scheme == "trad":
            full = trad_eset(
                self.db.index, rset.docids, k=None, expand_k=ek,
                exclude_terms=exclude, decider=decider,
            )
        else:
            full = bo1_eset(
                self.db.index, rset.docids, k=None,
                exclude_terms=exclude, decider=decider,
            )
        rows = full.limit(maxitems).collect()
        out = ESet((r["term"], r["wt"]) for r in rows)
        out._ebound_fn = full.count  # lazy (ESet::get_ebound)
        return out
