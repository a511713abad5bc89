"""Block-max WAND top-k over the blocked postings table.

The reference's dynamic pruning is iterator-state-driven: operators
propagate w_min and OR decays to AND_MAYBE/AND when the heap threshold
exceeds child maxweights (orpostlist.cc:106-140, postlisttree.h:111-123,
docs/matcherdesign.rst:51-100).  That design is doc-at-a-time; a Spark
re-expression must prune SET-at-a-time.  We use a safe two-pass block-max
scheme built on the per-block exact wdf_max (honey-style,
honey_postlist_encodings.h:26-111) and the BM25 maxpart bound formula
(bm25weight.cc:183-208):

  pass 0 (driver): per-term maxpart from term-level wdf_max; threshold T =
      k-th best single-term score of the highest-impact term (a valid
      lower bound of the true k-th best total score; computed from that
      term's blocks only).
  pass 1 (block prune): keep block B of term t iff
      maxpart_block(t, B) + sum_{t' != t} maxpart(t') >= T.
      For any doc d and any t in d's terms:
         score(d) <= maxpart_block(t, B_t(d)) + sum_{t' != t} maxpart(t')
      so a doc in the true top-k (score >= T) survives in at least one —
      in fact every — of its blocks.  Pruning is SAFE for exact top-k.
  pass 2 (rescore): decode surviving blocks -> candidate docids; fetch all
      query-term postings for candidates via a block range join (docid
      BETWEEN first_docid AND last_docid — the skip_to analogue,
      glass_postlist.cc seek-by-key); score fully; orderBy.limit(k).

At cluster scale pass 1 is a metadata-only parquet scan (term + wdf_max +
docid range columns; predicate pushdown, no payload decode), and pass 2
decodes only the handful of blocks that can contain competitive docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.index.blocks import unpack_blocks
from xapian_spark.ranking.weights import GlobalStats, TermStats, Weight


def wand_topk(
    blocked: DataFrame,
    stats: GlobalStats,
    tstats: dict[str, TermStats],
    terms: list[str],
    k: int,
    weight: Weight,
    wqf: dict[str, int] | None = None,
    max_broadcast_candidates: int = 200_000,
) -> DataFrame:
    """Exact BM25 top-k for a weighted-OR query over blocked postings.

    Returns the top-k (docid, score) rows, unordered (the checkpoint loses
    ordering); callers re-sort with orderBy(score desc, docid) for ranks.
    The top-k cut happens HERE, before the checkpoint, so only k rows are
    ever materialized — not the full candidate score set.

    Doc-dependent sumextra (e.g. BM25 k2) is handled SAFELY without
    disabling pruning: the pass-0 threshold includes each candidate's own
    sumextra (a valid lower bound on the true k-th best total), and the
    pass-1 block bound adds maxextra (a valid upper bound on any doc's
    extra part) — both sides stay conservative, pruning stays exact.

    max_broadcast_candidates gates the pass-2 join strategy: a small
    surviving-candidate set is broadcast into a block range join (the
    skip_to analogue); a large one (weak threshold, hot terms) falls back
    to decoding the query's blocks and a shuffled equality semi-join —
    never an unbounded broadcast.
    """
    wqf = wqf or {}
    if getattr(weight, "needs_uniqterms", False):
        raise ValueError(
            f"{type(weight).__name__} needs the per-doc uniqterms stat, "
            "which blocked postings do not carry; use Planner.search"
        )
    tws = {}
    for t in terms:
        ts = tstats.get(t)
        if ts is None or ts.tf == 0:
            continue
        tws[t] = weight.init_term(stats, ts, wqf=wqf.get(t, 1))
    if not tws:
        return blocked.sparkSession.createDataFrame([], "docid long, score double")

    live = sorted(tws)
    dl_lb = stats.doclen_lower_bound
    maxparts = {t: tws[t].maxpart(tstats[t].wdf_max, dl_lb) for t in live}
    total_max = sum(maxparts.values())

    qblocks = blocked.where(F.col("term").isin(live))

    # -- pass 0: threshold from the highest-impact term ---------------------
    # Each candidate's (sumpart + its OWN sumextra) is a lower bound on its
    # true total score, so the k-th best of these is a valid threshold even
    # for weights with a doc-dependent extra part (bm25weight.cc k2).
    qlen = sum(wqf.get(t, 1) for t in terms)
    t_star = max(live, key=lambda t: maxparts[t])
    star = unpack_blocks(qblocks.where(F.col("term") == t_star))
    star_lb = (
        tws[t_star].sumpart_expr(F.col("wdf"), F.col("doclen"))
        + weight.sumextra_expr(F.col("doclen"), qlen, stats)
    )
    star_scores = (
        star.select(star_lb.alias("s")).orderBy(F.desc("s")).limit(k).collect()
    )
    threshold = star_scores[-1]["s"] if len(star_scores) >= k else 0.0

    # -- pass 1: block-max pruning (metadata only, no payload decode) -------
    # Block upper bound adds maxextra so the comparison stays conservative
    # against the sumextra-inclusive threshold.
    mx_extra = weight.maxextra(stats, qlen)
    bound = None
    for t in live:
        rest = total_max - maxparts[t] + mx_extra
        b = tws[t].maxpart_expr(F.col("wdf_max"), dl_lb) + F.lit(rest)
        cond = (F.col("term") == t) & (b >= F.lit(threshold))
        bound = cond if bound is None else (bound | cond)
    surviving = qblocks.where(bound)

    # -- pass 2: candidates + exact rescore ---------------------------------
    # persist: the candidate set feeds both the size gate and the final
    # join; Spark's ContextCleaner drops the cached partitions once the
    # returned plan's references are garbage collected
    cands = unpack_blocks(surviving).select("docid").distinct().persist()
    n_cands = cands.count()
    if n_cands <= max_broadcast_candidates:
        # fetch every query-term block that can contain a candidate
        # (skip_to): tiny candidate set broadcast into a range join.
        fetch = (
            qblocks.alias("b")
            .join(
                F.broadcast(cands.alias("c")),
                (F.col("c.docid") >= F.col("b.first_docid"))
                & (F.col("c.docid") <= F.col("b.last_docid")),
                "left_semi",
            )
        )
        post = unpack_blocks(fetch).join(
            F.broadcast(cands), "docid", "left_semi"
        )
    else:
        # Weak threshold -> pruning kept most docs; a broadcast would be
        # unbounded.  Decode the query's blocks once and shuffle-semi-join
        # on docid equality (hash-partitionable at any scale).
        post = unpack_blocks(qblocks).join(cands, "docid", "left_semi")

    sumpart = None
    for t in live:
        cond = F.col("term") == t
        expr = tws[t].sumpart_expr(F.col("wdf"), F.col("doclen"))
        sumpart = (
            F.when(cond, expr) if sumpart is None
            else sumpart.when(cond, expr)
        )
    sumpart = sumpart.otherwise(0.0)
    agg = post.groupBy("docid").agg(
        F.sum(sumpart).alias("_s"), F.max("doclen").alias("_dl")
    )
    extra = weight.sumextra_expr(F.col("_dl"), qlen, stats)
    out = agg.select("docid", (F.col("_s") + extra).alias("score"))
    # Cut to the exact top-k (the deterministic ordering every caller
    # uses) BEFORE materializing: with a weak threshold the candidate set
    # can be most of the corpus, and checkpointing it whole would pin an
    # unbounded number of rows per query.  TakeOrderedAndProject bounds
    # the materialized result to k rows; then free the persisted candidate
    # partitions EXPLICITLY — a long-lived session issuing many queries
    # must not rely on ContextCleaner GC to evict them.
    out = (
        out.orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
        .localCheckpoint(eager=True)
    )
    cands.unpersist()
    return out


def brute_topk(
    blocked: DataFrame,
    stats: GlobalStats,
    tstats: dict[str, TermStats],
    terms: list[str],
    k: int,
    weight: Weight,
    wqf: dict[str, int] | None = None,
) -> DataFrame:
    """No-pruning twin of wand_topk (equivalence oracle for safety tests)."""
    wqf = wqf or {}
    tws = {
        t: weight.init_term(stats, tstats[t], wqf=wqf.get(t, 1))
        for t in terms
        if tstats.get(t) and tstats[t].tf > 0
    }
    if not tws:
        return blocked.sparkSession.createDataFrame([], "docid long, score double")
    if getattr(weight, "needs_uniqterms", False):
        raise ValueError(
            f"{type(weight).__name__} needs the per-doc uniqterms stat, "
            "which blocked postings do not carry; use Planner.search"
        )
    live = sorted(tws)
    post = unpack_blocks(blocked.where(F.col("term").isin(live)))
    sumpart = None
    for t in live:
        part_expr = tws[t].sumpart_expr(F.col("wdf"), F.col("doclen"))
        if sumpart is None:
            sumpart = F.when(F.col("term") == t, part_expr)
        else:
            sumpart = sumpart.when(F.col("term") == t, part_expr)
    sumpart = sumpart.otherwise(0.0)
    qlen = sum(wqf.get(t, 1) for t in terms)
    agg = post.groupBy("docid").agg(
        F.sum(sumpart).alias("_s"), F.max("doclen").alias("_dl")
    )
    extra = weight.sumextra_expr(F.col("_dl"), qlen, stats)
    return agg.select("docid", (F.col("_s") + extra).alias("score"))


def batch_wand_topk(
    blocked: DataFrame,
    stats: GlobalStats,
    tstats: dict[str, TermStats],
    queries: dict[str, list[str]],
    k: int,
    weight: Weight,
) -> DataFrame:
    """Threshold-aware BATCH serving over blocked postings: exact per-query
    BM25 top-k for many weighted-OR queries in one plan.

    Set-at-a-time block-max WAND:

      pass 0: per-query threshold T_q = k-th best single-term score of the
          query's highest-impact term — ONE decode job over the batch's
          star terms, grouped per query (a valid lower bound of each
          query's true k-th best total score).
      pass 1: (query, block) pruning as a METADATA-only join: broadcast
          (query, term, termweight, rest, T_q) against the block stats
          columns; keep blocks with maxpart_block + rest >= T_q.  Parquet
          column pruning means payloads of pruned blocks are never read.
      pass 2: decode the union of surviving blocks ONCE (keyed by
          first_docid), map postings back to (query, block) pairs, and
          aggregate per (query, docid).

    Pass 2 scores only surviving blocks, which is EXACT for top-k: if any
    block holding doc d was pruned for query q, then score_q(d) <=
    bound(block) + rest < T_q, while every true top-k doc of q scores
    >= k-th best >= T_q with ALL its blocks surviving (see wand_topk's
    bound argument) — so partially-scored docs rank strictly below every
    true top-k member and can never displace one.

    Requires a weight with no doc-dependent extra part (maxextra == 0,
    e.g. default BM25 k2=0); the caller falls back to the row-postings
    batch path otherwise.  Returns (query, rank, docid, score).
    """
    from collections import Counter

    from pyspark.sql import Window

    from xapian_spark.index.blocks import unpack_blocks, unpack_blocks_keyed
    from xapian_spark.ranking.weights import BM25Weight, TradWeight

    # the inlined sumpart/maxpart shapes below are the BM25-family
    # closed forms — guard here, not just in search_batch_or, so a direct
    # caller with e.g. TfIdfWeight gets an error instead of silently
    # BM25-shaped scores
    if not isinstance(weight, (BM25Weight, TradWeight)):
        raise ValueError(
            "batch_wand_topk supports BM25-family weights only "
            f"(got {type(weight).__name__}); use the row-postings batch "
            "path for other schemes"
        )

    spark = blocked.sparkSession
    empty = spark.createDataFrame(
        [], "query string, rank int, docid long, score double"
    )
    dl_lb = stats.doclen_lower_bound

    shape = None          # shared k1/b/len_factor/min_normlen constants
    qt_rows = []          # (query, term, tw, rest)
    star_rows = []        # (query, star_term)
    for qname, terms in queries.items():
        tws, maxparts = {}, {}
        for t, nrep in Counter(terms).items():
            ts = tstats.get(t)
            if ts is None or ts.tf == 0:
                continue
            tw = weight.init_term(stats, ts, wqf=nrep)
            tws[t] = tw
            maxparts[t] = tw.maxpart(ts.wdf_max, dl_lb)
            shape = tw
        if not tws:
            continue
        total = sum(maxparts.values())
        t_star = max(tws, key=lambda t: (maxparts[t], t))
        star_rows.append((qname, t_star))
        for t, tw in tws.items():
            qt_rows.append(
                (qname, t, float(tw.termweight),
                 float(total - maxparts[t]))
            )
    if not qt_rows:
        return empty

    def _sumpart(tw_col, wdf, doclen):
        normlen = F.greatest(
            doclen.cast("double") * F.lit(shape.len_factor),
            F.lit(shape.min_normlen),
        )
        denom = (
            F.lit(shape.k1)
            * (normlen * F.lit(shape.b) + F.lit(1.0 - shape.b))
            + wdf.cast("double")
        )
        return tw_col * (wdf.cast("double") / denom)

    def _maxpart(tw_col, wdf_max):
        wm = wdf_max.cast("double")
        if shape.k1 != 0.0 and shape.b != 0.0:
            normlen_lb = F.greatest(
                F.greatest(wm, F.lit(float(dl_lb)))
                * F.lit(shape.len_factor),
                F.lit(shape.min_normlen),
            )
            denom = (
                F.lit(shape.k1)
                * (normlen_lb * F.lit(shape.b) + F.lit(1.0 - shape.b))
                + wm
            )
        else:
            denom = F.lit(shape.k1) + wm
        return F.when(denom > 0, tw_col * (wm / denom)).otherwise(0.0)

    # -- pass 0: per-query thresholds ---------------------------------------
    star_df = spark.createDataFrame(star_rows, "query string, term string")
    star_terms = sorted({t for _, t in star_rows})
    star_tw = spark.createDataFrame(
        [(q, t, tw) for q, t, tw, _ in qt_rows],
        "query string, term string, tw double",
    ).join(F.broadcast(star_df), ["query", "term"], "left_semi")
    star_posts = unpack_blocks(
        blocked.where(F.col("term").isin(star_terms))
    )
    wq = Window.partitionBy("query").orderBy(F.desc("s"))
    kth = (
        star_posts.join(F.broadcast(star_tw), "term")
        .select(
            "query",
            _sumpart(F.col("tw"), F.col("wdf"), F.col("doclen")).alias("s"),
        )
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") == k)
        .select("query", F.col("s").alias("thr"))
        .collect()
    )
    thresholds = {r["query"]: r["thr"] for r in kth}  # absent -> 0.0

    qt = spark.createDataFrame(
        [
            (q, t, tw, rest, float(thresholds.get(q, 0.0)))
            for q, t, tw, rest in qt_rows
        ],
        "query string, term string, tw double, rest double, thr double",
    )

    # -- pass 1: metadata-only (query, block) pruning -----------------------
    meta = blocked.select("term", "first_docid", "wdf_max")
    surviving = (
        meta.join(F.broadcast(qt), "term")
        .where(
            _maxpart(F.col("tw"), F.col("wdf_max")) + F.col("rest")
            >= F.col("thr")
        )
        .select("query", "term", "first_docid", "tw")
    ).persist()

    # -- pass 2: decode surviving blocks once, score per (query, docid) -----
    sel_blocks = surviving.select("term", "first_docid").distinct()
    posts = unpack_blocks_keyed(
        blocked.join(sel_blocks, ["term", "first_docid"], "left_semi")
    )
    scored = (
        posts.join(surviving, ["term", "first_docid"])
        .groupBy("query", "docid")
        .agg(
            F.sum(
                _sumpart(F.col("tw"), F.col("wdf"), F.col("doclen"))
            ).alias("score")
        )
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("docid"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "rank", "docid", "score")
    )
    # Per-query top-k is bounded (|queries| * k rows): materialize it,
    # then explicitly free the persisted (query, block) survivors instead
    # of leaving them to ContextCleaner GC (see wand_topk).
    out = out.localCheckpoint(eager=True)
    surviving.unpersist()
    return out
