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

The BATCH path (batch_wand_topk) additionally layers MaxScore essential /
non-essential term splitting (Turtle & Flood, "Query evaluation:
strategies and optimizations", 1995 — the public algorithm Lucene ships
as its default dynamic-pruning strategy) so that candidate generation
touches only the selective terms and aggregate input stays proportional
to candidates x query terms rather than postings x queries.
"""

from __future__ import annotations

import os
import time

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
    doclens: DataFrame | None = None,
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
    # payload v2: blocks carry no doclen stream — scoring joins the
    # warehouse doclens table back in, candidate-scoped (blocks.py module
    # docstring; the glass separate-doclen-postlist layout)
    v2 = "payload_v" in blocked.columns
    if v2 and doclens is None:
        raise ValueError("payload v2 blocked table requires doclens")
    dl = doclens.select("docid", "doclen") if v2 else None
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
    if v2:
        # candidate-scope the doclen attach like pass 2: the star term's
        # posting count is known driver-side, so a selective star
        # broadcasts its docids into a semi-join on the corpus-sized
        # doclens table instead of shuffling all of it
        if tstats[t_star].tf <= max_broadcast_candidates:
            star_ids = star.select("docid")
            star_dl = dl.join(F.broadcast(star_ids), "docid", "left_semi")
            star = star.join(F.broadcast(star_dl), "docid")
        else:
            star = star.join(dl, "docid")
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
    if v2:
        # v2 doclen attach, candidate-scoped: a small candidate set
        # broadcasts its (docid, doclen) slice; a big one falls back to a
        # shuffled equality join (same gating as the fetch above)
        if n_cands <= max_broadcast_candidates:
            cand_dl = dl.join(F.broadcast(cands), "docid", "left_semi")
            post = post.join(F.broadcast(cand_dl), "docid")
        else:
            post = post.join(dl, "docid")

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
    doclens: DataFrame | None = None,
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
    if "payload_v" in blocked.columns:
        if doclens is None:
            raise ValueError("payload v2 blocked table requires doclens")
        post = post.join(doclens.select("docid", "doclen"), "docid")
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
    max_broadcast_candidates: int = 500_000,
    postings: DataFrame | None = None,
    doclens: DataFrame | None = None,
) -> DataFrame:
    """Threshold-aware BATCH serving over blocked postings: exact per-query
    BM25 top-k for many weighted-OR queries in one plan.

    Set-at-a-time MaxScore (Turtle & Flood 1995, the essential/non-essential
    list split Lucene ships as its default dynamic-pruning strategy) layered
    on block-max bounds:

      pass 0: per-query threshold T_q = k-th best single-term score of the
          query's highest-impact term — ONE decode job over the batch's
          star terms, grouped per query (a valid lower bound of each
          query's true k-th best total score).
      split (driver): order each query's terms by maxpart ascending; the
          largest prefix whose maxpart prefix-sum stays < T_q is the
          NON-ESSENTIAL set — a doc containing only those terms is bounded
          by that prefix sum and can never reach T_q.  Every true top-k doc
          therefore contains at least one ESSENTIAL term.
      pass 1 (candidate generation, essential terms only): (query, block)
          block-max pruning as a METADATA-only join — broadcast (query,
          term, termweight, rest, T_q) against the block stats columns;
          keep blocks with maxpart_block + rest >= T_q; decode the union
          of surviving blocks ONCE.  Candidates = their (query, docid)s.
      pass 2 (non-essential lookup): non-essential postings are needed only
          for candidate docs (the skip_to/lookup phase of MaxScore).  When
          the driver-side candidate estimate (sum of essential-term tfs) is
          small, only blocks whose [first_docid, last_docid] range contains
          a candidate are decoded; otherwise decode the non-essential
          blocks once — never a per-query decode.  Either way the scoring
          join runs postings->candidates on docid FIRST, so aggregate input
          is proportional to |candidates| x query terms, not postings x
          queries.

    Exactness: a doc skipped at candidate generation either has only
    non-essential terms (score < prefix-sum < T_q) or sat in a pruned
    essential block (score <= bound < T_q); every true top-k doc of q
    scores >= T_q, has all its blocks surviving, and all its non-essential
    postings looked up — so its score is complete, while partially-scored
    or skipped docs rank strictly below every true top-k member and can
    never displace one (same argument as wand_topk).

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
    # payload v2: no doclen stream in blocks — scoring joins the doclens
    # table back in, candidate-scoped (see wand_topk / blocks.py)
    v2 = "payload_v" in blocked.columns
    if v2 and doclens is None:
        raise ValueError("payload v2 blocked table requires doclens")
    dl = doclens.select("docid", "doclen") if v2 else None
    dl_lb = stats.doclen_lower_bound

    shape = None          # shared k1/b/len_factor/min_normlen constants
    qmeta = {}            # query -> (tws, maxparts, total)
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
        qmeta[qname] = (tws, maxparts, sum(maxparts.values()))
        t_star = max(tws, key=lambda t: (maxparts[t], t))
        star_rows.append((qname, t_star))
    if not qmeta:
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
    # Queries sharing a (star term, termweight) pair share a threshold, so
    # dedupe BEFORE the scan: a batch whose queries anchor on the same rare
    # term must not replicate that term's postings once per query.
    star_pairs: dict[tuple, list] = {}  # (term, tw) -> [query, ...]
    for qname, t in star_rows:
        tw = float(qmeta[qname][0][t].termweight)
        star_pairs.setdefault((t, tw), []).append(qname)
    star_tw = spark.createDataFrame(
        [(t, tw) for t, tw in star_pairs], "term string, tw double"
    )
    star_terms = sorted({t for t, _ in star_pairs})
    if postings is not None:
        # row postings available: the threshold scan stays JVM-side
        # (parquet predicate pushdown on term, no Python block decode)
        star_posts = postings.where(
            F.col("term").isin(star_terms)
        ).select("term", "wdf", "doclen")
    else:
        star_posts = unpack_blocks(
            blocked.where(F.col("term").isin(star_terms))
        )
        if v2:
            star_posts = star_posts.join(dl, "docid")
    wq = Window.partitionBy("term", "tw").orderBy(F.desc("s"))
    _diag = bool(os.environ.get("WAND_DIAG"))  # phase timing for perf work
    _t0 = time.perf_counter()
    kth = (
        star_posts.join(F.broadcast(star_tw), "term")
        .select(
            "term", "tw",
            _sumpart(F.col("tw"), F.col("wdf"), F.col("doclen")).alias("s"),
        )
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") == k)
        .select("term", "tw", F.col("s").alias("thr"))
        .collect()
    )
    thresholds = {}  # absent -> 0.0
    for r in kth:
        for qname in star_pairs[(r["term"], r["tw"])]:
            thresholds[qname] = r["thr"]
    if _diag:
        print("\nDIAG pass0_sec", round(time.perf_counter() - _t0, 2),
              "thr_min", round(min(thresholds.values(), default=0.0), 3),
              "thr_max", round(max(thresholds.values(), default=0.0), 3))
    _t0 = time.perf_counter()

    # -- split (driver): MaxScore essential / non-essential per query -------
    # Ascending-maxpart prefix whose sum stays < T_q is non-essential: docs
    # containing only those terms are bounded below T_q.  T_q = 0 (star
    # term has < k postings) makes every term essential — the degenerate
    # case falls back to pure block-max behavior.
    ess_rows = []         # (query, term, tw, rest, thr)  candidate gen
    non_rows = []         # (query, term, tw)             lookup scoring
    ess_terms = set()     # distinct essential terms across the batch
    for qname, (tws, maxparts, total) in qmeta.items():
        thr = float(thresholds.get(qname, 0.0))
        run, non_ess = 0.0, set()
        for t in sorted(tws, key=lambda t: (maxparts[t], t)):
            if len(non_ess) == len(tws) - 1:
                break  # at least one essential term always remains
            if run + maxparts[t] < thr:
                run += maxparts[t]
                non_ess.add(t)
            else:
                break
        for t, tw in tws.items():
            if t in non_ess:
                non_rows.append((qname, t, float(tw.termweight)))
            else:
                ess_rows.append(
                    (qname, t, float(tw.termweight),
                     float(total - maxparts[t]), thr)
                )
                ess_terms.add(t)
    # driver-side candidate-docset upper bound: the union of candidate
    # docids is at most the union of the DISTINCT essential terms' postings
    # (per-query sums would overcount shared anchor terms by the batch size)
    est_cands = sum(tstats[t].tf for t in ess_terms)

    qt_ess = spark.createDataFrame(
        ess_rows, "query string, term string, tw double, rest double, "
                  "thr double",
    )

    # -- pass 1: candidate generation over essential terms ------------------
    # metadata-only (query, block) block-max pruning, then ONE decode of the
    # union of surviving blocks
    meta = blocked.select("term", "first_docid", "wdf_max")
    surviving = (
        meta.join(F.broadcast(qt_ess), "term")
        .where(
            _maxpart(F.col("tw"), F.col("wdf_max")) + F.col("rest")
            >= F.col("thr")
        )
        .select("query", "term", "first_docid", "tw")
    ).persist()
    sel_blocks = surviving.select("term", "first_docid").distinct()
    posts = unpack_blocks_keyed(
        blocked.join(sel_blocks, ["term", "first_docid"], "left_semi")
    )
    if non_rows or v2:
        # posts feeds the per-query scoring join plus the candidate
        # docset (and, for v2, the doclen attach) — cache the (small,
        # selective-by-design) decoded essential postings rather than
        # their |queries|-times-larger scored join
        posts = posts.persist()
    docset = (
        posts.select("docid").distinct() if (non_rows or v2) else None
    )
    cand_dl = None
    if v2:
        # v2 doclen attach for the candidate docset only: the driver-side
        # bound est_cands gates broadcast vs shuffled equality join —
        # never an unbounded broadcast
        if est_cands <= max_broadcast_candidates:
            cand_dl = dl.join(F.broadcast(docset), "docid", "left_semi")
            sposts = posts.join(F.broadcast(cand_dl), "docid")
        else:
            sposts = posts.join(dl, "docid")
    else:
        sposts = posts
    ess_scored = sposts.join(surviving, ["term", "first_docid"]).select(
        "query", "docid",
        _sumpart(F.col("tw"), F.col("wdf"), F.col("doclen")).alias("part"),
    )

    scored_parts = [ess_scored]
    if non_rows:
        # The lookup key is the query-INDEPENDENT union of candidate docids,
        # not per-(query, docid) pairs: batches whose queries share anchor
        # terms would otherwise duplicate the same docids per query (and a
        # posting->pairs join would blow up by the sharing factor).  Joining
        # a doc's non-essential parts into a query it is NOT a candidate of
        # is harmless: that doc's computed score is bounded by the query's
        # non-essential prefix sum < T_q, so it ranks strictly below every
        # true top-k member (there are >= k docs scoring >= T_q whenever
        # T_q > 0, and T_q = 0 puts every term in the essential set).
        qt_non = spark.createDataFrame(
            non_rows, "query string, term string, tw double"
        )
        non_terms = sorted({t for _, t, _ in non_rows})
        non_blocked = blocked.where(F.col("term").isin(non_terms))
        if est_cands <= max_broadcast_candidates:
            # the skip_to analogue: decode only non-essential blocks whose
            # docid range contains a candidate (broadcast range semi-join
            # on block METADATA — pruned payloads are never read), then
            # keep candidate postings only
            non_blocked = non_blocked.alias("b").join(
                F.broadcast(docset.alias("c")),
                (F.col("c.docid") >= F.col("b.first_docid"))
                & (F.col("c.docid") <= F.col("b.last_docid")),
                "left_semi",
            )
            non_posts = unpack_blocks(non_blocked).join(
                F.broadcast(docset), "docid", "left_semi"
            )
        else:
            # driver estimate says the docset may be too big to broadcast:
            # shuffle semi-join on docid (hash-partitionable at any scale)
            non_posts = unpack_blocks(non_blocked).join(
                docset, "docid", "left_semi"
            )
        if v2:
            # every non_posts docid is in docset (semi-joined above), so
            # the candidate-scoped doclen slice covers it
            if cand_dl is not None:
                non_posts = non_posts.join(F.broadcast(cand_dl), "docid")
            else:
                non_posts = non_posts.join(dl, "docid")
        # candidate postings x the tiny (query, term, tw) broadcast:
        # aggregate input is proportional to |candidate docs| x query
        # terms, never postings x queries
        non_scored = non_posts.join(F.broadcast(qt_non), "term").select(
            "query", "docid",
            _sumpart(F.col("tw"), F.col("wdf"), F.col("doclen")).alias(
                "part"
            ),
        )
        scored_parts.append(non_scored)

    scored = (
        scored_parts[0] if len(scored_parts) == 1
        else scored_parts[0].unionByName(scored_parts[1])
    ).groupBy("query", "docid").agg(F.sum("part").alias("score"))
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("docid"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "rank", "docid", "score")
    )
    # Per-query top-k is bounded (|queries| * k rows): materialize it,
    # then explicitly free the persisted (query, block) survivors instead
    # of leaving them to ContextCleaner GC (see wand_topk).
    if _diag:
        print("\nDIAG ess_rows", len(ess_rows), "non_rows", len(non_rows),
              "est_cands", est_cands)
    out = out.localCheckpoint(eager=True)
    if _diag:
        print("\nDIAG main_job_sec", round(time.perf_counter() - _t0, 2))
    surviving.unpersist()
    if non_rows or v2:
        posts.unpersist()
    return out
