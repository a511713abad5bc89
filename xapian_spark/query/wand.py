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

    Returns (docid, score), unordered; caller sorts/limits (the plan already
    ends in orderBy(score desc, docid).limit(k) = TakeOrderedAndProject).

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
        part = F.when(
            F.col("term") == t,
            tws[t].sumpart_expr(F.col("wdf"), F.col("doclen")),
        )
        sumpart = part if sumpart is None else sumpart.when(
            F.col("term") == t,
            tws[t].sumpart_expr(F.col("wdf"), F.col("doclen")),
        )
    sumpart = sumpart.otherwise(0.0)
    agg = post.groupBy("docid").agg(
        F.sum(sumpart).alias("_s"), F.max("doclen").alias("_dl")
    )
    extra = weight.sumextra_expr(F.col("_dl"), qlen, stats)
    return agg.select("docid", (F.col("_s") + extra).alias("score"))


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
