"""Result diversification — GLS local search over the top-N MSet.

Re-expression of the reference's Diversify
(`xapian-core/diversify/diversify.cc:78-230`): cluster the MSet docs,
compute doc-centroid cosine similarities, then hill-climb swaps from the
union of each cluster's top-r docs (topC) minimizing

    score(dmset) = -lambda * sum(relevance)
                   + (1-lambda) * sum_c min_d 2*b*sigma^2/log(1+pos) * (1 - sim(d, c))

(`evaluate_dmset`, diversify.cc:136-160).

Scale shape: the MSet is by definition small (post-top-k), so the swap
loop is driver-side — exactly like the reference, which diversifies an
already-materialized MSet.  The distributed work is fetching the doc
vectors: one broadcast-semi-join against the embeddings table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_sim(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(x * x for x in b))
    if da == 0 or db == 0:
        return 0.0
    return num / (da * db)


def _kmeans_small(vecs: dict[int, list[float]], k: int, iters: int = 10):
    """Deterministic Lloyd's over a tiny point set (the MSet): centroids
    init from the k smallest docids (mirrors cluster.py's convention)."""
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]
    assign = {i: 0 for i in ids}
    for _ in range(iters):
        changed = False
        for i in ids:
            best, best_d = 0, float("inf")
            for c, cent in enumerate(cents):
                d = sum((x - y) ** 2 for x, y in zip(vecs[i], cent))
                if d < best_d - 1e-15:
                    best, best_d = c, d
            if assign[i] != best:
                assign[i] = best
                changed = True
        for c in range(k):
            members = [vecs[i] for i in ids if assign[i] == c]
            if members:
                dim = len(members[0])
                cents[c] = [
                    sum(m[j] for m in members) / len(members)
                    for j in range(dim)
                ]
        if not changed:
            break
    return assign, cents


def diversify_mset(
    mset_rows: list[tuple[int, float]],
    vectors: dict[int, list[float]],
    k: int = 10,
    r: int = 2,
    lambda_: float = 0.5,
    b: float = 5.0,
    sigma_sqr: float = 1e-3,
) -> list[int]:
    """Driver-side GLS (diversify.cc:161-230). mset_rows: (docid, score)
    in rank order; vectors: docid -> dense vector.  Returns the diversified
    docid list of length min(k, |mset|) — EXCEPT when k == 0 or
    |mset| <= 2, where (like the reference, diversify.cc:162-170) the
    whole mset passes through undiversified."""
    if k == 0 or len(mset_rows) <= 2:
        return [d for d, _ in mset_rows]
    k_ = min(k, len(mset_rows))
    scores = dict(mset_rows)
    ids = [d for d, _ in mset_rows]
    vecs = {d: vectors.get(d, []) for d in ids}
    dim = max((len(v) for v in vecs.values()), default=0)
    for d, v in vecs.items():
        if len(v) < dim:
            vecs[d] = list(v) + [0.0] * (dim - len(v))

    assign, cents = _kmeans_small(vecs, k_)
    sim = {
        (d, c): _cosine_sim(vecs[d], cent)
        for d in ids
        for c, cent in enumerate(cents)
    }

    # topC: union of each cluster's top-r docs by relevance rank
    topc: list[int] = []
    for c in range(k_):
        members = [d for d in ids if assign[d] == c]  # ids are rank-ordered
        topc.extend(members[:r])

    def evaluate(dmset: list[int]) -> float:
        s1 = sum(scores[d] for d in dmset)
        s2 = 0.0
        for c in range(k_):
            best = float("inf")
            for pos, d in enumerate(dmset, start=1):
                w = 2 * b * sigma_sqr / math.log(1 + pos) * (1 - sim[(d, c)])
                best = min(best, w)
            s2 += best
        return -lambda_ * s1 + (1 - lambda_) * s2

    main_dmset = ids[:k_]
    curr = list(main_dmset)
    while True:
        improved = False
        for i in range(len(main_dmset)):
            best_score = evaluate(curr)
            best_doc = curr[i]
            found = False
            for cand in topc:
                if cand in curr:
                    continue
                old = curr[i]
                curr[i] = cand
                sc = evaluate(curr)
                if sc < best_score:
                    best_doc, best_score = cand, sc
                    found = True
                curr[i] = old
            if found:
                curr[i] = best_doc
                improved = True
        if not improved:
            break
    return curr


def _fetch_mset_vectors(mset, embeddings, id_col, vec_col):
    """Collect the ranked (docid, score) MSet and fetch its doc vectors
    with a broadcast semi-join (the MSet is tiny, post-top-k).  Shared by
    diversify() and mmr_rerank()."""
    rows = mset.orderBy(F.desc("score"), F.asc("docid")).collect()
    mset_rows = [(r_["docid"], r_["score"]) for r_ in rows]
    ids = [d for d, _ in mset_rows]
    spark = mset.sparkSession
    id_df = spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
    vec_rows = embeddings.join(
        F.broadcast(id_df), id_col
    ).select(id_col, vec_col).collect()
    return mset_rows, {r_[id_col]: list(r_[vec_col]) for r_ in vec_rows}


def diversify(
    mset: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    r: int = 2,
    lambda_: float = 0.5,
    b: float = 5.0,
    sigma_sqr: float = 1e-3,
    id_col: str = "docid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified (rank, docid) from an MSet DataFrame (docid, score) and
    an embeddings table.  The vector fetch is a broadcast semi-join (the
    MSet is tiny); the GLS swap loop is driver-side like the reference."""
    mset_rows, vectors = _fetch_mset_vectors(mset, embeddings, id_col, vec_col)
    spark = mset.sparkSession
    out = diversify_mset(
        mset_rows, vectors, k=k, r=r, lambda_=lambda_, b=b,
        sigma_sqr=sigma_sqr,
    )
    return spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(out)], "rank int, docid long"
    )


def mmr_select(
    mset_rows: list[tuple[int, float]],
    vectors: dict[int, list[float]],
    k: int = 5,
    lambda_: float = 0.5,
) -> list[int]:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998, public):
    greedy re-selection of k docs from a ranked MSet trading relevance
    against similarity to the already-selected set,

        pick argmax_d  lambda * score(d)
                       - (1-lambda) * max_{s in S} cos_sim(d, s)

    ties broken by original rank.  The first pick is rank 1 (empty S has
    max-sim 0, so the objective reduces to relevance).  Unlike the GLS
    hill-climb above, the construction is ROUND-BOUNDED (exactly k greedy
    rounds), so a SQL oracle can replay it as chained CTEs."""
    if not mset_rows:
        return []
    ids = [d for d, _ in mset_rows]
    scores = dict(mset_rows)
    rank = {d: i for i, d in enumerate(ids)}
    k_ = min(k, len(ids))
    selected: list[int] = []
    remaining = list(ids)
    for _ in range(k_):
        best, best_obj = None, None
        for d in remaining:
            # missing vector == zero vector (sim 0 to everything), like
            # diversify_mset's tolerant fetch — a doc without an
            # embedding row still ranks, on pure relevance
            max_sim = max(
                (
                    _cosine_sim(vectors.get(d, []), vectors.get(s, []))
                    for s in selected
                ),
                default=0.0,
            )
            obj = lambda_ * scores[d] - (1 - lambda_) * max_sim
            if best is None or obj > best_obj or (
                obj == best_obj and rank[d] < rank[best]
            ):
                best, best_obj = d, obj
        selected.append(best)
        remaining.remove(best)
    return selected


def mmr_rerank(
    mset: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    lambda_: float = 0.5,
    id_col: str = "docid",
    vec_col: str = "embedding",
) -> DataFrame:
    """(docid, score, mmr_rank) for the k MMR-selected docs of an MSet
    DataFrame (docid, score).  Vector fetch = broadcast semi-join against
    the embeddings table (the MSet is tiny, post-top-k); the k greedy
    rounds run driver-side exactly like the reference's own MSet-local
    diversifier."""
    mset_rows, vectors = _fetch_mset_vectors(mset, embeddings, id_col, vec_col)
    spark = mset.sparkSession
    order = mmr_select(mset_rows, vectors, k=k, lambda_=lambda_)
    scores = dict(mset_rows)
    return spark.createDataFrame(
        [(d, scores[d], i + 1) for i, d in enumerate(order)],
        "docid long, score double, mmr_rank int",
    )
