"""Document clustering: deterministic Lloyd's k-means over an embedding
column — the Spark re-expression of the reference's result clustering
(`xapian-core/cluster/kmeans.cc` over cosine TF-IDF document vectors,
`cosine_sim.cc`).  Here the document vector is an `array<float>` column
(dense embeddings); the TF-IDF variant is the same plan with a vector
assembled from term weights.

Scale shape (per Lloyd iteration, exactly one Spark job):
- centroids are tiny (k x dim doubles) and live on the DRIVER between
  iterations; they enter each job as a broadcast closure constant, so the
  plan lineage stays FLAT — iteration N never re-derives iteration N-1's
  assignments (a lazy centroid DataFrame chained across iterations makes
  the plan, and the work, grow exponentially with max_iter).
- assignment is a map-side argmin: an Arrow-batched kernel does the
  (batch x dim) @ (dim x k) distance matrix in NumPy — no per-row Python,
  no crossJoin, no shuffle of the corpus.
- the update step shuffles only k groups of per-dimension partial sums
  (map-side combined), then k x dim doubles are collected to the driver.
  At 10^9 rows the cost is the scan, not the clustering.

Determinism: centroids init from the k smallest ids; fixed max iteration
count with exact-convergence early exit; argmin ties broken by lowest
cluster id (np.argmin takes the first minimum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
) -> DataFrame:
    """(id, cluster, dist) hard assignment after <= max_iter Lloyd's steps
    (early exit on exact centroid convergence)."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).persist()
    # deterministic init: the k lowest ids
    init_rows = v.orderBy("id").limit(k).collect()
    cents = np.array([[float(x) for x in r["vec"]] for r in init_rows])
    k = len(cents)  # corpus smaller than k: cluster what exists
    dim = cents.shape[1]

    def assigned_df(cents_arr: np.ndarray) -> DataFrame:
        """v + (cluster, dist) via a map-side NumPy argmin; cents_arr is
        captured by value into the task closure (k x dim — tiny)."""
        c = cents_arr.copy()
        c_sq = (c * c).sum(axis=1)  # (k,)

        @F.pandas_udf(
            T.StructType(
                [
                    T.StructField("cluster", T.IntegerType()),
                    T.StructField("dist", T.DoubleType()),
                ]
            )
        )
        def nearest(vecs: pd.Series) -> pd.DataFrame:
            m = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2  (argmin drops ||x||^2)
            cross = m @ c.T  # (n, k)
            d_part = c_sq[None, :] - 2.0 * cross
            cl = np.argmin(d_part, axis=1)
            d = d_part[np.arange(len(cl)), cl] + (m * m).sum(axis=1)
            return pd.DataFrame(
                {"cluster": cl.astype(np.int32), "dist": np.maximum(d, 0.0)}
            )

        a = v.withColumn("_nc", nearest("vec"))
        return a.select(
            "id", "vec", F.col("_nc.cluster").alias("cluster"),
            F.col("_nc.dist").alias("dist"),
        )

    for _ in range(max_iter):
        a = assigned_df(cents)
        # update: per-cluster elementwise mean — one k-group shuffle of
        # partial per-dimension sums, k x (dim+1) doubles to the driver
        sums = a.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at(F.col("vec"), i + 1).cast("double")).alias(
                    f"s{i}"
                )
                for i in range(dim)
            ],
        )
        new_cents = cents.copy()  # empty cluster keeps its old centroid
        for r in sums.collect():
            new_cents[r["cluster"]] = [
                r[f"s{i}"] / r["n"] for i in range(dim)
            ]
        if np.array_equal(new_cents, cents):
            break
        cents = new_cents

    out = assigned_df(cents).select("id", "cluster", "dist")
    v.unpersist()
    return out


def lcd_cluster(
    mset: DataFrame,
    k: int,
    id_col: str = "docid",
    weight_col: str = "score",
    vec_col: str = "vec",
) -> DataFrame:
    """LCD clustering of a ranked result set (`cluster/lcd_clusterer.cc:
    64-154`): greedy equal-size partition for result diversification.

    Semantics preserved from the reference:
    - k_ = min(k, size); cluster sizes split so that the FIRST
      ``n = k_ - size % k_`` clusters get ``x - 1`` points and the rest
      ``x = size // k_ + 1`` (lcd_clusterer.cc:96-101).
    - The first cluster center is the highest-weight result; each round
      takes the ``num_points - 1`` NEAREST remaining points by cosine
      distance ``1 - ip / sqrt(|a||b|)`` (cosine_sim.cc:40-61, including
      the zero-magnitude -> 0.0 quirk, which sorts such points nearest),
      then the FARTHEST remaining point becomes the next center.
    - Cluster ids are 1-based construction order, so cluster 1 always
      contains the top result.

    Divergence: std::sort on equal distances is unspecified in the
    reference; here ties keep descending-weight order (deterministic).

    Scale shape: like the reference, this runs over an MSet — a top-k
    RESULT page, not the corpus — so the greedy O(size^2) loop happens
    driver-side in NumPy on k-bounded collected rows (same pattern as
    ops/diversify.py's GLS re-rank).  Corpus-scale clustering is kmeans()
    above; LCD is a post-retrieval diversification step.

    Returns (id_col, weight_col, cluster).
    """
    if k <= 0:
        raise ValueError("k must be > 0 (lcd_clusterer.cc:52-55)")
    rows = mset.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
        F.col(vec_col).alias("vec"),
    ).orderBy(F.desc("weight"), F.asc("id")).collect()
    size = len(rows)
    spark = mset.sparkSession
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(weight_col, T.DoubleType()),
            T.StructField("cluster", T.IntegerType()),
        ]
    )
    if size == 0:
        return spark.createDataFrame([], out_schema)

    ids = [r["id"] for r in rows]
    weights = [r["weight"] for r in rows]
    vecs = np.array([[float(x) for x in r["vec"]] for r in rows], np.float64)
    mags = (vecs * vecs).sum(axis=1)  # Point::get_magnitude (squared norm)

    k_ = min(k, size)
    n_small = k_ - size % k_
    x = size // k_ + 1

    remaining = list(range(size))  # descending-weight order
    center = remaining[0]
    assign = {}
    for cnum in range(1, k_ + 1):
        num_points = (x - 1) if cnum <= n_small else x
        others = [i for i in remaining if i != center]
        if others:
            ip = vecs[others] @ vecs[center]
            denom = np.sqrt(mags[others] * mags[center])
            with np.errstate(divide="ignore", invalid="ignore"):
                dist = np.where(denom > 0.0, 1.0 - ip / denom, 0.0)
            # stable sort keeps descending-weight order on distance ties
            order = np.argsort(dist, kind="stable")
        else:
            order = np.array([], np.int64)
        take = [others[j] for j in order[: num_points - 1]]
        for i in take:
            assign[ids[i]] = cnum
        assign[ids[center]] = cnum
        if cnum == k_:
            break
        taken = set(take) | {center}
        remaining = [i for i in remaining if i not in taken]
        # farthest remaining point from the departing center
        center = others[order[-1]]

    return spark.createDataFrame(
        [(ids[i], weights[i], assign[ids[i]]) for i in range(size)],
        out_schema,
    )
