"""Document clustering: deterministic Lloyd's k-means over an embedding
column — the Spark re-expression of the reference's result clustering
(`xapian-core/cluster/kmeans.cc` over cosine TF-IDF document vectors,
`cosine_sim.cc`).  Here the document vector is an `array<float>` column
(dense embeddings); the TF-IDF variant is the same plan with a vector
assembled from term weights.

Scale shape: centroids are tiny (k x dim) and BROADCAST; assignment is a
map-side argmin (no shuffle); the update step is one groupBy(cluster)
partial-aggregated mean.  Each iteration is exactly one shuffle of k
groups — at 10^9 rows the cost is the scan, not the clustering.

Determinism: centroids init from the k smallest ids (seeded workloads can
pre-shuffle ids); fixed iteration count; ties in argmin broken by lowest
cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
) -> DataFrame:
    """(id, cluster, dist) hard assignment after max_iter Lloyd's steps."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).persist()
    # deterministic init: the k lowest ids
    cents = [
        (i, [float(x) for x in r["vec"]])
        for i, r in enumerate(v.orderBy("id").limit(k).collect())
    ]
    spark = vectors.sparkSession

    def assign(cdf):
        j = v.crossJoin(F.broadcast(cdf))
        j = j.withColumn("dist", _sq_dist("vec", "cvec"))
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("cluster"))
        return (
            j.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("id", "cluster", "dist", "vec")
        )

    cdf = spark.createDataFrame(cents, "cluster int, cvec array<double>")
    assigned = None
    for _ in range(max_iter):
        assigned = assign(cdf)
        # update: per-cluster elementwise mean (one k-group shuffle)
        dim = len(cents[0][1])
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at(F.col("vec"), i + 1).cast("double")).alias(
                    f"s{i}"
                )
                for i in range(dim)
            ],
        )
        new_c = sums.select(
            "cluster",
            F.array(
                *[F.col(f"s{i}") / F.col("n") for i in range(dim)]
            ).alias("cvec"),
        )
        cdf = new_c
    out = assigned.select("id", "cluster", "dist")
    v.unpersist()
    return out
