"""Hashed TF-IDF document vectors (the feature-hashing trick).

Not a reference operator; part of the Spark-era LLM-pipeline surface.
The similarity/clustering ops (ops/similarity.py, ops/cluster.py) take an
embedding column as given; this module produces one from text alone —
fixed-dimension hashed TF-IDF vectors (Weinberger et al. 2009's hashing
trick, the HashingVectorizer construction) — so near-dup detection,
ANN search and clustering run on corpora that ship no model embeddings.

Construction, deterministic end-to-end (reproducible across runs,
partitionings and cluster sizes, like every op here):

    bucket(term) = md5-bucket(term) mod dim
    sign(term)   = +1 / -1 from an independent md5 ('s|' prefix) — the
                   signed-hashing unbiasing trick
    idf(term)    = ln((N + 1) / (df + 1))        (smoothed)
    weight(id, b) = sum over terms t in doc with bucket(t)=b of
                    sign(t) * tf(id, t) * idf(t),  rounded to 6dp

Scale shape: (id, term) tf counts and per-term document frequencies are
the same two partial-aggregating shuffles an index build pays; the df
side is |vocabulary|-sized and joins the postings on term; the final
(id, bucket) fold partial-aggregates into at most ``dim`` rows per doc.
N comes from one count() action on the input — a metadata-scale job.

Output is the exploded sparse form (id, bucket, weight) — the natural
shuffle-friendly layout; ``to_dense`` folds it to (id, vec) for the
cosine ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.ops.textstats import _tokens

_BUCKETS = 1 << 28  # 7 hex digits, the proven portable md5 bucket


def _md5_bucket(col, prefix: str):
    h = F.md5(F.concat(F.lit(prefix), col))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % _BUCKETS


def hashed_tfidf(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    signed: bool = True,
) -> DataFrame:
    """(id, bucket, weight): sparse hashed TF-IDF vectors, one row per
    non-zero bucket, weight rounded to 6dp.  Zero-token docs produce no
    rows (their vector is all-zero)."""
    n_docs = docs.count()
    post = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_tokens(text_col)).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = post.groupBy("term").agg(F.count("*").alias("df"))
    sign = (
        F.when((_md5_bucket(F.col("term"), "s|") % 2) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        if signed
        else F.lit(1.0)
    )
    weighted = post.join(df_, "term").select(
        "id",
        (_md5_bucket(F.col("term"), "b|") % dim).cast("int").alias("bucket"),
        (
            sign
            * F.col("tf").cast("double")
            * F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1))
        ).alias("w"),
    )
    return (
        weighted.groupBy("id", "bucket")
        .agg(F.round(F.sum("w"), 6).alias("weight"))
        .where(F.col("weight") != 0.0)
    )


def to_dense(
    sparse: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Fold (id, bucket, weight) to (id, vec_col: array<double>) — the
    input shape ops/similarity.py and ops/cluster.py consume."""
    pairs = sparse.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
    )
    return pairs.select("id", vec.alias(vec_col))
