"""Per-stratum corpus mix report for training-data construction.

Not a reference operator; part of the Spark-era LLM-pipeline surface.
Before fixing per-stratum sampling rates (ops/sampling.py), a mix is
designed from exactly this table: per language/domain/source stratum, how
many documents and tokens exist, and how much of each survives the
quality filter (ops/filtering.py) — i.e. the actual token budget each
stratum can contribute.

Scale shape: quality_filter's aggregates (its own two shuffles) followed
by one stratum-keyed groupBy over per-doc rows — stratum cardinality is
tiny (languages/domains), so the final aggregate collapses map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.ops.filtering import quality_filter


def mix_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str = "lang",
    **filter_kwargs,
) -> DataFrame:
    """(stratum, n_docs, n_kept, kept_frac, total_tokens, kept_tokens,
    mean_tokens): one row per stratum; kept/kept_tokens under the
    quality_filter verdict (thresholds forwarded via kwargs)."""
    verdicts = quality_filter(docs, id_col, text_col, **filter_kwargs)
    joined = verdicts.join(
        docs.select(F.col(id_col).alias("id"),
                    F.col(stratum_col).alias("stratum")),
        "id",
    )
    return joined.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.round(F.sum("keep") / F.count("*"), 6).alias("kept_frac"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("n_tokens") * F.col("keep")).cast("long")
        .alias("kept_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
    )
