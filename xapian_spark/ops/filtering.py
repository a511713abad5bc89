"""Composite document quality filter for training-data pipelines.

Not a reference operator; part of the Spark-era LLM-pipeline surface,
composing ops/textstats.py (cheap per-row signals) and ops/repetition.py
(n-gram repetition) into the standard C4/Gopher-style keep/reject verdict
with a named first-failing rule — the step that actually drops documents
from a pretraining mix, downstream of language ID, PII scrub and dedup.

Rules evaluate in a FIXED order and the first failure names the verdict,
so the reject histogram is stable across runs and re-orderings of the
input (the property needed to audit what a filter change did to a 100-TB
corpus).  Per-row signals stay in whole-stage codegen; the repetition
signals reuse repetition_stats' partial-aggregating explode, joined back
on the document key — the only shuffles are those aggregates.

Rule thresholds are keyword arguments with defaults tuned for
prose-like corpora; a document is kept iff every rule passes:

    too_short          n_tokens  < min_tokens
    too_long           n_tokens  > max_tokens
    mean_token_len     mean token length outside [min_mean_len,
                       max_mean_len]
    no_stopwords       stopword_ratio < min_stopword_ratio
    repetitive_2gram   top_2gram_frac > max_top_2gram_frac (rounded, as
                       repetition_stats reports it)
    repetitive_5gram   dup_5gram_frac > max_dup_5gram_frac (rounded)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.ops.repetition import repetition_stats
from xapian_spark.ops.textstats import quality_scores


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 30,
    max_tokens: int = 5000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopword_ratio: float = 0.01,
    max_top_2gram_frac: float = 0.18,
    max_dup_5gram_frac: float = 0.30,
) -> DataFrame:
    """(id, n_tokens, mean_token_len, stopword_ratio, top_2gram_frac,
    dup_5gram_frac, keep, reject_reason) — one row per document;
    reject_reason is 'keep' or the first failing rule's name."""
    q = quality_scores(df, id_col, text_col).select(
        "id", "n_tokens", "mean_token_len", "stopword_ratio"
    )
    # complete=False: token-less docs are absent from the aggregates and
    # their fracs coalesce to 0.0 here — saves the corpus-wide
    # completeness join inside repetition_stats (q already has every id).
    r = repetition_stats(df, id_col, text_col, complete=False).select(
        "id", "top_2gram_frac", "dup_5gram_frac"
    )
    j = q.join(r, "id", "left").select(
        "id", "n_tokens", "mean_token_len", "stopword_ratio",
        F.coalesce(F.col("top_2gram_frac"), F.lit(0.0)).alias("top_2gram_frac"),
        F.coalesce(F.col("dup_5gram_frac"), F.lit(0.0)).alias("dup_5gram_frac"),
    )
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(
            (F.col("mean_token_len") < min_mean_len)
            | (F.col("mean_token_len") > max_mean_len),
            F.lit("mean_token_len"),
        )
        .when(
            F.col("stopword_ratio") < min_stopword_ratio,
            F.lit("no_stopwords"),
        )
        .when(
            F.col("top_2gram_frac") > max_top_2gram_frac,
            F.lit("repetitive_2gram"),
        )
        .when(
            F.col("dup_5gram_frac") > max_dup_5gram_frac,
            F.lit("repetitive_5gram"),
        )
        .otherwise(F.lit("keep"))
    )
    return j.select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "top_2gram_frac",
        "dup_5gram_frac",
        reason.alias("reject_reason"),
        F.when(reason == "keep", F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("keep"),
    )
