"""Benchmark decontamination for training-data pipelines.

Not a reference operator; part of the Spark-era LLM-pipeline surface next
to ops/dedup.py and ops/pii.py.  Before pretraining, the corpus is checked
for verbatim overlap with evaluation benchmarks (the standard n-gram
decontamination step: a document sharing any length-n token window with a
benchmark item is flagged / dropped so the eval set is not memorized).

Scale shape (the part that matters at 100 TB): the benchmark side is tiny
(benchmarks are megabytes), so its distinct n-grams BROADCAST — the corpus
is never shuffled for the match.  Per document, n-grams are built and
deduplicated row-locally with higher-order functions (no groupBy), then
exploded into a broadcast-hash join against the benchmark grams; only the
rare hit rows reach the final per-doc aggregation shuffle.  The total
n-gram count per document is a pure per-row expression, so the non-hit
99.9% of the corpus flows scan→project with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one tokenizer contract across the pipeline ops — composed results
# (e.g. ops/filtering.py mixing these grams with textstats counts) are
# only coherent if every module splits text identically
from xapian_spark.ops.textstats import _tokens as _toks


def _grams(toks: Column, n: int) -> Column:
    """Distinct n-token shingles of a token array (row-local)."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-grams over the whole benchmark set: one `gram` column."""
    return (
        bench.select(F.explode(_grams(_toks(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "docid",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    broadcast_hits: bool = True,
) -> DataFrame:
    """(id, n_ngrams, n_contaminated, contamination_frac, contaminated):
    per-document distinct n-gram count, how many of them appear in the
    benchmark set, their ratio, and a 0/1 flag (any overlap).  Every
    input document gets a row (clean docs report zeros).

    broadcast_hits gates the join strategy for attaching per-doc hit
    counts back onto the corpus.  The default (True) broadcasts the hit
    table — one row per CONTAMINATED doc — which is correct when
    contamination is rare (the normal web-corpus case: the clean bulk is
    then never shuffled).  On a benchmark-heavy or adversarial corpus
    where a large fraction of docs overlap the benchmark set (or where
    the benchmark set itself is huge), the hit table and the
    benchmark-gram table are unbounded and a forced broadcast can exceed
    executor memory — pass broadcast_hits=False there to use plain
    shuffled joins for both (hash-partitionable at any scale)."""
    grams = _grams(_toks(text_col), n)
    base = docs.select(
        F.col(id_col).alias("id"),
        grams.alias("grams"),
        F.size(grams).cast("int").alias("n_ngrams"),
    )
    bg = benchmark_ngrams(bench, bench_text_col, n)
    # broadcast_hits=False is the benchmark-heavy escape hatch: it must
    # de-broadcast BOTH small-side joins — the benchmark-gram table
    # scales with the benchmark set (not with hit rarity), so forcing it
    # into every executor is exactly what a huge benchmark set breaks
    hits = (
        base.select("id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bg) if broadcast_hits else bg, "gram")
        .groupBy("id")
        .agg(F.count("*").cast("int").alias("n_contaminated"))
    )
    # hits is one row per CONTAMINATED doc — rare by assumption when
    # broadcast_hits=True — so it broadcasts and the clean bulk of the
    # corpus is never shuffled; broadcast_hits=False is the safe fallback
    # for corpora where that rarity assumption does not hold.
    out = base.drop("grams").join(
        F.broadcast(hits) if broadcast_hits else hits, "id", "left"
    )
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return out.select(
        "id",
        "n_ngrams",
        n_hit.cast("int").alias("n_contaminated"),
        F.round(
            F.when(F.col("n_ngrams") > 0, n_hit / F.col("n_ngrams"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("contamination_frac"),
        F.when(n_hit > 0, F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("contaminated"),
    )
