"""Within-document repetition statistics for quality filtering.

Not a reference operator; part of the Spark-era LLM-pipeline surface next
to ops/textstats.py.  Machine-generated and boilerplate-heavy pages are
dominated by internal repetition, and the standard pretraining quality
rules (the Gopher/MassiveText repetition filters, public) threshold on:

- duplicate-line fraction (and the character mass inside the duplicate
  copies),
- the token fraction covered by the single most frequent n-gram (n=2..4),
- the fraction of n-gram occurrences that are repeats (n=5).

Scale shape: one explode of (kind, gram) items per document feeds a
two-shuffle aggregation — (id, kind, gram) occurrence counts, then a
filtered-aggregate pivot straight to one row per document.  Both levels
partial-aggregate map-side (plain groupBy counts, no windows, no
Python), so the shuffle volume is the distinct-gram set, not the corpus.
Empty lines are dropped before counting so blank-line runs don't read as
duplication.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one tokenizer contract across the pipeline ops — ops/filtering.py mixes
# these gram fractions with textstats' per-row counts, which is only
# coherent if both modules split text identically
from xapian_spark.ops.textstats import _tokens as _toks


def _gram_list(toks: Column, n: int) -> Column:
    """ALL n-token shingles in order (occurrence-preserving, not distinct)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _tagged(kind: str, arr: Column) -> Column:
    return F.transform(
        arr,
        lambda g: F.struct(F.lit(kind).alias("kind"), g.alias("gram")),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = "\n",
    complete: bool = True,
) -> DataFrame:
    """One row per input document:

    (id, n_tokens, n_lines, dup_line_frac, dup_line_char_frac,
     top_2gram_frac, top_3gram_frac, top_4gram_frac, dup_5gram_frac)

    dup_line_frac        = 1 - distinct_lines / lines
    dup_line_char_frac   = chars in copies beyond a line's first
                           occurrence / total line chars
    top_ngram_frac (2-4) = max_count(n-gram) * n / n_tokens
    dup_5gram_frac       = 1 - distinct_5grams / total_5grams

    All fractions round(,6); documents with no tokens/lines report zeros.

    ``complete=False`` skips the completeness join back to ``df`` (one
    corpus-wide shuffle): item-less documents (no tokens AND no lines)
    are then absent from the result.  Use it when the caller left-joins
    these aggregates onto a per-doc frame it already has, as
    ops/filtering.py does.
    """
    toks = _toks(text_col)
    # line_sep is a LITERAL separator, but F.split takes a Java regex —
    # escape it so callers passing '.' or '|' get character splits, not
    # regex behavior.  re.escape's output (backslash before every
    # non-word char) is valid Java regex: escaping a non-alphanumeric
    # char always denotes that literal character there.
    lines = F.filter(
        F.split(F.col(text_col), re.escape(line_sep)),
        lambda l: l != F.lit(""),
    )
    items = F.concat(
        _tagged("line", lines),
        _tagged("g1", toks),
        _tagged("g2", _gram_list(toks, 2)),
        _tagged("g3", _gram_list(toks, 3)),
        _tagged("g4", _gram_list(toks, 4)),
        _tagged("g5", _gram_list(toks, 5)),
    )
    ex = df.select(F.col(id_col).alias("id"), F.explode(items).alias("it"))
    cnt = (
        ex.select("id", F.col("it.kind").alias("kind"),
                  F.col("it.gram").alias("gram"))
        .groupBy("id", "kind", "gram")
        .agg(F.count("*").alias("c"))
    )

    # Fold the per-(id, kind) summaries straight into the per-id pivot
    # with filtered aggregates — two shuffles total (occurrence counts,
    # then per-doc), both partial-aggregating map-side.
    def k(kind: str) -> Column:
        return F.col("kind") == kind

    def fsum(kind: str, expr: Column) -> Column:
        return F.sum(F.when(k(kind), expr).otherwise(F.lit(0)))

    stats = cnt.groupBy("id").agg(
        fsum("g1", F.col("c")).alias("n_tokens"),
        fsum("line", F.col("c")).alias("n_lines"),
        F.count(F.when(k("line"), True)).alias("d_lines"),
        fsum("line", F.length("gram") * F.col("c")).alias("line_chars"),
        fsum("line", F.length("gram") * (F.col("c") - 1)).alias("line_dupchars"),
        F.max(F.when(k("g2"), F.col("c"))).alias("max2"),
        F.max(F.when(k("g3"), F.col("c"))).alias("max3"),
        F.max(F.when(k("g4"), F.col("c"))).alias("max4"),
        fsum("g5", F.col("c")).alias("t5"),
        F.count(F.when(k("g5"), True)).alias("d5"),
    )
    if complete:
        out = df.select(F.col(id_col).alias("id")).join(stats, "id", "left")
    else:
        out = stats

    def z(c: str) -> Column:
        return F.coalesce(F.col(c), F.lit(0))

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        )

    ntok = z("n_tokens")
    return out.select(
        "id",
        ntok.cast("int").alias("n_tokens"),
        z("n_lines").cast("int").alias("n_lines"),
        frac(z("n_lines") - z("d_lines"), z("n_lines")).alias("dup_line_frac"),
        frac(z("line_dupchars"), z("line_chars")).alias("dup_line_char_frac"),
        frac(z("max2") * 2, ntok).alias("top_2gram_frac"),
        frac(z("max3") * 3, ntok).alias("top_3gram_frac"),
        frac(z("max4") * 4, ntok).alias("top_4gram_frac"),
        frac(z("t5") - z("d5"), z("t5")).alias("dup_5gram_frac"),
    )
