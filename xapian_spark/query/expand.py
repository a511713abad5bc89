"""Spelling suggestion, Bo1 query expansion (ESet), percent scores.

- Spelling: trigram-blocked candidate generation + edit-distance ranking,
  the glass spelling design (`xapian-core/backends/glass/glass_spelling.h:
  38-144`: trigram fragments -> words; `Database::get_spelling_suggestion`
  picks min edit distance, ties by frequency).
- Bo1 ESet: `xapian-core/expand/bo1eweight.cc:33-43`:
      m  = cf / N
      wt = rcf * log2((1+m)/m) + log2(1+m)
  over the terms of a relevance set (Enquire::get_eset, enquire.h:500-520);
  rcf = collection frequency within the RSet.
- Percent: relative percentage of the best attained weight (the reference
  scales by the maximum POSSIBLE weight, mset.cc:253-271 — documented
  divergence: we use the attained max, which needs no bound computation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xapian_spark.index.builder import InvertedIndex


# -- spelling ---------------------------------------------------------------


def build_spelling_table(
    index: InvertedIndex, extra_terms: DataFrame | None = None
) -> DataFrame:
    """(trigram, term, tf) dimension table from the term dictionary.

    Padded character trigrams: 'word' -> ['$wo','wor','ord','rd$'] — the
    glass head/tail/middle fragment classes simplified to uniform padding.
    `extra_terms` (term, tf) adds explicit WritableDatabase::add_spelling
    entries that aren't index terms."""
    t = index.term_stats.select("term", "tf")
    if extra_terms is not None:
        t = t.unionByName(extra_terms.select("term", "tf"))
    padded = F.concat(F.lit("$"), F.col("term"), F.lit("$"))
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(padded) - 2, F.lit(1))),
        lambda i: padded.substr(i, F.lit(3)),
    )
    return (
        t.withColumn("trigram", F.explode(tri))
        .where(F.length("trigram") == 3)
        .select("trigram", "term", "tf")
        .distinct()
    )


def suggest_spelling(
    index: InvertedIndex,
    word: str,
    max_edit: int = 2,
    spelling: DataFrame | None = None,
    extra_terms: DataFrame | None = None,
) -> str | None:
    """Best correction for `word`, or None (word in dictionary or no
    candidate within max_edit).  Ranking: min edit distance, then highest
    term frequency, then term string (deterministic)."""
    word = word.lower()
    ts = index.collect_term_stats([word]).get(word)
    if ts is not None and ts.tf > 0:
        return None  # already a dictionary word
    if extra_terms is not None and extra_terms.where(
        (F.col("term") == word) & (F.col("tf") > 0)
    ).first() is not None:
        return None  # explicitly added spelling entry
    sp = (
        spelling
        if spelling is not None
        else build_spelling_table(index, extra_terms=extra_terms)
    )
    padded = f"${word}$"
    tris = [padded[i : i + 3] for i in range(max(1, len(padded) - 2))]
    tris = [t for t in tris if len(t) == 3]

    # Transposition-aware distance (editdistance.cc, same contract as the
    # fuzzy expansion): JVM levenshtein <= 2k prefilter, exact OSA ranking
    # in an Arrow-batched UDF over the few trigram-blocked candidates.
    from xapian_spark.text.editdistance import osa_distance

    def _osa(terms: pd.Series) -> pd.Series:
        return pd.Series([osa_distance(t, word) for t in terms])

    osa_udf = F.pandas_udf(_osa, T.IntegerType())
    cand = (
        sp.where(F.col("trigram").isin(tris))
        .select("term", "tf")
        .distinct()
        .where(F.abs(F.length("term") - F.lit(len(word))) <= max_edit)
        .where(F.levenshtein(F.col("term"), F.lit(word)) <= 2 * max_edit)
        .withColumn("dist", osa_udf(F.col("term")))
        .where(F.col("dist") <= max_edit)
        .orderBy(F.asc("dist"), F.desc("tf"), F.asc("term"))
        .limit(1)
        .collect()
    )
    return cand[0]["term"] if cand else None


# -- Bo1 expansion (ESet) ----------------------------------------------------


class ExpandDeciderFilterPrefix:
    """xapian::ExpandDeciderFilterPrefix (expanddecider.h): rejects
    candidate expansion terms carrying a given prefix."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def __call__(self, term: str) -> bool:
        return not term.startswith(self.prefix)


def _apply_expand_filters(rterms: DataFrame, exclude_terms, decider):
    """Shared candidate filtering for the ESet schemes: query-term
    exclusion + ExpandDecider (expanddecider.h) — a SQL boolean over
    `term` (JVM-side) or a Python callable term -> bool run as an
    Arrow-batched UDF over the (small) RSet-derived candidate set."""
    if exclude_terms:
        rterms = rterms.where(~F.col("term").isin(list(exclude_terms)))
    if decider is not None:
        if isinstance(decider, str):
            rterms = rterms.where(F.expr(decider))
        else:
            def _dec(terms: pd.Series) -> pd.Series:
                return pd.Series([bool(decider(t)) for t in terms])

            dec_udf = F.pandas_udf(_dec, T.BooleanType())
            rterms = rterms.where(dec_udf(F.col("term")))
    return rterms


def bo1_eset(
    index: InvertedIndex,
    rset_docids: list[int],
    k: int = 20,
    exclude_terms: set[str] | frozenset[str] = frozenset(),
    decider=None,
) -> DataFrame:
    """Top-k expansion terms for a relevance set: (term, wt).

    rcf = sum of wdf over the RSet docs per term (the OrTermList merge of
    the reference, expand/ortermlist.cc); scored with Bo1.  All JVM-side:
    a semi-join on the (small, broadcast) RSet + one groupBy + the closed-
    form weight expression.
    """
    spark = index.spark
    rset = spark.createDataFrame([(int(d),) for d in rset_docids], "docid long")
    rterms = (
        index.postings.join(F.broadcast(rset), "docid", "left_semi")
        .where(F.col("wdf") > 0)
        .groupBy("term")
        .agg(F.sum("wdf").cast("double").alias("rcf"))
    )
    rterms = _apply_expand_filters(rterms, exclude_terms, decider)
    n = float(index.stats.doccount)
    joined = rterms.join(index.term_stats.select("term", "cf"), "term")
    m = F.col("cf").cast("double") / F.lit(n)
    log2 = float(__import__("math").log(2.0))
    wt = (
        F.col("rcf") * (F.log((1.0 + m) / m) / F.lit(log2))
        + (F.log(1.0 + m) / F.lit(log2))
    )
    out = joined.select("term", wt.alias("wt")).orderBy(
        F.desc("wt"), F.asc("term")
    )
    return out.limit(k) if k is not None else out


def trad_eset(
    index: InvertedIndex,
    rset_docids: list[int],
    k: int = 20,
    expand_k: float = 1.0,
    exclude_terms: set[str] | frozenset[str] = frozenset(),
    decider=None,
) -> DataFrame:
    """TradEWeight expansion (Enquire::set_expansion_scheme("trad", k);
    expand/tradeweight.cc:31-40, stats accumulation expandweight.h:50-72):

        multiplier = sum over RSet docs with the term of
                     (k+1) * wdf / (k * doclen/avlen + wdf)   (wdf 0 -> 1)
        tw = log( (r+0.5) (N - tf - (R-r) + 0.5)
                  / ((tf-r+0.5) (R-r+0.5)) )
        weight = multiplier * tw

    where r = RSet docs containing the term, R = |RSet|, N = doccount,
    tf = whole-db termfreq.  Same one-pass shape as bo1_eset: broadcast
    semi-join + groupBy + closed-form expression.
    """
    spark = index.spark
    rset = spark.createDataFrame([(int(d),) for d in rset_docids], "docid long")
    avlen = index.stats.total_doclen / max(index.stats.doccount, 1)
    wdf1 = F.greatest(F.col("wdf").cast("double"), F.lit(1.0))
    mult = (
        F.lit(expand_k + 1.0) * wdf1
        / (F.lit(expand_k) * F.col("doclen").cast("double") / F.lit(avlen) + wdf1)
    )
    rterms = (
        index.postings.join(F.broadcast(rset), "docid", "left_semi")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("r"),
            F.sum(mult).alias("multiplier"),
        )
    )
    rterms = _apply_expand_filters(rterms, exclude_terms, decider)
    n = float(index.stats.doccount)
    rsize = float(len(rset_docids))
    joined = rterms.join(index.term_stats.select("term", "tf"), "term")
    tf = F.col("tf").cast("double")
    without = F.lit(rsize) - F.col("r")
    tw = F.log(
        (F.col("r") + 0.5) * (F.lit(n) - tf - without + 0.5)
        / ((tf - F.col("r") + 0.5) * (without + 0.5))
    )
    out = joined.select(
        "term", (F.col("multiplier") * tw).alias("wt")
    ).orderBy(F.desc("wt"), F.asc("term"))
    return out.limit(k) if k is not None else out


# -- percent scores ----------------------------------------------------------


def with_percent(mset: DataFrame, score_col: str = "score") -> DataFrame:
    """Add a percent column relative to the best attained score:
    greatest(1, round(100 * score / max_score)) for positive scores."""
    w = Window.partitionBy()
    mx = F.max(F.col(score_col)).over(w)
    pct = F.when(
        (F.col(score_col) > 0) & (mx > 0),
        F.greatest(
            F.lit(1),
            F.round(F.lit(100.0) * F.col(score_col) / mx).cast("int"),
        ),
    ).otherwise(F.lit(0))
    return mset.withColumn("percent", pct)
