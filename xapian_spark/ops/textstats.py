"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Everything is a pure Catalyst column expression (no UDFs) so these run in
whole-stage codegen at 100 TB and are reproducible by an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[a-z0-9_]+"

# Tiny deterministic stopword profiles for language ID (heuristic n-gram /
# function-word approach; not a trained model — by design reproducible).
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "en", "un", "una"],
}


def _tokens(col: str):
    return F.expr(f"regexp_extract_all(lower({col}), '{_TOKEN_RE}', 0)")


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_unique_tokens) — whitespace/punct tokenizer."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


# GPT-2-style BPE pre-tokenizer (the public gpt2/cl100k pre-split regex
# family): contractions, letter runs, digit runs, punctuation runs — each
# optionally preceded by one space — plus whitespace runs.  Counting these
# pre-tokens is the standard cheap proxy for an LLM token budget (real BPE
# merges only ever split WITHIN a pre-token, so this is an upper-bound-ish
# estimate with the same scaling).  Java-regex syntax for Catalyst.
_BPE_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\\p{L}+"
    r"| ?\\p{N}+"
    r"| ?[^\\s\\p{L}\\p{N}]+"
    r"|\\s+"
)


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_bpe_tokens, n_ws_tokens): BPE-ish pre-token count (LLM token
    budget proxy; whitespace-only runs excluded from the count, as BPE
    folds leading spaces into the following token) alongside the plain
    whitespace split count.  Pure Catalyst — whole-stage codegen."""
    pre = F.expr(
        f"regexp_extract_all({text_col}, \"{_BPE_RE}\", 0)"
    )
    non_ws = F.filter(pre, lambda t: t.rlike(r"\S"))
    ws_toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(non_ws).cast("long").alias("n_bpe_tokens"),
        F.when(F.length(F.trim(F.col(text_col))) > 0, F.size(ws_toks))
        .otherwise(0)
        .cast("long")
        .alias("n_ws_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features (C4/Gopher-style cheap filters):

    (id, n_chars, n_tokens, mean_token_len, alpha_ratio, stopword_ratio,
    repetition_ratio)
    """
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", ""))
    sw = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_uniq = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.when(n_tok > 0, tok_chars.cast("double") / n_tok)
        .otherwise(0.0)
        .alias("mean_token_len"),
        F.when(n_chars > 0, alpha.cast("double") / n_chars)
        .otherwise(0.0)
        .alias("alpha_ratio"),
        F.when(n_tok > 0, n_stop.cast("double") / n_tok)
        .otherwise(0.0)
        .alias("stopword_ratio"),
        F.when(n_tok > 0, F.lit(1.0) - n_uniq.cast("double") / n_tok)
        .otherwise(0.0)
        .alias("repetition_ratio"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, lang_score): argmax of function-word hit-rate over
    LANG_PROFILES; 'und' when nothing matches.  Deterministic heuristic."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    cols = []
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        score = F.when(n_tok > 0, hits.cast("double") / n_tok).otherwise(0.0)
        cols.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*cols))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        best.getField("score").alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint): order-sensitive rolling document hash.

    fp = sum over positions of (md5-derived 28-bit token hash * position)
    mod (2^31 - 1).  Engine-portable: md5 + integer arithmetic only.
    """
    m = 2147483647  # 2^31 - 1
    toks = f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)"
    fp = F.expr(
        f"""
        CASE WHEN size({toks}) = 0 THEN cast(0 as bigint) ELSE
        aggregate(
          zip_with(
            {toks},
            sequence(1, size({toks})),
            (t, p) -> (cast(conv(substring(md5(t), 1, 7), 16, 10) as bigint) % {m}) * p
          ),
          cast(0 as bigint),
          (acc, v) -> (acc + v) % {m}
        ) END
        """
    )
    return df.select(F.col(id_col).alias("id"), fp.cast("long").alias("fingerprint"))
