"""Differential property tests for the pipeline ops: the Spark (Catalyst
regexp / higher-order-function) implementations must agree with plain
Python models on randomized inputs.  This pins the Java-regex == Python-re
behavior the PII scrub's portability claim rests on, and the
shingle/line/gram bookkeeping of decontamination and repetition stats.

One Spark job per property (a single createDataFrame over all generated
cases) keeps the suite fast.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.decontam import decontaminate  # noqa: E402
from xapian_spark.ops.pii import REDACTIONS, pii_redact  # noqa: E402
from xapian_spark.ops.repetition import repetition_stats  # noqa: E402

# Text alphabet that can FORM the PII shapes (digits, @, dots, dashes,
# plus) so the generator actually exercises boundary behavior, not just
# clean prose.
_PII_ALPHABET = st.sampled_from(
    list("abcXYZ019 .@-+_\n") + ["@example.com", " 10.0.0.1 ", "+12345678901",
                                 " 415-555-0199 ", "sk-", "a" * 16]
)
_pii_text = st.lists(_PII_ALPHABET, min_size=0, max_size=30).map("".join)


def _py_redact(text: str) -> str:
    for pat, tag in REDACTIONS:
        text = re.sub(pat, tag, text)
    return text


@settings(max_examples=3, deadline=None, derandomize=True)
@given(st.lists(_pii_text, min_size=60, max_size=60))
def test_pii_redaction_matches_python_re(spark, rows):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["id", "text"]
    )
    got = {r.id: r.text_redacted for r in pii_redact(df, "id", "text").collect()}
    for i, raw in enumerate(rows):
        assert got[i] == _py_redact(raw), repr(raw)


_TOKEN_RE = re.compile(r"[a-z0-9_]+")
_word = st.sampled_from(["alpha", "beta", "gamma", "x1", "xx", "the", "of"])
_doc = st.lists(_word, min_size=0, max_size=25).map(" ".join)


def _py_grams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=3, deadline=None, derandomize=True)
@given(st.lists(_doc, min_size=40, max_size=40), st.lists(_doc, min_size=3, max_size=3))
def test_decontaminate_matches_python_model(spark, docs, bench):
    n = 4
    docs_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["docid", "text"]
    )
    bench_df = spark.createDataFrame([(t,) for t in bench], ["text"])
    got = {
        r.id: (r.n_ngrams, r.n_contaminated, r.contaminated)
        for r in decontaminate(
            docs_df, bench_df, "docid", "text", n=n
        ).collect()
    }
    bench_grams = set()
    for t in bench:
        bench_grams |= set(_py_grams(_TOKEN_RE.findall(t.lower()), n))
    for i, t in enumerate(docs):
        grams = set(_py_grams(_TOKEN_RE.findall(t.lower()), n))
        hits = len(grams & bench_grams)
        assert got[i] == (len(grams), hits, 1 if hits else 0), t


_line = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_ml_doc = st.lists(_line, min_size=0, max_size=8).map("\n".join)


def _py_repetition(text: str):
    toks = _TOKEN_RE.findall(text.lower())
    lines = [l for l in text.split("\n") if l != ""]
    lc = Counter(lines)
    n_lines = len(lines)
    d_lines = len(lc)
    chars = sum(len(l) * c for l, c in lc.items())
    dupchars = sum(len(l) * (c - 1) for l, c in lc.items())
    out = {
        "n_tokens": len(toks),
        "n_lines": n_lines,
        "dup_line_frac": round((n_lines - d_lines) / n_lines, 6) if n_lines else 0.0,
        "dup_line_char_frac": round(dupchars / chars, 6) if chars else 0.0,
    }
    for n in (2, 3, 4):
        g = Counter(_py_grams(toks, n))
        out[f"top_{n}gram_frac"] = (
            round(max(g.values()) * n / len(toks), 6) if g else 0.0
        )
    g5 = Counter(_py_grams(toks, 5))
    t5 = sum(g5.values())
    out["dup_5gram_frac"] = round((t5 - len(g5)) / t5, 6) if t5 else 0.0
    return out


@settings(max_examples=3, deadline=None, derandomize=True)
@given(st.lists(_ml_doc, min_size=40, max_size=40))
def test_repetition_stats_match_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["docid", "text"]
    )
    got = {r.id: r for r in repetition_stats(df, "docid", "text").collect()}
    for i, t in enumerate(docs):
        exp = _py_repetition(t)
        r = got[i]
        for k, v in exp.items():
            assert getattr(r, k) == v, (k, t)
