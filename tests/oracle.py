"""Pure-Python brute-force oracle: an independent implementation of indexing
and BM25 used only to validate the Spark engine (no Spark, no shared code
paths except the tokenizer, which has its own golden tests).

BM25 formulas transcribed independently from
`xapian-core/weight/bm25weight.cc` and `docs/bm25.rst:65-88`.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from xapian_spark.text.tokenizer import tokenize_with_positions


class BruteForceIndex:
    def __init__(self, docs: dict[int, str], mode: str = "xapian",
                 bool_terms: dict[int, list[str]] | None = None):
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[tuple[str, int], list[int]] = {}
        self.doclen: dict[int, int] = {}
        for docid, text in docs.items():
            toks = tokenize_with_positions(text, mode=mode)
            cnt = Counter(t for t, _ in toks)
            for t, c in cnt.items():
                self.postings[t][docid] = c
            for t, p in toks:
                self.positions.setdefault((t, docid), []).append(p)
            self.doclen[docid] = sum(cnt.values())
        if bool_terms:
            for docid, terms in bool_terms.items():
                for t in set(terms):
                    self.postings[t].setdefault(docid, 0)
        self.N = len(docs)
        self.total_len = sum(self.doclen.values())
        self.avg_len = self.total_len / self.N if self.N else 0.0

    def termweight(self, term: str, wqf: int = 1, k1: float = 1.0,
                   k3: float = 1.0) -> float:
        tf = len(self.postings.get(term, {}))
        if tf == 0:
            return 0.0
        tw = (self.N - tf + 0.5) / (tf + 0.5)
        if tw < 2:
            tw = tw * 0.5 + 1
        w = math.log(tw)
        if k3 != 0:
            w *= (k3 + 1) * wqf / (k3 + wqf)
        w *= k1 + 1
        return w

    def bm25_scores(self, terms: list[str], k1: float = 1.0, b: float = 0.5,
                    k3: float = 1.0, min_normlen: float = 0.5,
                    op: str = "or") -> dict[int, float]:
        """Per-doc summed sumparts for an OR/AND of terms (wqf from term
        multiplicity in `terms`)."""
        wqf = Counter(terms)
        uniq = list(dict.fromkeys(terms))
        len_factor = 1.0 / self.avg_len if self.avg_len else 0.0
        scores: dict[int, float] = defaultdict(float)
        matched: dict[int, set] = defaultdict(set)
        for t in uniq:
            tw = self.termweight(t, wqf=wqf[t], k1=k1, k3=k3)
            for docid, wdf in self.postings.get(t, {}).items():
                normlen = max(self.doclen[docid] * len_factor, min_normlen)
                denom = k1 * (normlen * b + (1 - b)) + wdf
                scores[docid] += tw * (wdf / denom)
                matched[docid].add(t)
        if op == "and":
            scores = {
                d: s for d, s in scores.items() if len(matched[d]) == len(uniq)
            }
        return dict(scores)

    def topk(self, terms: list[str], k: int = 10, op: str = "or",
             **kw) -> list[tuple[int, float]]:
        scores = self.bm25_scores(terms, op=op, **kw)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
