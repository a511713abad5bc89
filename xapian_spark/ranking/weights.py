"""Weight schemes as Spark column-expression factories.

Mirrors the reference plug-in surface (`xapian-core/include/xapian/weight.h`):
``init(factor)`` precomputes per-term constants on the DRIVER from collected
stats (the reference does the same once per query), then ``sumpart_expr``
emits a pure Catalyst column expression over ``(wdf, doclen)`` — JVM-side,
whole-stage-codegen, no UDF in the scoring hot path.

BM25Weight follows `xapian-core/weight/bm25weight.cc:46-238` exactly:

- defaults k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5 (`weight.h:897-907`)
- idf: ``tw = (N - tf + 0.5) / (tf + 0.5)``; if ``tw < 2``: ``tw = tw*0.5+1``;
  ``termweight = log(tw) * factor``; ``*= (k3+1)*wqf/(k3+wqf)`` when k3!=0;
  ``*= (k1+1)`` (bm25weight.cc:76-117)
- ``len_factor = 0`` if k2==0 and (b==0 or k1==0), else ``1/avg_len``
  (bm25weight.cc:119-128)
- sumpart: ``normlen = max(doclen*len_factor, min_normlen)``;
  ``termweight * wdf / (k1*(normlen*b + (1-b)) + wdf)`` (bm25weight.cc:170-181)
- maxpart (block-max bound): evaluated at wdf_max with
  ``normlen_lb = max(max(wdf_max, doclen_lb)*len_factor, min_normlen)``
  (bm25weight.cc:183-208, citing Macdonald/Tonellotto/Ounis TOIS 29(4))
- sumextra: ``2*k2*qlen / (1 + normlen)`` (bm25weight.cc:210-238)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GlobalStats:
    """Collection-wide statistics (reference: glass_version.h:127-273)."""

    doccount: int
    total_doclen: int
    doclen_lower_bound: int
    doclen_upper_bound: int

    @property
    def average_length(self) -> float:
        if self.doccount == 0:
            return 0.0
        return self.total_doclen / self.doccount


@dataclass(frozen=True)
class TermStats:
    """Per-term statistics: termfreq, collection freq, max wdf."""

    term: str
    tf: int
    cf: int
    wdf_max: int


class Weight:
    """Base: subclasses set per-term constants in init_term()."""

    name = "base"

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> "TermWeight":
        raise NotImplementedError

    def sumextra_expr(self, doclen: Column, query_length: int) -> Column:
        return F.lit(0.0)

    def maxextra(self, stats: GlobalStats, query_length: int) -> float:
        return 0.0


@dataclass(frozen=True)
class TermWeight:
    """Per-(query-term) precomputed constants + expression emitters."""

    termweight: float
    k1: float
    b: float
    min_normlen: float
    len_factor: float

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        normlen = F.greatest(
            doclen.cast("double") * F.lit(self.len_factor),
            F.lit(self.min_normlen),
        )
        wdf_d = wdf.cast("double")
        denom = (
            F.lit(self.k1) * (normlen * F.lit(self.b) + F.lit(1.0 - self.b)) + wdf_d
        )
        return F.lit(self.termweight) * (wdf_d / denom)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        """Scalar twin of sumpart_expr (oracle tests, WAND threshold calc)."""
        normlen = max(doclen * self.len_factor, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return self.termweight * (wdf / denom)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """Upper bound of sumpart over docs with wdf <= wdf_max.

        Safe for block-max pruning (bm25weight.cc:183-208).
        """
        denom = self.k1
        if self.k1 != 0.0 and self.b != 0.0:
            normlen_lb = max(
                max(wdf_max, doclen_lower_bound) * self.len_factor,
                self.min_normlen,
            )
            denom *= normlen_lb * self.b + (1.0 - self.b)
        denom += wdf_max
        if denom <= 0:
            return 0.0
        return self.termweight * (wdf_max / denom)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        """Columnar twin of maxpart() over a per-block wdf_max column —
        the block score bound for block-max pruning (honey-style exact
        per-block wdf_max, honey_postlist_encodings.h:26-111)."""
        wdf_d = wdf_max.cast("double")
        if self.k1 != 0.0 and self.b != 0.0:
            normlen_lb = F.greatest(
                F.greatest(wdf_d, F.lit(float(doclen_lower_bound)))
                * F.lit(self.len_factor),
                F.lit(self.min_normlen),
            )
            denom = (
                F.lit(self.k1) * (normlen_lb * F.lit(self.b) + F.lit(1.0 - self.b))
                + wdf_d
            )
        else:
            denom = F.lit(self.k1) + wdf_d
        return F.when(
            denom > 0, F.lit(self.termweight) * (wdf_d / denom)
        ).otherwise(0.0)


@dataclass
class BM25Weight(Weight):
    k1: float = 1.0
    k2: float = 0.0
    k3: float = 1.0
    b: float = 0.5
    min_normlen: float = 0.5

    name: str = field(default="bm25", init=False)

    def _len_factor(self, stats: GlobalStats) -> float:
        if self.k2 == 0 and (self.b == 0 or self.k1 == 0):
            return 0.0
        avg = stats.average_length
        return 1.0 / avg if avg != 0 else 0.0

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        tf = ts.tf
        tw = (stats.doccount - tf + 0.5) / (tf + 0.5)
        if tw < 2:
            tw = tw * 0.5 + 1
        termweight = math.log(tw) * factor
        if self.k3 != 0:
            termweight *= (self.k3 + 1) * wqf / (self.k3 + wqf)
        termweight *= self.k1 + 1
        return TermWeight(
            termweight=termweight,
            k1=self.k1,
            b=self.b,
            min_normlen=self.min_normlen,
            len_factor=self._len_factor(stats),
        )

    def sumextra_expr(self, doclen: Column, query_length: int) -> Column:
        if self.k2 == 0:
            return F.lit(0.0)
        num = 2.0 * self.k2 * query_length
        normlen = F.greatest(
            doclen.cast("double") * F.lit(1.0),  # len_factor applied by caller
            F.lit(self.min_normlen),
        )
        return F.lit(num) / (F.lit(1.0) + normlen)


@dataclass
class TradWeight(Weight):
    """Traditional probabilistic weighting (xapian-core/weight/tradweight.cc):
    equivalent to BM25 with k1=param_k, b=1, k2=k3=0, min_normlen=0."""

    k: float = 1.0
    name: str = field(default="trad", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        tf = ts.tf
        tw = (stats.doccount - tf + 0.5) / (tf + 0.5)
        if tw < 2:
            tw = tw * 0.5 + 1
        termweight = math.log(tw) * factor
        avg = stats.average_length
        len_factor = (self.k / avg) if (self.k != 0 and avg != 0) else 0.0
        # sumpart = termweight * wdf / (k*normlen + wdf); reuse TermWeight with
        # k1=1, b=1, min_normlen=0, len_factor = k/avg_len.
        return TermWeight(
            termweight=termweight,
            k1=1.0,
            b=1.0,
            min_normlen=0.0,
            len_factor=len_factor,
        )


@dataclass
class CoordWeight(Weight):
    """1 point per matching subquery (xapian-core/weight/coordweight.cc)."""

    name: str = field(default="coord", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        return FlatTermWeight(termweight=factor)


@dataclass
class BoolWeight(Weight):
    """All-zero weights (xapian-core/weight/boolweight.cc)."""

    name: str = field(default="bool", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        return TermWeight(
            termweight=0.0, k1=0.0, b=0.0, min_normlen=0.0, len_factor=0.0
        )


@dataclass
class TfIdfWeight(Weight):
    """tf*idf, "ntn" normalization default (xapian-core/weight/tfidfweight.cc):
    wdfn = wdf, idfn = log(N/tf), weight = wdfn * idfn * wqf_factor."""

    name: str = field(default="tfidf", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        idf = math.log(stats.doccount / ts.tf) if ts.tf > 0 else 0.0
        # sumpart = termweight * wdf  -> TermWeight with k1=0,b=0: tw*wdf/wdf
        # doesn't give wdf-proportional; use LinearTermWeight instead.
        return LinearTermWeight(termweight=idf * factor)


@dataclass(frozen=True)
class FlatTermWeight(TermWeight):
    """sumpart = termweight, flat per match (CoordWeight, BoolWeight)."""

    termweight: float = 0.0
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        return F.lit(self.termweight)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        return self.termweight

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        return self.termweight

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        return F.lit(self.termweight)


@dataclass(frozen=True)
class LinearTermWeight(TermWeight):
    """sumpart = termweight * wdf (used by TfIdf 'ntn')."""

    termweight: float = 0.0
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        return F.lit(self.termweight) * wdf.cast("double")

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        return self.termweight * wdf

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        return self.termweight * wdf_max

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        return F.lit(self.termweight) * wdf_max.cast("double")


@dataclass(frozen=True)
class BM25PlusTermWeight(TermWeight):
    """sumpart = termweight * ((k1+1)*wdf/denom + delta)
    (bm25plusweight.cc:121-133; the (k1+1) factor lives here, not in init)."""

    delta: float = 1.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        normlen = F.greatest(
            doclen.cast("double") * F.lit(self.len_factor),
            F.lit(self.min_normlen),
        )
        wdf_d = wdf.cast("double")
        denom = (
            F.lit(self.k1) * (normlen * F.lit(self.b) + F.lit(1.0 - self.b)) + wdf_d
        )
        return F.lit(self.termweight) * (
            F.lit(self.k1 + 1.0) * wdf_d / denom + F.lit(self.delta)
        )

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        normlen = max(doclen * self.len_factor, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return self.termweight * ((self.k1 + 1.0) * wdf / denom + self.delta)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        # bm25plusweight.cc:136-160: evaluated at wdf_max / normlen_lb
        denom = self.k1
        if self.k1 != 0.0 and self.b != 0.0:
            normlen_lb = max(
                max(wdf_max, doclen_lower_bound) * self.len_factor,
                self.min_normlen,
            )
            denom *= normlen_lb * self.b + (1.0 - self.b)
        denom += wdf_max
        if denom <= 0:
            return self.termweight * self.delta
        return self.termweight * ((self.k1 + 1.0) * wdf_max / denom + self.delta)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        wdf_d = wdf_max.cast("double")
        if self.k1 != 0.0 and self.b != 0.0:
            normlen_lb = F.greatest(
                F.greatest(wdf_d, F.lit(float(doclen_lower_bound)))
                * F.lit(self.len_factor),
                F.lit(self.min_normlen),
            )
            denom = (
                F.lit(self.k1)
                * (normlen_lb * F.lit(self.b) + F.lit(1.0 - self.b))
                + wdf_d
            )
        else:
            denom = F.lit(self.k1) + wdf_d
        return F.lit(self.termweight) * (
            F.lit(self.k1 + 1.0) * wdf_d / denom + F.lit(self.delta)
        )


@dataclass
class BM25PlusWeight(Weight):
    """BM25+ (bm25plusweight.cc): idf = ln((N+1)/tf); a pseudo-tf delta
    lifts the lower bound of the tf contribution (defaults k1=1 k2=0 k3=1
    b=0.5 min_normlen=0.5 delta=1)."""

    k1: float = 1.0
    k2: float = 0.0
    k3: float = 1.0
    b: float = 0.5
    min_normlen: float = 0.5
    delta: float = 1.0

    name: str = field(default="bm25plus", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            termweight = 0.0
        else:
            termweight = math.log((stats.doccount + 1) / ts.tf) * factor
            if self.k3 != 0:
                termweight *= (self.k3 + 1) * wqf / (self.k3 + wqf)
        if self.k2 == 0 and (self.b == 0 or self.k1 == 0):
            len_factor = 0.0
        else:
            avg = stats.average_length
            len_factor = 1.0 / avg if avg != 0 else 0.0
        return BM25PlusTermWeight(
            termweight=termweight,
            k1=self.k1,
            b=self.b,
            min_normlen=self.min_normlen,
            len_factor=len_factor,
            delta=self.delta,
        )


@dataclass(frozen=True)
class InL2TermWeight(TermWeight):
    """DFR InL2 (inl2weight.cc:123-134):
    wdfn = wdf * log2(1 + c*avlen/len); w = wqf*idf * wdfn/(wdfn+1)."""

    termweight: float = 0.0
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    wqf_idf: float = 0.0
    c_avlen: float = 0.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        wdfn = wdf.cast("double") * F.log2(
            F.lit(1.0) + F.lit(self.c_avlen) / doclen.cast("double")
        )
        return F.when(
            wdf > 0, F.lit(self.wqf_idf) * (wdfn / (wdfn + F.lit(1.0)))
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf <= 0:
            return 0.0
        wdfn = wdf * math.log2(1.0 + self.c_avlen / doclen)
        return self.wqf_idf * (wdfn / (wdfn + 1.0))

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        if wdf_max == 0 or doclen_lower_bound <= 0:
            return 0.0
        return self.sumpart_py(wdf_max, doclen_lower_bound)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        if doclen_lower_bound <= 0:
            return F.lit(0.0)
        wdfn = wdf_max.cast("double") * F.lit(
            math.log2(1.0 + self.c_avlen / doclen_lower_bound)
        )
        return F.when(
            wdf_max > 0, F.lit(self.wqf_idf) * (wdfn / (wdfn + F.lit(1.0)))
        ).otherwise(0.0)


@dataclass
class InL2Weight(Weight):
    """DFR InL2 (inl2weight.cc): idf = log2((N+1)/(tf+0.5)), document-length
    normalisation 2 with parameter c (default 1)."""

    c: float = 1.0
    name: str = field(default="inl2", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            return InL2TermWeight(wqf_idf=0.0, c_avlen=0.0)
        idf = math.log2((stats.doccount + 1) / (ts.tf + 0.5))
        return InL2TermWeight(
            wqf_idf=wqf * idf * factor,
            c_avlen=self.c * stats.average_length,
        )


@dataclass(frozen=True)
class LMDirichletTermWeight(TermWeight):
    """LMWeight with Dirichlet smoothing (lmweight.cc:180-182,205-206):
    p = (wdf + mu*p_c) / (len + mu); sumpart = ln(p * param_log) when the
    product exceeds 1 (log-trick ranking), else 0."""

    termweight: float = 0.0
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    mu: float = 2000.0
    p_c: float = 0.0  # collection LM: cf / total_doclen
    param_log: float = 1.0  # doclen upper bound by default
    factor: float = 1.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        p = (wdf.cast("double") + F.lit(self.mu * self.p_c)) / (
            doclen.cast("double") + F.lit(self.mu)
        )
        product = p * F.lit(self.param_log)
        return F.when(
            product > 1.0, F.lit(self.factor) * F.log(product)
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        p = (wdf + self.mu * self.p_c) / (doclen + self.mu)
        product = p * self.param_log
        return self.factor * math.log(product) if product > 1.0 else 0.0

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        # lmweight.cc:212-237: bound via doclen upper bound; we are given
        # the lower bound here, so evaluate at (wdf_max, doclen_lb) which
        # upper-bounds p for any len >= doclen_lb
        return self.sumpart_py(wdf_max, max(doclen_lower_bound, 1))

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        p = (wdf_max.cast("double") + F.lit(self.mu * self.p_c)) / (
            F.lit(float(max(doclen_lower_bound, 1)) + self.mu)
        )
        product = p * F.lit(self.param_log)
        return F.when(
            product > 1.0, F.lit(self.factor) * F.log(product)
        ).otherwise(0.0)


@dataclass
class LMWeight(Weight):
    """Unigram language model, Dirichlet smoothing defaults
    (lmweight.cc: mu=2000; param_log defaults to doclen upper bound)."""

    mu: float = 2000.0
    param_log: float = 0.0
    name: str = field(default="lm", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        p_c = (
            ts.cf / stats.total_doclen if stats.total_doclen > 0 else 0.0
        )
        plog = self.param_log or float(stats.doclen_upper_bound)
        return LMDirichletTermWeight(
            mu=self.mu, p_c=p_c, param_log=plog,
            factor=factor,
        )


WEIGHT_SCHEMES = {
    "bm25": BM25Weight,
    "bm25plus": BM25PlusWeight,
    "trad": TradWeight,
    "inl2": InL2Weight,
    "lm": LMWeight,
    "coord": CoordWeight,
    "bool": BoolWeight,
    "tfidf": TfIdfWeight,
}
