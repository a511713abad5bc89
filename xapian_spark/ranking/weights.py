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

    def sumextra_expr(
        self, doclen: Column, query_length: int, stats: GlobalStats
    ) -> Column:
        """Doc-only weight part, added once per matching doc
        (Weight::get_sumextra, weight.h:245-275)."""
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

    def sumextra_expr(
        self, doclen: Column, query_length: int, stats: GlobalStats
    ) -> Column:
        """k2 part (bm25weight.cc:219-227):
        2*k2*query_length / (1 + max(len*len_factor, min_normlen))."""
        if self.k2 == 0:
            return F.lit(0.0)
        num = 2.0 * self.k2 * query_length
        normlen = F.greatest(
            doclen.cast("double") * F.lit(self._len_factor(stats)),
            F.lit(self.min_normlen),
        )
        return F.lit(num) / (F.lit(1.0) + normlen)

    def maxextra(self, stats: GlobalStats, query_length: int) -> float:
        """bm25weight.cc:229-238: evaluated at the doclen lower bound."""
        if self.k2 == 0:
            return 0.0
        num = 2.0 * self.k2 * query_length
        normlen = max(
            stats.doclen_lower_bound * self._len_factor(stats),
            self.min_normlen,
        )
        return num / (1.0 + normlen)


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


@dataclass(frozen=True)
class TfIdfTermWeight(TermWeight):
    """General TfIdf: sumpart = wdfn(wdf, doclen) * idfn * wqf * factor
    (tfidfweight.cc:217-218; wdfn variants :249-306)."""

    termweight: float = 0.0  # idfn * wqf * factor
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    wdf_norm: str = "n"
    avg_len: float = 1.0
    slope: float = 0.2
    delta: float = 1.0

    def _wdfn_py(self, wdf: float, doclen: float, uniqterms: float = 1.0) -> float:
        n = self.wdf_norm
        if wdf == 0 and n != "s":
            return 0.0
        if n == "n":
            return float(wdf)
        if n == "b":
            return 1.0
        if n == "s":
            return float(wdf) * wdf
        if n == "l":
            return 1.0 + math.log(wdf)
        if n == "P":
            normlen = doclen / self.avg_len if self.avg_len else 1.0
            nf = 1.0 / (1.0 - self.slope + self.slope * normlen)
            return (1.0 + math.log(1.0 + math.log(wdf))) * nf + self.delta
        if n == "L":
            wdf_avg = (
                doclen / uniqterms if doclen and uniqterms else 1.0
            )
            return (1.0 + math.log(wdf)) / (1.0 + math.log(wdf_avg))
        raise ValueError(f"unsupported wdf normalization: {n!r}")

    def sumpart_py(self, wdf: float, doclen: float, uniqterms: float = 1.0) -> float:
        return self.termweight * self._wdfn_py(wdf, doclen, uniqterms)

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        n = self.wdf_norm
        w = wdf.cast("double")
        if n == "n":
            wdfn = w
        elif n == "b":
            wdfn = F.when(wdf > 0, F.lit(1.0)).otherwise(0.0)
        elif n == "s":
            wdfn = w * w
        elif n == "l":
            wdfn = F.when(wdf > 0, F.lit(1.0) + F.log(w)).otherwise(0.0)
        elif n == "P":
            normlen = doclen.cast("double") / F.lit(self.avg_len)
            nf = F.lit(1.0) / (
                F.lit(1.0 - self.slope) + F.lit(self.slope) * normlen
            )
            wdfn = F.when(
                wdf > 0,
                (F.lit(1.0) + F.log(F.lit(1.0) + F.log(w))) * nf
                + F.lit(self.delta),
            ).otherwise(0.0)
        elif n == "L":
            uniq = F.col("uniqterms").cast("double")
            wdf_avg = F.when(
                (doclen > 0) & (uniq > 0), doclen.cast("double") / uniq
            ).otherwise(1.0)
            wdfn = F.when(
                wdf > 0,
                (F.lit(1.0) + F.log(w)) / (F.lit(1.0) + F.log(wdf_avg)),
            ).otherwise(0.0)
        else:
            raise ValueError(f"unsupported wdf normalization: {n!r}")
        return F.lit(self.termweight) * wdfn

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        # tfidfweight.cc:228: wdfn evaluated at (wdf_max, len_min, len_min)
        if wdf_max == 0:
            return 0.0
        dl = max(doclen_lower_bound, 1)
        return self.termweight * self._wdfn_py(wdf_max, dl, dl)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        # every supported wdfn is non-decreasing in wdf at fixed doclen, so
        # the scalar bound at the block's wdf_max is safe; express it as the
        # scalar formula over the wdf_max column via a tiny case analysis
        n = self.wdf_norm
        w = wdf_max.cast("double")
        dl = float(max(doclen_lower_bound, 1))
        if n == "n":
            wdfn = w
        elif n == "b":
            wdfn = F.when(wdf_max > 0, F.lit(1.0)).otherwise(0.0)
        elif n == "s":
            wdfn = w * w
        elif n in ("l", "L"):
            # 'L' bound uses wdf_avg = dl/dl = 1 -> same as 'l'
            wdfn = F.when(wdf_max > 0, F.lit(1.0) + F.log(w)).otherwise(0.0)
        elif n == "P":
            normlen = dl / self.avg_len if self.avg_len else 1.0
            nf = 1.0 / (1.0 - self.slope + self.slope * normlen)
            wdfn = F.when(
                wdf_max > 0,
                (F.lit(1.0) + F.log(F.lit(1.0) + F.log(w))) * F.lit(nf)
                + F.lit(self.delta),
            ).otherwise(0.0)
        else:
            raise ValueError(f"unsupported wdf normalization: {n!r}")
        return F.lit(self.termweight) * wdfn


@dataclass
class TfIdfWeight(Weight):
    """TfIdf with the reference's 3-letter normalization codes
    (tfidfweight.cc:42-101): wdf norm in {n,b,s,l,P,L}, idf norm in
    {n,t,p,f,s,P}, wt norm 'n'.  Default "ntn": wdfn = wdf,
    idfn = log(N/tf)."""

    normalizations: str = "ntn"
    slope: float = 0.2
    delta: float = 1.0

    name: str = field(default="tfidf", init=False)

    def __post_init__(self):
        if len(self.normalizations) != 3:
            raise ValueError("normalization string must have 3 letters")
        if self.normalizations[0] not in "nbslPL":
            raise ValueError(
                f"unsupported wdf normalization {self.normalizations[0]!r}"
            )
        if self.normalizations[1] not in "ntpfsP":
            raise ValueError(
                f"unsupported idf normalization {self.normalizations[1]!r}"
            )
        if self.normalizations[2] != "n":
            raise ValueError("only wt normalization 'n' exists (reference)")

    @property
    def needs_uniqterms(self) -> bool:
        return self.normalizations[0] == "L"

    def _idfn(self, stats: GlobalStats, ts: TermStats) -> float:
        code = self.normalizations[1]
        tf = ts.tf
        if code == "n":
            return 1.0
        if tf <= 0:
            return 0.0
        N = float(stats.doccount)
        if code == "t":
            return math.log(N / tf)
        if code == "p":
            return 0.0 if N == tf else math.log((N - tf) / tf)
        if code == "f":
            return 1.0 / tf
        if code == "s":
            x = math.log(N / tf)
            return x * x
        if code == "P":
            return math.log((N + 1.0) / tf)
        raise ValueError(code)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            return TfIdfTermWeight()
        return TfIdfTermWeight(
            termweight=self._idfn(stats, ts) * wqf * factor,
            wdf_norm=self.normalizations[0],
            avg_len=stats.average_length or 1.0,
            slope=self.slope,
            delta=self.delta,
        )


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


_LOG2 = math.log(2.0)
_BASE_CHANGE = 1.0 / _LOG2  # 1/ln(2), reference's base_change


@dataclass(frozen=True)
class PL2TermWeight(TermWeight):
    """DFR PL2 (pl2weight.cc:160-175): wdfn = wdf*log2(1 + c*avlen/len);
    P = P1 + (wdfn+0.5)*log2(wdfn) - P2*wdfn; sumpart = factor*P/(wdfn+1)
    with P1 = mean/ln2 + 0.5*log2(2*pi), P2 = log2(mean) + 1/ln2,
    mean = cf/N (pl2weight.cc:79-87)."""

    termweight: float = 0.0  # factor * wqf (pl2weight.cc:80)
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    cl: float = 0.0  # c * average_length
    P1: float = 0.0
    P2: float = 0.0
    len_upper: float = 1.0  # doclength upper bound (for the maxpart bound)
    delta_w: float = 0.0  # PL2+ dw term; 0 for vanilla PL2
    mean: float = 1.0  # cf/N; PL2+ bails out when mean < 1

    def _plus(self) -> bool:
        return self.delta_w != 0.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        if self._plus() and self.mean < 1:
            return F.lit(0.0)
        wdfn = wdf.cast("double") * F.log2(
            F.lit(1.0) + F.lit(self.cl) / doclen.cast("double")
        )
        P = (
            F.lit(self.P1)
            + (wdfn + F.lit(0.5)) * F.log2(wdfn)
            - F.lit(self.P2) * wdfn
        )
        wt = P / (wdfn + F.lit(1.0)) + F.lit(self.delta_w)
        if self._plus():
            # PL2+ (pl2plusweight.cc:168-177): dw added before the <=0 guard
            return F.when(
                (wdf > 0) & (wt > 0), F.lit(self.termweight) * wt
            ).otherwise(0.0)
        # vanilla PL2 guards P <= 0 (pl2weight.cc:168-172)
        return F.when(
            (wdf > 0) & (P > 0), F.lit(self.termweight) * P / (wdfn + F.lit(1.0))
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf == 0:
            return 0.0
        if self._plus() and self.mean < 1:
            return 0.0
        wdfn = wdf * math.log2(1.0 + self.cl / doclen)
        P = self.P1 + (wdfn + 0.5) * math.log2(wdfn) - self.P2 * wdfn
        if self._plus():
            wt = P / (wdfn + 1.0) + self.delta_w
            return self.termweight * wt if wt > 0 else 0.0
        if P <= 0:
            return 0.0
        return self.termweight * P / (wdfn + 1.0)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """Reference bound (pl2weight.cc:90-127 / pl2plusweight.cc:100-147)
        evaluated with wdf_upper := the given wdf_max (term- or block-level)."""
        if wdf_max == 0:
            return 0.0
        if self._plus() and self.mean < 1:
            return 0.0
        wdfn_lower = math.log2(1.0 + self.cl / max(self.len_upper, 1.0))
        divisor = max(wdf_max, doclen_lower_bound)
        wdfn_upper = wdf_max * math.log2(1.0 + self.cl / max(divisor, 1))
        if wdfn_upper <= 0:
            return 0.0
        if wdfn_upper > 1.0:
            P_max2a = (
                (wdfn_upper + 0.5) * math.log2(wdfn_upper)
                / (wdfn_upper + 1.0)
            )
        else:
            # (w+0.5)*log2(w)/(w+1) <= 0 for w <= 1; 0 is a safe cap
            P_max2a = 0.0
        # Part (b) = (P1 - P2*w)/(w+1) = (P1+P2)/(w+1) - P2 is DECREASING
        # in w when P1+P2 > 0 (derivative -(P1+P2)/(w+1)^2), so its max is
        # at wdfn_LOWER.  NOTE: pl2weight.cc:118 picks wdfn_upper in that
        # branch, contradicting its own derivation comment at :108-117 and
        # yielding a bound smaller than realizable sumparts for
        # high-frequency terms (mean >= 1) — deliberate divergence: we take
        # the safe end so block-max pruning stays exact.
        wdfn_optb = wdfn_lower if self.P1 + self.P2 > 0 else wdfn_upper
        wdfn_optb = max(wdfn_optb, 1e-12)
        P_max2b = (self.P1 - self.P2 * wdfn_optb) / (wdfn_optb + 1.0)
        ub = self.termweight * (P_max2a + max(P_max2b, 0.0) + self.delta_w)
        return max(ub, 0.0)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        # Columnar twin of maxpart(); per-block bound for block-max pruning.
        # Same safe-end choice for part (b) as maxpart() — see the
        # divergence note there (pl2weight.cc:118 vs its :108-117 comment).
        wdf_d = wdf_max.cast("double")
        wdfn_lower = math.log2(1.0 + self.cl / max(self.len_upper, 1.0))
        divisor = F.greatest(wdf_d, F.lit(float(max(doclen_lower_bound, 1))))
        wdfn_upper = wdf_d * F.log2(F.lit(1.0) + F.lit(self.cl) / divisor)
        P_max2a = F.greatest(
            (wdfn_upper + F.lit(0.5)) * F.log2(F.greatest(wdfn_upper, F.lit(1e-300)))
            / (wdfn_upper + F.lit(1.0)),
            F.lit(0.0),
        )
        if self.P1 + self.P2 > 0:
            optb_s = max(wdfn_lower, 1e-12)
            P_max2b = F.lit(
                max((self.P1 - self.P2 * optb_s) / (optb_s + 1.0), 0.0)
            )
        else:
            P_max2b = F.greatest(
                (F.lit(self.P1) - F.lit(self.P2) * wdfn_upper)
                / (wdfn_upper + F.lit(1.0)),
                F.lit(0.0),
            )
        ub = F.lit(self.termweight) * (P_max2a + P_max2b + F.lit(self.delta_w))
        if self._plus() and self.mean < 1:
            return F.lit(0.0)
        return F.when((wdf_max > 0) & (ub > 0), ub).otherwise(0.0)


@dataclass
class PL2Weight(Weight):
    """DFR PL2 (pl2weight.cc), Poisson + Laplace + length-norm 2; c=1."""

    c: float = 1.0
    name: str = field(default="pl2", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0 or stats.doccount == 0:
            return PL2TermWeight()
        mean = ts.cf / stats.doccount
        return PL2TermWeight(
            termweight=factor * wqf,
            cl=self.c * stats.average_length,
            P1=mean * _BASE_CHANGE + 0.5 * math.log2(2.0 * math.pi),
            P2=math.log2(mean) + _BASE_CHANGE,
            len_upper=float(stats.doclen_upper_bound),
            mean=mean,
        )


@dataclass
class PL2PlusWeight(Weight):
    """DFR PL2+ (pl2plusweight.cc): PL2 with a lower-bound bonus dw =
    P(delta)/(delta+1); defaults c=1, delta=0.8 (weight.h:1630-1631)."""

    c: float = 1.0
    delta: float = 0.8
    name: str = field(default="pl2plus", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0 or stats.doccount == 0:
            return PL2TermWeight(delta_w=1e-300)  # mark as "+" with no weight
        mean = ts.cf / stats.doccount
        P1 = mean * _BASE_CHANGE + 0.5 * math.log2(2.0 * math.pi)
        P2 = math.log2(mean) + _BASE_CHANGE
        d = self.delta
        P_delta = P1 + (d + 0.5) * math.log2(d) - P2 * d
        return PL2TermWeight(
            termweight=factor * wqf,
            cl=self.c * stats.average_length,
            P1=P1,
            P2=P2,
            len_upper=float(stats.doclen_upper_bound),
            delta_w=P_delta / (d + 1.0),
            mean=mean,
        )


@dataclass(frozen=True)
class DPHTermWeight(TermWeight):
    """DFR DPH (dphweight.cc:139-156), parameter-free:
    norm = (1 - wdf/len)^2 / (wdf+1);
    wt = norm * (wdf*(log2(wdf/len) + log2(total_len/cf))
                 + 0.5*log2(2*pi*wdf*(1 - wdf/len)))."""

    termweight: float = 0.0  # wqf * factor
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    log_constant: float = 0.0  # log2(total_len / cf)
    len_upper: float = 1.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        wdf_d = wdf.cast("double")
        len_d = doclen.cast("double")
        r = wdf_d / len_d
        x = F.lit(1.0) - r
        norm = x * x / (wdf_d + F.lit(1.0))
        wt = norm * (
            wdf_d * (F.log2(r) + F.lit(self.log_constant))
            + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * wdf_d * x)
        )
        return F.when(
            (wdf > 0) & (wdf_d != len_d) & (wt > 0),
            F.lit(self.termweight) * wt,
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf == 0 or wdf == doclen:
            return 0.0
        r = wdf / doclen
        x = 1.0 - r
        norm = x * x / (wdf + 1.0)
        wt = norm * (
            wdf * (math.log2(r) + self.log_constant)
            + 0.5 * math.log2(2.0 * math.pi * wdf * x)
        )
        return self.termweight * wt if wt > 0 else 0.0

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """Reference bound (dphweight.cc:52-110) with wdf_upper := wdf_max."""
        if wdf_max == 0:
            return 0.0
        len_upper = max(self.len_upper, 1.0)
        wdf_lower = 1.0
        min_wdf_to_len = wdf_lower / len_upper
        max_product_1 = wdf_max * (1.0 - min_wdf_to_len)
        wdf_var = min(float(wdf_max), len_upper / 2.0)
        max_product_2 = wdf_var * (1.0 - wdf_var / len_upper)
        max_product = max(min(max_product_1, max_product_2), 1e-9)
        wdf_root = 0.25 * (math.sqrt(8.0 * len_upper + 9.0) - 3.0)
        wdf_root = min(max(wdf_root, wdf_lower), float(wdf_max))
        x = 1.0 - wdf_root / len_upper
        max_norm = wdf_root / (wdf_root + 1.0) * x * x
        max_weight = max_norm * (
            self.log_constant + 0.5 * math.log2(2.0 * math.pi * max_product)
        )
        return max(self.termweight * max_weight, 0.0)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        wdf_d = wdf_max.cast("double")
        len_upper = max(self.len_upper, 1.0)
        mp1 = wdf_d * F.lit(1.0 - 1.0 / len_upper)
        wdf_var = F.least(wdf_d, F.lit(len_upper / 2.0))
        mp2 = wdf_var * (F.lit(1.0) - wdf_var / F.lit(len_upper))
        max_product = F.greatest(F.least(mp1, mp2), F.lit(1e-9))
        wdf_root_s = 0.25 * (math.sqrt(8.0 * len_upper + 9.0) - 3.0)
        wdf_root = F.least(F.greatest(F.lit(wdf_root_s), F.lit(1.0)), wdf_d)
        x = F.lit(1.0) - wdf_root / F.lit(len_upper)
        max_norm = wdf_root / (wdf_root + F.lit(1.0)) * x * x
        max_weight = max_norm * (
            F.lit(self.log_constant)
            + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * max_product)
        )
        ub = F.lit(self.termweight) * max_weight
        return F.when((wdf_max > 0) & (ub > 0), ub).otherwise(0.0)


@dataclass
class DPHWeight(Weight):
    """DFR DPH (dphweight.cc), hypergeometric + Popper norm; parameter-free."""

    name: str = field(default="dph", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0 or ts.cf == 0:
            return DPHTermWeight()
        return DPHTermWeight(
            termweight=wqf * factor,
            log_constant=math.log2(stats.total_doclen / ts.cf),
            len_upper=float(stats.doclen_upper_bound),
        )


@dataclass(frozen=True)
class DLHTermWeight(TermWeight):
    """DFR DLH (dlhweight.cc): wt = (wdf*log2((wdf/len)*L) +
    (len-wdf)*log2(1 - wdf/len) + 0.5*log2(2*pi*wdf*(1-wdf/len)))
    / (wdf + 0.5), L = total_len/cf; parameter-free."""

    termweight: float = 0.0  # wqf * factor
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    log_constant: float = 0.0  # total_len / cf (NOT logged; dlhweight.cc)
    len_upper: float = 1.0
    len_lower: float = 1.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        wdf_d = wdf.cast("double")
        len_d = doclen.cast("double")
        r = wdf_d / len_d
        omr = F.lit(1.0) - r
        wt = (
            wdf_d * F.log2(r * F.lit(self.log_constant))
            + (len_d - wdf_d) * F.log2(omr)
            + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * wdf_d * omr)
        )
        return F.when(
            (wdf > 0) & (wdf_d != len_d) & (wt > 0),
            F.lit(self.termweight) * wt / (wdf_d + F.lit(0.5)),
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf == 0 or wdf == doclen:
            return 0.0
        r = wdf / doclen
        omr = 1.0 - r
        wt = (
            wdf * math.log2(r * self.log_constant)
            + (doclen - wdf) * math.log2(omr)
            + 0.5 * math.log2(2.0 * math.pi * wdf * omr)
        )
        return self.termweight * wt / (wdf + 0.5) if wt > 0 else 0.0

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """Provably safe (looser than dlhweight.cc:50-110's) bound:
        wt = [T1 + T2 + T3]/(w+0.5) with T2 = (l-w)*log2(1-w/l) <= 0, so
        wt <= T1/(w+0.5) + max(T3,0)/(w+0.5)
           <= max(log2(max_w_over_l * L), 0) + max(0.5*log2(2*pi*w_max), 0)."""
        if wdf_max == 0:
            return 0.0
        len_lower = max(float(doclen_lower_bound), self.len_lower, 1.0)
        max_wdf_over_l = wdf_max / len_lower if wdf_max < len_lower else 1.0
        logged = max_wdf_over_l * self.log_constant
        A = max(math.log2(logged), 0.0) if logged > 0 else 0.0
        C = max(0.5 * math.log2(2.0 * math.pi * wdf_max), 0.0)
        return max(self.termweight * (A + C), 0.0)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        # Per-block bound via the same safe formula, monotone in wdf_max.
        len_lower = max(float(doclen_lower_bound), self.len_lower, 1.0)
        wdf_d = wdf_max.cast("double")
        ratio = F.least(wdf_d / F.lit(len_lower), F.lit(1.0))
        logged = ratio * F.lit(self.log_constant)
        A = F.greatest(F.log2(F.greatest(logged, F.lit(1e-300))), F.lit(0.0))
        C = F.greatest(
            F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * wdf_d), F.lit(0.0)
        )
        return F.when(
            wdf_max > 0, F.lit(self.termweight) * (A + C)
        ).otherwise(0.0)


@dataclass
class DLHWeight(Weight):
    """DFR DLH (dlhweight.cc), hyper-geometric with Laplace after-effect;
    parameter-free."""

    name: str = field(default="dlh", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0 or ts.cf == 0:
            return DLHTermWeight()
        return DLHTermWeight(
            termweight=wqf * factor,
            log_constant=stats.total_doclen / ts.cf,
            len_upper=float(stats.doclen_upper_bound),
            len_lower=float(stats.doclen_lower_bound),
        )


@dataclass(frozen=True)
class IfB2TermWeight(TermWeight):
    """DFR IfB2/IneB2 shared shape (ifb2weight.cc / ineb2weight.cc):
    wdfn = wdf*log2(1 + c*avlen/len);
    sumpart = wqf*idf * wdfn*B/(wdfn+1), B = (cf+1)/tf."""

    termweight: float = 0.0  # wqf * idf * factor
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    c_avlen: float = 0.0
    B_constant: float = 0.0

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        wdfn = wdf.cast("double") * F.log2(
            F.lit(1.0) + F.lit(self.c_avlen) / doclen.cast("double")
        )
        return F.when(
            wdf > 0,
            F.lit(self.termweight)
            * (wdfn * F.lit(self.B_constant) / (wdfn + F.lit(1.0))),
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf <= 0:
            return 0.0
        wdfn = wdf * math.log2(1.0 + self.c_avlen / doclen)
        return self.termweight * (wdfn * self.B_constant / (wdfn + 1.0))

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        # monotone increasing in wdfn -> evaluate at (wdf_max, doclen_lb)
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
            wdf_max > 0,
            F.lit(self.termweight)
            * (wdfn * F.lit(self.B_constant) / (wdfn + F.lit(1.0))),
        ).otherwise(0.0)


@dataclass
class IfB2Weight(Weight):
    """DFR IfB2 (ifb2weight.cc): idf = log2((N+1)/(cf+0.5)), Bernoulli
    after-effect, length-norm 2 with parameter c (default 1)."""

    c: float = 1.0
    name: str = field(default="ifb2", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            return IfB2TermWeight()
        idf = math.log2((stats.doccount + 1.0) / (ts.cf + 0.5))
        return IfB2TermWeight(
            termweight=wqf * idf * factor,
            c_avlen=self.c * stats.average_length,
            B_constant=(ts.cf + 1.0) / ts.tf,
        )


@dataclass
class IneB2Weight(Weight):
    """DFR IneB2 (ineb2weight.cc): idf uses the EXPECTED termfreq under a
    Poisson model: idf = log2((N+1)/(N*(1-e^{-cf/N}) + 0.5))."""

    c: float = 1.0
    name: str = field(default="ineb2", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0 or stats.doccount == 0:
            return IfB2TermWeight()
        N = float(stats.doccount)
        mean = ts.cf / N
        expected = N * (1.0 - math.exp(-mean))
        idf = math.log2((N + 1.0) / (expected + 0.5))
        return IfB2TermWeight(
            termweight=wqf * idf * factor,
            c_avlen=self.c * stats.average_length,
            B_constant=(ts.cf + 1.0) / ts.tf,
        )


def _stirling_value(difference: float, y: float, c: float) -> float:
    """(bb2weight.cc:38-41)"""
    return (y + 0.5) * (c - math.log2(y)) + difference * c


@dataclass(frozen=True)
class BB2TermWeight(TermWeight):
    """DFR BB2 (bb2weight.cc:150-180): Bose-Einstein with Stirling approx;
    B = wqf*factor*(F+1)/tf / (wdfn+1);
    wt = B * (-1/ln2 - log2(N-1) + stirling diff)."""

    termweight: float = 0.0  # wqf * factor * (F+1)/tf  == B_constant
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    c_avlen: float = 0.0
    cf: float = 1.0  # collection freq F
    N: float = 2.0  # clamped collection size
    len_upper: float = 1.0
    wdf_ub: int = 0  # term-level wdf upper bound (for maxpart_expr)

    @property
    def _wt(self) -> float:
        return -_BASE_CHANGE - math.log2(self.N - 1.0)

    @property
    def _sc1(self) -> float:
        return math.log2(self.N + self.cf - 1.0)

    @property
    def _sc2(self) -> float:
        return math.log2(self.cf)

    def sumpart_py(self, wdf: float, doclen: float) -> float:
        if wdf == 0:
            return 0.0
        wdfn = wdf * math.log2(1.0 + self.c_avlen / doclen)
        if wdfn >= self.cf - 1:
            wdfn = self.cf - 1
        if wdfn <= 0:
            return 0.0
        N_less_2 = 0.0 if self.N <= 2 else self.N - 2
        y2 = self.cf - wdfn
        y1 = N_less_2 + y2
        stirling = _stirling_value(wdfn + 1.0, y1, self._sc1) - _stirling_value(
            wdfn, y2, self._sc2
        )
        B = self.termweight / (wdfn + 1.0)
        w = B * (self._wt + stirling)
        return max(w, 0.0)

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        wdfn_raw = wdf.cast("double") * F.log2(
            F.lit(1.0) + F.lit(self.c_avlen) / doclen.cast("double")
        )
        wdfn = F.least(wdfn_raw, F.lit(self.cf - 1.0))
        N_less_2 = 0.0 if self.N <= 2 else self.N - 2.0
        y2 = F.lit(self.cf) - wdfn
        y1 = F.lit(N_less_2) + y2
        sc1, sc2 = self._sc1, self._sc2
        st1 = (y1 + F.lit(0.5)) * (F.lit(sc1) - F.log2(y1)) + (
            wdfn + F.lit(1.0)
        ) * F.lit(sc1)
        st2 = (y2 + F.lit(0.5)) * (F.lit(sc2) - F.log2(y2)) + wdfn * F.lit(sc2)
        B = F.lit(self.termweight) / (wdfn + F.lit(1.0))
        w = B * (F.lit(self._wt) + st1 - st2)
        return F.when((wdf > 0) & (wdfn > 0) & (w > 0), w).otherwise(0.0)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        """Reference bound (bb2weight.cc:68-124) with wdf_upper := wdf_max."""
        if wdf_max == 0:
            return 0.0
        wdfn_lower = math.log2(1.0 + self.c_avlen / max(self.len_upper, 1.0))
        dl_lb = max(doclen_lower_bound, 1)
        wdfn_upper = wdf_max * math.log2(1.0 + self.c_avlen / dl_lb)
        Fc = self.cf
        if wdfn_lower >= Fc - 1:
            wdfn_upper = Fc - 1
        if wdfn_upper >= Fc - 1:
            wdfn_upper = Fc - 1
        if wdfn_upper <= 0 or wdfn_lower <= 0:
            return 0.0
        y_min = Fc - wdfn_upper
        y_max = self.N + Fc - wdfn_lower - 2.0
        if y_min <= 0 or y_max <= 0:
            return 0.0
        stirling_max = _stirling_value(
            wdfn_upper + 1.0, y_max, self._sc1
        ) - _stirling_value(wdfn_lower, y_min, self._sc2)
        B_max = self.termweight / (wdfn_lower + 1.0)
        return max(B_max * (self._wt + stirling_max), 0.0)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        # Per-block bound: the reference bound formula is monotone
        # non-decreasing in wdf_upper, so evaluating the scalar bound at
        # the TERM-level wdf upper bound (wdf_ub) is safe for every block.
        return F.lit(self.maxpart(self.wdf_ub, doclen_lower_bound)) + F.lit(
            0.0
        ) * wdf_max.cast("double")


@dataclass
class BB2Weight(Weight):
    """DFR BB2 (bb2weight.cc), c default 1."""

    c: float = 1.0
    name: str = field(default="bb2", init=False)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            return BB2TermWeight()
        N = 2.0 if stats.doccount <= 2 else float(stats.doccount)
        return BB2TermWeight(
            termweight=wqf * factor * (ts.cf + 1.0) / ts.tf,
            c_avlen=self.c * stats.average_length,
            cf=float(ts.cf),
            N=N,
            len_upper=float(stats.doclen_upper_bound),
            wdf_ub=ts.wdf_max,
        )


@dataclass(frozen=True)
class DiceTermWeight(TermWeight):
    """DiceCoeffWeight (dicecoeffweight.cc): sumpart =
    wqf*factor * 2 / (query_length + uniqterms).  Needs the per-doc unique
    term count, which the planner exposes as a `uniqterms` column."""

    termweight: float = 0.0  # wqf * factor
    k1: float = 0.0
    b: float = 0.0
    min_normlen: float = 0.0
    len_factor: float = 0.0
    query_length: int = 1

    def sumpart_expr(self, wdf: Column, doclen: Column) -> Column:
        uniq = F.col("uniqterms").cast("double")
        return F.when(
            wdf > 0,
            F.lit(self.termweight * 2.0) / (F.lit(float(self.query_length)) + uniq),
        ).otherwise(0.0)

    def sumpart_py(self, wdf: float, doclen: float, uniqterms: float = 1.0) -> float:
        if wdf <= 0:
            return 0.0
        return self.termweight * 2.0 / (self.query_length + uniqterms)

    def maxpart(self, wdf_max: int, doclen_lower_bound: int) -> float:
        # dicecoeffweight.cc init: |d| lower bound kept at 1 (their FIXME)
        return self.termweight * 2.0 / (self.query_length + 1.0)

    def maxpart_expr(self, wdf_max: Column, doclen_lower_bound: int) -> Column:
        return F.lit(self.maxpart(0, doclen_lower_bound)) + F.lit(
            0.0
        ) * wdf_max.cast("double")


@dataclass
class DiceCoeffWeight(Weight):
    """Dice coefficient similarity: 2*|q ∩ d| / (|q| + |d|)
    (dicecoeffweight.cc).  `query_length` is sum of wqf over the query
    (enquire.cc:279-281); set by the planner before init_term via
    set_query_length()."""

    name: str = field(default="dice", init=False)
    query_length: int = 1

    needs_uniqterms = True

    def set_query_length(self, qlen: int) -> None:
        self.query_length = max(qlen, 1)

    def init_term(
        self, stats: GlobalStats, ts: TermStats, wqf: int = 1, factor: float = 1.0
    ) -> TermWeight:
        if ts.tf == 0:
            return DiceTermWeight()
        return DiceTermWeight(
            termweight=wqf * factor, query_length=self.query_length
        )


WEIGHT_SCHEMES = {
    "bm25": BM25Weight,
    "bm25plus": BM25PlusWeight,
    "trad": TradWeight,
    "inl2": InL2Weight,
    "ifb2": IfB2Weight,
    "ineb2": IneB2Weight,
    "bb2": BB2Weight,
    "pl2": PL2Weight,
    "pl2plus": PL2PlusWeight,
    "dph": DPHWeight,
    "dlh": DLHWeight,
    "lm": LMWeight,
    "coord": CoordWeight,
    "bool": BoolWeight,
    "tfidf": TfIdfWeight,
    "dice": DiceCoeffWeight,
}
