"""Deterministic sampling for training-data mixes.

Not a reference operator; part of the Spark-era LLM-pipeline surface
next to ops/chunking.py and ops/dedup.py.  Building a pretraining mix
means downsampling each domain/language/source stratum to a target
rate, and the selection must be REPRODUCIBLE: `DataFrame.sample()`
draws from a per-partition RNG, so the kept set changes with partition
layout, retries and cluster size.  Hash sampling decides per ROW from a
content-independent key — keep iff
``bucket(md5(seed ':' key)) < rate * 2^28`` (first 7 hex digits) — so
the same row is kept on every run, any cluster, any partitioning, and
the kept set composes across reruns of subsets (the property a 100-TB
pipeline needs to resume or backfill without re-sampling everything).

Pure Catalyst: md5 + substring + conv per row, no shuffle, no Python.
The md5-hex-to-bigint bucket is the same construction the dedup /
fingerprint ops use, with the same proven DuckDB twin
``('0x' || substring(md5(k), 1, 7))::bigint``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 28  # 7 hex digits


def _bucket(key: Column, seed: int) -> Column:
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long")


def hash_sample(
    docs: DataFrame,
    rate: float,
    key_col: str = "docid",
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by hashed key.

    Monotone in ``rate``: the kept set at rate r is a SUBSET of the kept
    set at any r' > r (same seed), so a mix can be re-weighted without
    churning previously selected rows.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return docs.where(_bucket(F.col(key_col), seed) < int(rate * _BUCKETS))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 0.0,
    key_col: str = "docid",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum hash sampling: stratum s keeps ~``rates[s]`` of its
    rows (``default_rate`` for strata absent from ``rates``).  One
    narrow filter — the mix construction step of a pretraining
    pipeline, with the same determinism/monotonicity as hash_sample."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thresh = F.lit(int(default_rate * _BUCKETS))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == s, F.lit(int(r * _BUCKETS))
        ).otherwise(thresh)
    return docs.where(_bucket(F.col(key_col), seed) < thresh)
