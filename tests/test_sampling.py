"""ops/sampling.py — deterministic hash sampling for data mixes."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.sampling import hash_sample, stratified_sample  # noqa: E402

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "docid", (F.col("doc_id") + 1).cast("long")
    )


def test_deterministic_and_layout_independent(spark):
    docs = _docs(spark)
    a = {r["docid"] for r in hash_sample(docs, 0.3).collect()}
    b = {
        r["docid"]
        for r in hash_sample(docs.repartition(17), 0.3).collect()
    }
    assert a == b and a  # identical kept set under a different layout


def test_monotone_in_rate(spark):
    docs = _docs(spark)
    small = {r["docid"] for r in hash_sample(docs, 0.2).collect()}
    big = {r["docid"] for r in hash_sample(docs, 0.6).collect()}
    assert small < big  # strict subset at these rates on 500 docs


def test_rate_roughly_honoured(spark):
    docs = _docs(spark)
    n = docs.count()
    kept = hash_sample(docs, 0.5).count()
    assert abs(kept / n - 0.5) < 0.1


def test_stratified_rates_and_default(spark):
    docs = _docs(spark)
    out = stratified_sample(
        docs, {"en": 1.0, "fr": 0.0}, stratum_col="lang",
        default_rate=0.5,
    )
    by = {
        r["lang"]: r["cnt"]
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert by["en"] == totals["en"]  # rate 1.0 keeps everything
    assert "fr" not in by  # rate 0.0 keeps nothing
    for lang, total in totals.items():
        if lang in ("en", "fr"):
            continue
        assert 0 < by.get(lang, 0) < total  # default 0.5 in between


def test_seed_changes_selection(spark):
    docs = _docs(spark)
    a = {r["docid"] for r in hash_sample(docs, 0.5, seed=1).collect()}
    b = {r["docid"] for r in hash_sample(docs, 0.5, seed=2).collect()}
    assert a != b


def test_param_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1})
    with pytest.raises(ValueError):
        stratified_sample(docs, {}, default_rate=2.0)
