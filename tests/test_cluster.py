"""k-means clustering op (cluster/kmeans.cc analogue)."""

from __future__ import annotations

import pytest

from xapian_spark.ops.cluster import kmeans


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_kmeans_partitions_all(spark, emb):
    out = kmeans(emb, k=4, max_iter=5).collect()
    assert len(out) == emb.count()
    clusters = {r["cluster"] for r in out}
    assert clusters <= set(range(4)) and len(clusters) >= 2
    assert all(r["dist"] >= 0 for r in out)


def test_kmeans_deterministic(spark, emb):
    a = sorted((r["id"], r["cluster"]) for r in kmeans(emb, k=3, max_iter=3).collect())
    b = sorted((r["id"], r["cluster"]) for r in kmeans(emb, k=3, max_iter=3).collect())
    assert a == b


def test_kmeans_groups_by_label_better_than_random(spark, emb):
    """Embeddings were generated around per-label centers; k-means with
    k = #labels should agree with labels well above chance."""
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    n_labels = len(set(labels.values()))
    out = kmeans(emb, k=n_labels, max_iter=10).collect()
    # majority-label purity per cluster
    from collections import Counter

    by_cluster: dict[int, Counter] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], Counter())[labels[r["id"]]] += 1
    agree = sum(c.most_common(1)[0][1] for c in by_cluster.values())
    purity = agree / len(out)
    assert purity > 1.5 / n_labels, purity
