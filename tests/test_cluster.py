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


# ---------------------------------------------------------------------------
# LCD clusterer (cluster/lcd_clusterer.cc)
# ---------------------------------------------------------------------------


def _mset_df(spark, rows):
    return spark.createDataFrame(
        rows, "docid long, score double, vec array<double>"
    )


def test_lcd_sizes_and_top_doc(spark):
    from xapian_spark.ops.cluster import lcd_cluster

    # 10 docs, k=3: n = 3 - 10 % 3 = 2 small clusters of x-1=3, one of x=4
    rows = [
        (i, 10.0 - i, [float(i % 4 == j) for j in range(4)])
        for i in range(10)
    ]
    out = lcd_cluster(_mset_df(spark, rows), k=3).collect()
    assert len(out) == 10
    sizes = {}
    by_doc = {}
    for r in out:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
        by_doc[r["docid"]] = r["cluster"]
    # lcd_clusterer.cc:96-101: first n clusters x-1 points, rest x
    assert sizes == {1: 3, 2: 3, 3: 4}
    # first center is the highest-weight result -> cluster 1
    assert by_doc[0] == 1


def test_lcd_nearest_grouping_and_farthest_center(spark):
    from xapian_spark.ops.cluster import lcd_cluster

    # two orthogonal direction groups; top doc points along e0, so
    # cluster 1 must be the e0-aligned docs and the next center is from
    # the orthogonal group (the farthest point)
    rows = [
        (1, 9.0, [1.0, 0.0]),
        (2, 8.0, [0.0, 1.0]),
        (3, 7.0, [2.0, 0.0]),
        (4, 6.0, [0.0, 3.0]),
        (5, 5.0, [5.0, 0.1]),
        (6, 4.0, [0.1, 5.0]),
    ]
    out = {r["docid"]: r["cluster"] for r in
           lcd_cluster(_mset_df(spark, rows), k=2).collect()}
    assert out[1] == out[3] == out[5] == 1
    assert out[2] == out[4] == out[6] == 2


def test_lcd_k_clamps_and_validates(spark):
    import pytest as _pytest

    from xapian_spark.ops.cluster import lcd_cluster

    rows = [(i, float(10 - i), [1.0, float(i)]) for i in range(3)]
    # k >= size -> k_ = size: singletons
    out = lcd_cluster(_mset_df(spark, rows), k=7).collect()
    assert sorted(r["cluster"] for r in out) == [1, 2, 3]
    with _pytest.raises(ValueError):
        lcd_cluster(_mset_df(spark, rows), k=0)
    assert lcd_cluster(_mset_df(spark, []), k=2).count() == 0


def test_lcd_zero_magnitude_quirk_and_determinism(spark):
    from xapian_spark.ops.cluster import lcd_cluster

    # cosine_sim.cc:47-48: zero-magnitude vector -> similarity 0.0, which
    # sorts NEAREST, so the zero vector joins the first cluster
    rows = [
        (1, 9.0, [1.0, 0.0]),
        (2, 8.0, [0.0, 0.0]),
        (3, 7.0, [-1.0, 0.0]),  # distance 2 from center: farthest
        (4, 6.0, [0.9, 0.1]),
    ]
    a = {r["docid"]: r["cluster"] for r in
         lcd_cluster(_mset_df(spark, rows), k=2).collect()}
    assert a[1] == 1 and a[2] == 1
    assert a[3] == 2  # farthest became the second center
    b = {r["docid"]: r["cluster"] for r in
         lcd_cluster(_mset_df(spark, rows), k=2).collect()}
    assert a == b
