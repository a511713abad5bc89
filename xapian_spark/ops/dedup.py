"""Deduplication operators for large-scale corpus pipelines.

All hashing is engine-portable (md5-derived) so the exact variants can be
verified against an ANSI-SQL oracle; the approximate variants (MinHash-LSH,
SimHash) are verified in pytest against exact Jaccard instead.

Scale notes (the point of each design):

- exact_duplicates: one groupBy on a 256-bit digest — no skew (digests are
  uniform), fully map-side combinable.
- ngram_jaccard_pairs: NEVER builds the doc x doc cross product.  Candidate
  pairs come from co-occurring shingles (an inverted index over shingles —
  same shuffle shape as the text index build), so cost scales with shared
  shingles, not docs^2.  Hot shingles (boilerplate) are capped with a
  max-postings-per-shingle guard — the dedup analogue of stopword salting.
- minhash_lsh: signature = H independent min-hashes; banding turns
  near-duplicate search into an equality groupBy on (band, band_hash) —
  pure shuffle, no pairwise work until verification.
- simhash: 64-bit fingerprints; near-pairs by Hamming distance via
  4x16-bit chunk blocking (a pair within distance d<=3 shares at least one
  chunk), again equality-join shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col):
    return F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9_]+', 0)")


def _shingles(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct k-gram token shingles."""
    toks = df.withColumn("_toks", _tokens(text_col))
    n = F.size("_toks")
    return (
        toks.withColumn(
            "_idx", F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        )
        .withColumn("_i", F.explode("_idx"))
        .where(n >= k)
        .withColumn(
            "shingle",
            F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, k)),
        )
        .select("id", "shingle")
        .distinct()
    )


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Exact-duplicate groups: (id, dup_key, group_size, is_canonical).

    normalized=True dedups on the token sequence (whitespace/punct
    insensitive) rather than raw bytes.
    """
    key = (
        F.sha2(F.concat_ws(" ", _tokens(text_col)), 256)
        if normalized
        else F.sha2(F.col(text_col), 256)
    )
    keyed = df.select(F.col(id_col).alias("id"), key.alias("dup_key"))
    w = Window.partitionBy("dup_key")
    worder = Window.partitionBy("dup_key").orderBy("id")
    return (
        keyed.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(worder))
        .withColumn("is_canonical", F.col("rn") == 1)
        .drop("rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >= t).

    Inverted-index join on shingles; |A intersect B| from co-occurrence
    counts, |A union B| = |A| + |B| - |A intersect B|.
    """
    ids = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    sh = _shingles(ids.withColumnRenamed("_t", "text"), "text", k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # Guard against boilerplate shingles exploding the join (skew cap).
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sh_f = sh.join(
        F.broadcast(freq.where(F.col("df") > max_shingle_freq)),
        "shingle",
        "left_anti",
    )
    pairs = (
        sh_f.alias("a")
        .join(sh_f.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # sizes is one row per doc — do NOT force a broadcast (at corpus scale
    # it doesn't fit); let AQE pick broadcast vs shuffle by actual size.
    return (
        pairs.join(
            sizes.withColumnRenamed("n_shingles", "na").withColumnRenamed("id", "id_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("n_shingles", "nb").withColumnRenamed("id", "id_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(id, sig array<string>): per-seed minimum of md5(seed || shingle).

    md5 hex strings compare lexicographically == numerically (fixed width),
    and md5 is identical everywhere — portable and deterministic.
    """
    ids = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    sh = _shingles(ids, "text", k)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash + LSH banding candidate pairs, optionally verified.

    bands must divide num_hashes; rows_per_band = num_hashes // bands.
    Returns (id_a, id_b, est_jaccard) where est_jaccard is the signature
    agreement rate; if verify_threshold is set, pairs are verified with
    exact Jaccard and filtered.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k)
    band_rows = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.sha2(
                            F.concat_ws(
                                "|", *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                            ),
                            256,
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # est_jaccard = fraction of agreeing signature slots
    est = cand.withColumn(
        "est_jaccard",
        F.expr("size(filter(arrays_zip(sig_a, sig_b), x -> x.sig_a = x.sig_b))")
        / F.lit(float(num_hashes)),
    ).select("id_a", "id_b", "est_jaccard")

    if verify_threshold is None:
        return est
    # Exact-Jaccard verify for CANDIDATES ONLY (the whole point of LSH):
    # join the candidate pairs back to the per-doc shingle postings and
    # count matching shingles per pair — work is |candidates| x shingles
    # per doc, never the full co-occurring-pair table.  Same shape as
    # similarity.embedding_near_dup_pairs' exact-cosine verify.
    ids = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    sh = _shingles(ids, "text", k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a_sh = est.select("id_a", "id_b").join(
        sh.withColumnRenamed("id", "id_a"), "id_a"
    )
    inter = (
        a_sh.join(
            sh.select(F.col("id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        est.join(inter, ["id_a", "id_b"])
        .join(
            sizes.select(
                F.col("id").alias("id_a"), F.col("n_shingles").alias("na")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col("id").alias("id_b"), F.col("n_shingles").alias("nb")
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over tokens: (id, simhash long).

    Per-token 64-bit hash from md5 (first 16 hex chars); each bit votes
    +wdf/-wdf; fingerprint bit = sign of the vote.  Pure column expressions.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(text_col)).alias("tok"),
    ).groupBy("id", "tok").agg(F.count(F.lit(1)).alias("wdf"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("decimal(20,0)").cast("long")
    toks = toks.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("wdf"))
            .otherwise(-F.col("wdf"))
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = toks.groupBy("id").agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(60):
        fp = fp + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("id", fp.alias("simhash"))


def simhash_blocking_plan(
    n_docs: int, max_hamming: int, nbits: int = 60, max_blocks: int = 12
) -> tuple[list[tuple[int, int]], list[tuple[int, ...]]]:
    """Corpus-adaptive multi-table blocking plan (Manku/Jain/Das Sarma,
    "Detecting Near-Duplicates for Web Crawling", WWW 2007).

    Split the fingerprint into c blocks; a pair within Hamming distance h
    touches at most h blocks, so some (c - h)-subset of blocks agrees
    (pigeonhole) — one table per (c - h)-subset, keyed on those blocks'
    bits, finds every such pair.  c is the smallest block count whose key
    width nbits*(c-h)/c covers log2(N) + margin: expected bucket size stays
    O(1) as the corpus grows, instead of N/2^15 going quadratic per bucket.
    Returns ([(lo, hi) block bit-ranges], [(block indices) per table]).
    """
    import math
    from itertools import combinations

    h = max_hamming
    target_bits = min(
        nbits - h - 1, math.ceil(math.log2(max(n_docs, 2))) + 6
    )
    c = h + 1
    while c < max_blocks and nbits * (c - h) // c < target_bits:
        c += 1
    bounds = [round(i * nbits / c) for i in range(c + 1)]
    blocks = [(bounds[i], bounds[i + 1]) for i in range(c)]
    tables = list(combinations(range(c), c - h))
    return blocks, tables


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, multi-table blocked.

    Blocking is corpus-adaptive (see simhash_blocking_plan): at small N it
    degenerates to the classic 4 x 15-bit chunk split; at 10^9 docs it
    widens keys to ~37 bits across C(8,5)=56 tables so per-bucket candidate
    generation never goes quadratic.  The OUTPUT is blocking-independent —
    pigeonhole completeness means every pair within max_hamming is found
    regardless of c — only the candidate volume changes.  Exact popcount
    verify on candidates.
    """
    fps = simhash64(df, id_col, text_col)
    if n_docs is None:
        n_docs = df.count()
    blocks, tables = simhash_blocking_plan(n_docs, max_hamming)
    table_exprs = []
    for ti, subset in enumerate(tables):
        key = F.lit(0).cast("long")
        shift = 0
        for bi in subset:
            lo, hi = blocks[bi]
            width = hi - lo
            val = (
                F.shiftright(F.col("simhash"), lo)
                .bitwiseAND(F.lit((1 << width) - 1))
                .cast("long")
            )
            key = key + F.shiftleft(val, shift)
            shift += width
        table_exprs.append(
            F.struct(F.lit(ti).alias("tbl"), key.alias("val"))
        )
    keyed = fps.select(
        "id", "simhash", F.explode(F.array(*table_exprs)).alias("cv")
    ).select(
        "id", "simhash",
        F.col("cv.tbl").alias("tbl"), F.col("cv.val").alias("val"),
    )
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["tbl", "val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("fa"),
            F.col("b.simhash").alias("fb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_components(pairs: DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b",
                         max_iterations: int = 25) -> DataFrame:
    """(id, component) duplicate-group labels from a near-duplicate pair
    table — the step after pair generation that turns pairwise evidence
    into keep-one-per-group decisions.  component = min docid reachable
    in the pair graph.

    Spark shape: min-label propagation ("hash-to-min") — per iteration one
    join of labels to the (bidirectional) edge list and one min-groupBy,
    both shuffles on uniform ids.  Rounds needed = graph diameter, which
    for dedup graphs is tiny (LSH/Jaccard pairs form near-cliques, not
    paths); the driver holds only an 8-byte convergence checksum per round,
    and lineage is truncated per round with localCheckpoint so a 10^9-edge
    run never builds a deep plan.  Stops early on convergence; raises if
    max_iterations rounds don't converge (pathological chain graphs —
    raise the cap, or pre-cluster with banding)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    try:
        prev_sum = None
        for _ in range(max_iterations):
            nbr_min = (
                edges.join(
                    labels.withColumnRenamed("id", "dst"), "dst"
                )
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
                .withColumnRenamed("src", "id")
            )
            labels = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        "component",
                        F.coalesce("nbr_component", "component"),
                    ).alias("component"),
                )
                .localCheckpoint()  # truncate lineage each round
            )
            # convergence: the label multiset is non-increasing per id, so
            # an unchanged sum means a fixed point (one tiny agg job)
            cur = labels.agg(F.sum("component")).collect()[0][0]
            if cur == prev_sum:
                return labels
            prev_sum = cur
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the cap)"
        )
    finally:
        edges.unpersist()


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    window: int = 20, stride: int = 10,
                    min_docs: int = 2) -> DataFrame:
    """Per-document exact-substring duplication coverage: which fraction
    of a document's token windows also occurs verbatim in >= min_docs-1
    OTHER documents.  The filter signal for boilerplate / license blocks /
    copy-paste contamination that pair-level dedup misses (a doc can be
    30% duplicated without any single near-duplicate partner).

    Output: (id, n_windows, n_dup_windows, dup_ratio).

    Scale shape: windows are md5-hashed (uniform 128-bit keys — skew-free
    groupBy); the repeated-window set comes from one count-distinct-docs
    aggregation over (window_hash, id); no docs x docs work anywhere.
    `stride` trades recall for cost: stride == window is disjoint
    windows, stride 1 is every offset (the exact-substring limit)."""
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        _tokens(text_col).alias("_toks"),
    )
    n = F.size("_toks")
    wins = (
        toks.where(n >= window)
        .withColumn(
            "_i",
            F.explode(
                F.sequence(F.lit(0), n - window, F.lit(stride))
            ),
        )
        .select(
            "id",
            F.md5(
                F.concat_ws(
                    " ", F.slice("_toks", F.col("_i") + 1, window)
                )
            ).alias("whash"),
        )
    )
    per_doc_windows = wins.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    # windows occurring in >= min_docs distinct docs (count per doc once)
    shared = (
        wins.distinct()
        .groupBy("whash")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("whash")
    )
    dup_per_doc = (
        wins.join(shared, "whash", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        per_doc_windows.join(dup_per_doc, "id", "left")
        .select(
            "id",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup_windows", F.lit(0))
                / F.col("n_windows"), 6
            ).alias("dup_ratio"),
        )
    )
