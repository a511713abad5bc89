"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing — verified on the driver-generated testdata tables."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _py_tokens(text):
    import re

    return re.findall(r"[a-z0-9_]+", text.lower())


def _py_shingles(text, k=3):
    t = _py_tokens(text)
    return {" ".join(t[i : i + k]) for i in range(max(len(t) - k + 1, 1))} if len(t) >= k else set()


def test_exact_duplicates(spark, documents):
    from xapian_spark.ops.dedup import exact_duplicates

    out = exact_duplicates(documents, "doc_id", "text").collect()
    assert len(out) == documents.count()
    # group sizes consistent with a python groupby on normalized text
    texts = {r["doc_id"]: " ".join(_py_tokens(r["text"])) for r in documents.collect()}
    from collections import Counter

    sizes = Counter(texts.values())
    for r in out:
        assert r["group_size"] == sizes[texts[r["id"]]]


def test_ngram_jaccard_exact(spark, documents):
    from xapian_spark.ops.dedup import ngram_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            documents, "doc_id", "text", k=3, threshold=0.35
        ).collect()
    }
    # brute force on the driver
    rows = documents.collect()
    sh = {r["doc_id"]: _py_shingles(r["text"]) for r in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        sa, sb = sh[a], sh[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.35:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k_ in got:
        assert got[k_] == pytest.approx(want[k_], abs=1e-12)


def test_minhash_lsh_finds_near_dups(spark, documents):
    from xapian_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            documents, "doc_id", "text", k=3, threshold=0.6
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            documents, "doc_id", "text", num_hashes=32, bands=8,
            verify_threshold=0.6,
        ).collect()
    }
    # verified-LSH output must be a subset of exact pairs; recall high
    assert got.issubset(exact)
    if exact:
        assert len(got) / len(exact) >= 0.8


def test_simhash_near_pairs(spark, documents):
    from xapian_spark.ops.dedup import simhash_near_pairs

    rows = simhash_near_pairs(documents, "doc_id", "text", max_hamming=10).collect()
    for r in rows:
        assert 0 <= r["hamming"] <= 10
        assert r["id_a"] < r["id_b"]


def test_simhash_blocking_plan_scales():
    """Corpus-adaptive blocking: expected bucket size stays bounded as the
    corpus grows, and every plan keeps the pigeonhole completeness
    guarantee (any <= h corrupted blocks leave some table's key intact)."""
    import itertools as it
    import math

    from xapian_spark.ops.dedup import simhash_blocking_plan

    h = 3
    # small corpus degenerates to the classic 4 x 15-bit chunk split
    blocks, tables = simhash_blocking_plan(500, h)
    assert len(blocks) == h + 1
    assert tables == [(0,), (1,), (2,), (3,)]
    assert [hi - lo for lo, hi in blocks] == [15, 15, 15, 15]

    # simulated 10^9-doc corpus: key width must cover log2(N) so the
    # expected bucket size N / 2^width is O(1), not N / 32768
    n = 10 ** 9
    blocks, tables = simhash_blocking_plan(n, h)
    c = len(blocks)
    key_width = min(
        sum(blocks[b][1] - blocks[b][0] for b in subset)
        for subset in tables
    )
    assert key_width >= math.log2(n)
    assert n / 2 ** key_width <= 8.0  # bounded buckets at 10^9 docs
    assert len(tables) == math.comb(c, c - h)

    # pigeonhole completeness: for every way <= h blocks can be corrupted,
    # at least one table's key blocks are all intact
    for ncorr in range(h + 1):
        for corrupted in it.combinations(range(c), ncorr):
            assert any(
                not (set(subset) & set(corrupted)) for subset in tables
            )

    # block boundaries tile [0, 60) exactly
    assert blocks[0][0] == 0 and blocks[-1][1] == 60
    for (lo1, hi1), (lo2, hi2) in zip(blocks, blocks[1:]):
        assert hi1 == lo2


def test_embedding_near_dup_adaptive_planes(spark, embeddings):
    """Adaptive n_planes: every reported pair is exact-verified at the
    threshold, and reported pairs are a subset of the brute-force truth."""
    from xapian_spark.ops.similarity import embedding_near_dup_pairs

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            embeddings, threshold=0.4, n_tables=8
        ).collect()
    }
    data = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(data), 2):
        c = float(
            np.dot(data[a], data[b])
            / (np.linalg.norm(data[a]) * np.linalg.norm(data[b]))
        )
        if c >= 0.4:
            want[(a, b)] = c
    assert set(got).issubset(set(want))
    for pair, cos in got.items():
        assert cos == pytest.approx(want[pair], abs=1e-9)


def test_cosine_topk_exact(spark, embeddings):
    from xapian_spark.ops.similarity import cosine_topk

    queries = embeddings.where(F.col("vec_id") < 3)
    got = cosine_topk(embeddings, queries, k=5).collect()
    # numpy brute force
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embeddings.collect()}
    for qid in [0, 1, 2]:
        qv = data[qid]
        sims = {
            vid: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for vid, v in data.items()
            if vid != qid
        }
        want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        rows = sorted(
            [(r["neighbor_id"], r["cosine"]) for r in got if r["query_id"] == qid],
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert [w[0] for w in want] == [g[0] for g in rows]
        for (wid, ws), (gid, gs) in zip(want, rows):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_lsh_cosine_recall(spark, embeddings):
    from xapian_spark.ops.similarity import cosine_topk, lsh_cosine_topk

    queries = embeddings.where(F.col("vec_id") < 10)
    exact = cosine_topk(embeddings, queries, k=3).collect()
    approx = lsh_cosine_topk(
        embeddings, queries, k=3, n_planes=4, n_tables=12
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # approximate path must be sane


def test_lsh_multiprobe_improves_recall(spark, embeddings):
    """Hamming-1 multi-probe must capture a superset of the exact-bucket
    candidates (same planes/tables/seed) and strictly better recall vs the
    brute-force oracle on this corpus."""
    from xapian_spark.ops.similarity import cosine_topk, lsh_cosine_topk

    queries = embeddings.where(F.col("vec_id") < 10)
    exact_set = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, queries, k=5).collect()
    }

    def pairs(mp):
        # large k so the assertion sees raw candidate capture, not rank cuts
        df = lsh_cosine_topk(
            embeddings, queries, k=10_000,
            n_planes=6, n_tables=2, multiprobe=mp,
        )
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    single, multi = pairs(0), pairs(1)
    assert single <= multi  # exact bucket is always probed too
    r0 = len(exact_set & single) / len(exact_set)
    r1 = len(exact_set & multi) / len(exact_set)
    assert r1 > r0


def test_ivf_persisted_index(spark, embeddings, tmp_path):
    """build_ivf_index + ivf_search == ivf_cosine_topk (same deterministic
    k-means, same centroid expression), and the probe's parquet scan prunes
    on the cell partition column."""
    from xapian_spark.ops.similarity import (
        build_ivf_index,
        ivf_cosine_topk,
        ivf_search,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(embeddings, path, n_cells=4)
    queries = embeddings.where(F.col("vec_id") < 8)

    got = ivf_search(spark, path, queries, k=5, nprobe=2)
    want = ivf_cosine_topk(embeddings, queries, k=5, n_cells=4, nprobe=2)
    key = lambda r: (r["query_id"], r["nn_rank"])  # noqa: E731
    g, w = sorted(got.collect(), key=key), sorted(want.collect(), key=key)
    assert [(r["query_id"], r["neighbor_id"]) for r in g] == [
        (r["query_id"], r["neighbor_id"]) for r in w
    ]
    for a, b in zip(g, w):
        assert a["cosine"] == pytest.approx(b["cosine"], abs=1e-12)

    # partition pruning reaches the scan: the vectors read must carry a
    # PartitionFilters entry on `cell`, not scan all partitions
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
    assert m, f"no cell partition filter in:\n{plan}"


def test_token_count_and_quality(spark, documents):
    from xapian_spark.ops.textstats import quality_scores, token_count

    tc = {r["id"]: r["n_tokens"] for r in token_count(documents, "doc_id", "text").collect()}
    for r in documents.collect():
        assert tc[r["doc_id"]] == len(_py_tokens(r["text"]))
    q = quality_scores(documents, "doc_id", "text").collect()
    for r in q:
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["repetition_ratio"] < 1.0


def test_language_id(spark):
    from xapian_spark.ops.textstats import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house for it was"),
            (2, "der hund und die katze ist nicht ein tier mit"),
            (3, "le chat et la maison est pour les enfants de"),
            (4, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in language_id(df, "id", "text").collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_fingerprint_order_sensitive(spark):
    from xapian_spark.ops.textstats import fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma"), (4, "")],
        "id long, text string",
    )
    got = {r["id"]: r["fingerprint"] for r in fingerprint(df, "id", "text").collect()}
    assert got[1] == got[3]
    assert got[1] != got[2]
    assert got[4] == 0


def test_multimodal_plumbing(spark):
    from xapian_spark.ops.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=24)
    feats = extract_features(media, decode="fake", dim=8).collect()
    assert len(feats) == 24
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # determinism
    feats2 = extract_features(media, decode="fake", dim=8).collect()
    m1 = {r["media_id"]: r["feature"] for r in feats}
    m2 = {r["media_id"]: r["feature"] for r in feats2}
    assert m1 == m2
    # real decode of compressed mimes raises at the codec plug-in point
    with pytest.raises(Exception):
        extract_features(media, decode="real").collect()
    plan = frame_sample_plan(media, every_ms=5000)
    assert plan.count() > 0


def test_multimodal_codecs_roundtrip():
    """PPM/WAV/Y4M encode->decode identity (pure functions, no Spark)."""
    import numpy as np

    from xapian_spark.ops.multimodal import (
        decode_ppm,
        decode_wav,
        decode_y4m,
        encode_ppm,
        encode_wav,
        encode_y4m,
    )

    rgb = (np.arange(12 * 16 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    rgb = rgb.reshape(12, 16, 3)
    assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
    # header tolerance: comment + extra whitespace
    hdr = b"P6\n# a comment\n 16\t12\n255\n" + rgb.tobytes()
    assert (decode_ppm(hdr) == rgb).all()

    samples = (np.sin(np.arange(4000) / 10.0) * 20000).astype(np.int16)
    x, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and x.shape == (4000,)
    assert np.allclose(x, samples / 32768.0, atol=1e-6)

    frames = (np.arange(4 * 24 * 32, dtype=np.uint32) % 256).astype(np.uint8)
    frames = frames.reshape(4, 24, 32)
    got, fps = decode_y4m(encode_y4m(frames, fps=10))
    assert fps == 10 and (got == frames).all()


def test_png_codec_roundtrip():
    """Pure-stdlib PNG: every filter type, grey/RGB/RGBA, honest raises."""
    import numpy as np
    import pytest

    from xapian_spark.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    # each row filter type in isolation must unfilter exactly
    for ft in range(5):
        assert (decode_png(encode_png(rgb, filters=[ft])) == rgb).all()
    # default cycling filters; grey and RGBA shapes
    assert (decode_png(encode_png(rgb)) == rgb).all()
    grey = rng.integers(0, 256, (9, 21), dtype=np.uint8)
    assert (decode_png(encode_png(grey)) == grey).all()
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba).all()
    # 1-pixel edge case (Paeth/Sub with no left neighbour)
    one = np.array([[[250, 0, 7]]], dtype=np.uint8)
    assert (decode_png(encode_png(one, filters=[4])) == one).all()

    with pytest.raises(ValueError):
        decode_png(b"P6 not a png")
    # illegal depth/colour-type combination (spec table 11.1) raises:
    # forge depth=3 (never legal) into a valid payload's IHDR
    payload = bytearray(encode_png(grey))
    payload[8 + 8 + 8] = 3  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_png_full_baseline_decode():
    """Extended baseline decode: 16-bit, sub-8-bit grey, palette (+tRNS),
    grey+alpha, Adam7 interlace — streams hand-built per the PNG spec."""
    import zlib

    import numpy as np
    import pytest

    from xapian_spark.ops.multimodal import _ADAM7, _png_chunk, decode_png

    def png(w, h, depth, ctype, raw, interlace=0, extra=b""):
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([depth, ctype, 0, 0, interlace]))
        return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + extra
                + _png_chunk(b"IDAT", zlib.compress(raw))
                + _png_chunk(b"IEND", b""))

    def pack_rows(img2d, depth):
        """(h, w) sample values -> filter-0 scanlines, MSB-first packed."""
        out = bytearray()
        for row in img2d:
            bits = []
            for v in row:
                bits += [int(b) for b in format(int(v), f"0{depth}b")]
            while len(bits) % 8:
                bits.append(0)
            out += b"\x00" + np.packbits(
                np.array(bits, np.uint8)
            ).tobytes()
        return bytes(out)

    rng = np.random.default_rng(11)

    # -- 16-bit grey, filter 0 then a bytewise Up(2)-filtered row --------
    g16 = rng.integers(0, 1 << 16, (2, 4), dtype=np.uint16)
    r0 = g16[0].byteswap().tobytes()  # big-endian
    r1 = g16[1].byteswap().tobytes()
    up = bytes((c - p) % 256 for c, p in zip(r1, r0))
    assert (
        decode_png(png(4, 2, 16, 0, b"\x00" + r0 + b"\x02" + up))
        == (g16 >> 8).astype(np.uint8)
    ).all()

    # -- 16-bit RGB, Sub(1) filter with bpp=6 ----------------------------
    rgb16 = rng.integers(0, 1 << 16, (1, 3, 3), dtype=np.uint16)
    line = rgb16[0].byteswap().tobytes()
    sub = bytearray(line)
    for i in range(len(line) - 1, 5, -1):
        sub[i] = (line[i] - line[i - 6]) % 256
    assert (
        decode_png(png(3, 1, 16, 2, b"\x01" + bytes(sub)))
        == (rgb16 >> 8).astype(np.uint8)
    ).all()

    # -- sub-8-bit grey rescales to the spec's sample-max ----------------
    for depth, w in ((1, 9), (2, 3), (4, 5)):
        vals = rng.integers(0, 1 << depth, (3, w), dtype=np.uint8)
        got = decode_png(png(w, 3, depth, 0, pack_rows(vals, depth)))
        assert (got == vals.astype(np.uint16) * 255
                // ((1 << depth) - 1)).all()

    # -- 4-bit palette, with and without tRNS alpha ----------------------
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, (2, 5), dtype=np.uint8)
    plte = _png_chunk(b"PLTE", pal.tobytes())
    got = decode_png(png(5, 2, 4, 3, pack_rows(idx, 4), extra=plte))
    assert (got == pal[idx]).all()
    trns = _png_chunk(b"tRNS", bytes([10, 20, 30]))
    got = decode_png(
        png(5, 2, 4, 3, pack_rows(idx, 4), extra=plte + trns)
    )
    alpha = np.array([10, 20, 30, 255, 255, 255], np.uint8)
    assert got.shape == (2, 5, 4)
    assert (got[:, :, :3] == pal[idx]).all()
    assert (got[:, :, 3] == alpha[idx]).all()
    # palette index beyond PLTE raises
    with pytest.raises(ValueError):
        decode_png(png(5, 2, 4, 3, pack_rows(idx + 10, 4), extra=plte))

    # -- grey+alpha (colour type 4) --------------------------------------
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[r].tobytes() for r in range(3))
    assert (decode_png(png(4, 3, 8, 4, raw)) == ga).all()

    # -- Adam7: 3x3 grey with the pass stream written out BY HAND --------
    raw = (b"\x00\x01" + b"\x00\x03" + b"\x00\x07\x09"
           + b"\x00\x02" + b"\x00\x08" + b"\x00\x04\x05\x06")
    expect = np.arange(1, 10, dtype=np.uint8).reshape(3, 3)
    assert (decode_png(png(3, 3, 8, 0, raw, interlace=1)) == expect).all()

    # -- Adam7: random RGB via a spec-grid interlacer --------------------
    img = rng.integers(0, 256, (10, 11, 3), dtype=np.uint8)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx, :]
        if sub.shape[0] and sub.shape[1]:
            for r in range(sub.shape[0]):
                out += b"\x00" + sub[r].tobytes()
    assert (
        decode_png(png(11, 10, 8, 2, bytes(out), interlace=1)) == img
    ).all()

    # -- Adam7 x sub-byte: 1-bit 5x5 (per-pass bit-padding interaction) --
    bits = rng.integers(0, 2, (5, 5), dtype=np.uint8)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = bits[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            out += pack_rows(sub, 1)
    got = decode_png(png(5, 5, 1, 0, bytes(out), interlace=1))
    assert (got == bits * 255).all()


def test_multimodal_real_decode(spark):
    """decode='real' end-to-end over genuine PPM/WAV/Y4M payloads."""
    from xapian_spark.ops.multimodal import (
        extract_features,
        resize_images,
        sample_frames,
        synth_real_media,
    )

    media = synth_real_media(spark, n=18)
    feats = extract_features(media, decode="real", dim=12).collect()
    assert len(feats) == 18
    by_kind = {}
    for r in feats:
        assert len(r["feature"]) == 12
        by_kind.setdefault(r["kind"], r["feature"])
    assert set(by_kind) == {"image", "audio", "video"}
    # audio: rms of a 0.5-amplitude sine is ~0.35; image: gradient means ~0.5
    assert 0.2 < by_kind["audio"][0] < 0.5
    assert 0.3 < by_kind["image"][0] < 0.7
    # determinism
    feats2 = extract_features(media, decode="real", dim=12).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in feats2
    }

    thumbs = resize_images(media, out_w=4, out_h=4).collect()
    assert len(thumbs) == 6  # one per image row
    from xapian_spark.ops.multimodal import decode_ppm

    for t in thumbs:
        assert decode_ppm(bytes(t["payload"])).shape == (4, 4, 3)

    frames = sample_frames(media, every_ms=200).collect()
    assert frames
    vids = media.where("kind = 'video'").count()
    assert len({f["media_id"] for f in frames}) == vids
    for f in frames:
        assert bytes(f["payload"])[:2] == b"P5"
        assert 0.0 <= f["y_mean"] <= 1.0


def test_ivf_exhaustive_probe_equals_exact(spark, embeddings):
    from xapian_spark.ops.similarity import cosine_topk, ivf_cosine_topk

    queries = embeddings.where(F.col("vec_id") < 3)
    exact = cosine_topk(embeddings, queries, k=3).collect()
    # nprobe == n_cells probes every cell -> must equal brute force
    full = ivf_cosine_topk(
        embeddings, queries, k=3, n_cells=4, nprobe=4
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["nn_rank"], r["neighbor_id"]) for r in rows
    )
    assert key(full) == key(exact)


def test_ivf_partial_probe_recall(spark, embeddings):
    from xapian_spark.ops.similarity import cosine_topk, ivf_cosine_topk

    queries = embeddings.where(F.col("vec_id") < 5)
    exact = cosine_topk(embeddings, queries, k=3).collect()
    approx = ivf_cosine_topk(
        embeddings, queries, k=3, n_cells=8, nprobe=4
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # half the cells probed
    # every query still gets k results
    from collections import Counter

    per_q = Counter(r["query_id"] for r in approx)
    assert all(v == 3 for v in per_q.values())


def test_bpe_token_count(spark):
    """BPE-ish pre-token count (GPT-2-style pre-split): hand-checked
    goldens; whitespace runs excluded, leading space folds into tokens."""
    from xapian_spark.ops.textstats import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "Hello world, it's 2024!"),
            (2, ""),
            (3, "   "),
            (4, "don't stop—ever"),
            (5, "a  b"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
        for r in bpe_token_count(df, "id", "text").collect()
    }
    # 1: Hello | ' world' | ',' | ' it' | ''s' | ' 2024' | '!'
    assert got == {1: (7, 4), 2: (0, 0), 3: (0, 0), 4: (5, 2), 5: (2, 2)}


def test_duplicate_components(spark):
    """Connected components over a near-dup pair graph (min-label
    propagation with per-round lineage truncation): chains merge across
    transitive pairs, singletons in the pair table keep themselves, and
    a too-small iteration cap raises instead of silently mislabeling."""
    from xapian_spark.ops.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"]
        for r in duplicate_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # a 5-node chain needs ~3 rounds; cap 1 must raise, not mislabel
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        duplicate_components(pairs, max_iterations=1)


def test_duplicate_spans(spark):
    """Exact-substring coverage: docs sharing a verbatim token run are
    flagged proportionally; unique docs score 0 (ops/dedup.py)."""
    from xapian_spark.ops.dedup import duplicate_spans

    shared = " ".join(f"tok{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one two three four five"),
            (2, shared + " other tail entirely different here now"),
            (3, " ".join(f"solo{i}" for i in range(40))),
            (4, "short text"),  # under the window: no rows
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in duplicate_spans(
            docs, "id", "text", window=10, stride=5
        ).collect()
    }
    assert 4 not in out
    assert out[3] == (7, 0, 0.0)
    # the 25 shared tokens cover windows at offsets 0,5,10,15 (4 of 5)
    assert out[1] == (5, 4, 0.8) and out[2] == (5, 4, 0.8)
