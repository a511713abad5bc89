"""Baseline JPEG codec tests (ops/jpeg.py).

Three independent verification angles, since the container ships no
reference codec to diff against:

1. the 2-D DCT/IDCT pair vs a naive O(N^4) evaluation of the published
   T.81 A.3.3 formulas;
2. BYTE-EXACT round-trips for flat-tile grayscale images with unit quant
   tables (flat blocks are DC-only; DC = 8*(v-128) is an integer, so
   quantization by 1 is lossless) — this pins the entire Huffman /
   bitstream / zigzag / predictor / restart-marker path to the last bit;
3. PSNR floors for natural gradients with the Annex K tables, including
   4:2:0 subsampling, odd dimensions and restart intervals.
"""

from __future__ import annotations

import numpy as np
import pytest

from xapian_spark.ops import jpeg


def naive_dct(f: np.ndarray) -> np.ndarray:
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


class TestDct:
    def test_matches_naive_t81_formula(self):
        rng = np.random.default_rng(7)
        for _ in range(3):
            block = rng.random((8, 8)) * 255 - 128
            assert np.abs(jpeg.dct2(block) - naive_dct(block)).max() < 1e-9

    def test_idct_inverts_dct(self):
        rng = np.random.default_rng(8)
        block = rng.random((8, 8)) * 255 - 128
        assert np.abs(jpeg.idct2(jpeg.dct2(block)) - block).max() < 1e-9


class TestHuffman:
    def test_canonical_codes_are_prefix_free(self):
        for spec in (jpeg.DC_LUMA_SPEC, jpeg.DC_CHROMA_SPEC,
                     jpeg.AC_LUMA_SPEC, jpeg.AC_CHROMA_SPEC):
            codes = jpeg._canonical_codes(*spec)
            assert len(codes) == sum(spec[0])
            bitstrings = {
                format(code, f"0{ln}b") for code, ln in codes.values()
            }
            assert len(bitstrings) == len(codes)
            for a in bitstrings:
                for b in bitstrings:
                    if a != b:
                        assert not b.startswith(a)

    def test_ac_alphabets_cover_all_run_sizes(self):
        # every (run 0-15, size 1-10) + EOB + ZRL the encoder can emit
        for spec in (jpeg.AC_LUMA_SPEC, jpeg.AC_CHROMA_SPEC):
            syms = set(spec[1])
            assert 0x00 in syms and 0xF0 in syms
            for run in range(16):
                for size in range(1, 11):
                    assert (run << 4) | size in syms


class TestByteExact:
    def test_flat_tiles_roundtrip_exactly(self):
        # fixture rotation: i%4==2 progressive SOF2; odd i baseline with
        # restart_interval=2 (RST resync + DC predictor reset); rest plain
        # baseline — all under the same exactness check
        for i in range(8):
            img = jpeg.flat_tile_image(i)
            payload = jpeg.encode_flat_tile_jpeg(i)
            assert (b"\xff\xc2" in payload) == (i % 4 == 2), i
            dec = jpeg.decode_jpeg(payload)
            assert dec.shape == img.shape
            assert np.array_equal(dec, img), f"fixture {i} not byte-exact"

    def test_flat_rgb_unit_tables_exact(self):
        flat = np.full((16, 24, 3), (200, 30, 99), np.uint8)
        dec = jpeg.decode_jpeg(
            jpeg.encode_jpeg(flat, qtables=(jpeg.UNIT_QT, jpeg.UNIT_QT))
        )
        # unit tables + flat planes: the only lossy step is the YCbCr
        # round-trip, which is exact for this color and never off by >1
        assert np.abs(dec.astype(int) - flat.astype(int)).max() <= 1


class TestLossy:
    def test_decode_matches_direct_dequant(self):
        """One 8x8 grey block: decode(encode(x)) must equal the direct
        quantize -> dequantize -> IDCT round trip EXACTLY.  Unit-quant
        byte-exact tests can't see a dequantization INDEX mismatch (all
        entries equal) and PSNR floors can be too loose — this pins the
        zigzag<->raster pairing of coefficient and table entry."""
        rng = np.random.default_rng(3)
        img = np.clip(rng.normal(128, 40, (8, 8)), 0, 255).astype(np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=50))
        qt = jpeg._scale_qtable(jpeg.QTABLE_LUMA, 50).reshape(8, 8)
        q = np.round(jpeg.dct2(img.astype(np.float64) - 128.0) / qt)
        rec = np.clip(
            np.round(jpeg.idct2(q * qt) + 128.0), 0, 255
        ).astype(np.uint8)
        assert (dec == rec).all()

    def _gradient(self, h: int, w: int) -> np.ndarray:
        yy, xx = np.indices((h, w))
        return (
            xx * 255 // max(w - 1, 1) // 2 + yy * 255 // max(h - 1, 1) // 2
        ).astype(np.uint8)

    def test_gray_gradient_psnr(self):
        g = self._gradient(40, 56)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
        assert dec.shape == g.shape
        assert psnr(dec, g) > 50  # measures ~53.7; a dequant-index bug costs >10 dB

    def test_rgb_444_gradient_psnr(self):
        yy, xx = np.indices((40, 56))
        img = np.stack(
            [xx * 255 // 55, yy * 255 // 39, np.full_like(xx, 77)], -1
        ).astype(np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert psnr(dec, img) > 44  # measures ~47.5

    def test_rgb_420_subsampled_psnr(self):
        yy, xx = np.indices((40, 56))
        img = np.stack(
            [xx * 255 // 55, yy * 255 // 39, np.full_like(xx, 77)], -1
        ).astype(np.uint8)
        dec = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=90, subsample="420")
        )
        assert dec.shape == img.shape
        assert psnr(dec, img) > 38  # measures ~41.1 (chroma subsampling loss)

    def test_odd_dimensions(self):
        # non-multiple-of-8 frame: edge padding + crop must line up.
        # quality=100 scales every Annex K entry to 1, so the only loss is
        # coefficient rounding — exactness here pins the padding geometry
        # (at q95 the hard step edges of this gradient ring to ~26 dB,
        # which is the quantizer working as designed, not a codec bug)
        g = self._gradient(19, 13)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=100))
        assert dec.shape == (19, 13)
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 1

    def test_restart_interval_matches_no_restart(self):
        g = self._gradient(48, 48)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=85))
        rst = jpeg.decode_jpeg(
            jpeg.encode_jpeg(g, quality=85, restart_interval=1)
        )
        # identical quantized coefficients; restart only changes framing
        assert np.array_equal(plain, rst)


class TestProgressive:
    """SOF2 progressive (T.81 Annex G): the progressive encoder quantizes
    identically to the baseline one, so both streams must decode to
    IDENTICAL pixels — any entropy/successive-approximation bug breaks
    the equality."""

    def _match(self, img, quality):
        b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
        p = jpeg.decode_jpeg(
            jpeg.encode_progressive_jpeg(img, quality=quality)
        )
        assert b.shape == p.shape
        assert (b == p).all()

    def test_gray_matches_baseline(self):
        rng = np.random.default_rng(5)
        g = np.clip(rng.normal(128, 45, (24, 40)), 0, 255).astype(np.uint8)
        self._match(g, 60)

    def test_rgb_matches_baseline(self):
        rng = np.random.default_rng(7)
        img = np.clip(rng.normal(128, 50, (17, 30, 3)), 0, 255).astype(
            np.uint8
        )
        self._match(img, 85)

    def test_flat_image_long_eob_runs(self):
        # every AC band empty -> the whole scan is one EOBn run
        self._match(np.full((32, 48), 200, np.uint8), 70)

    def test_sparse_high_frequency(self):
        # sharp lines: long zero runs (ZRL), isolated ACs, refinement
        yy, xx = np.indices((40, 64))
        self._match(((xx % 16 == 0) * 255).astype(np.uint8), 70)

    def test_odd_dimensions(self):
        rng = np.random.default_rng(1)
        g = np.clip(rng.normal(128, 40, (13, 21)), 0, 255).astype(np.uint8)
        self._match(g, 70)

    def test_eobn_runs_actually_exercised(self, monkeypatch):
        """Guard against the encoder degenerating to EOB0-per-block,
        which would leave the decoder's run>1 path untested."""
        seen = {"eobn": 0}
        orig = jpeg._flush_eobrun

        def spy(bw, ac_codes, state):
            if state["eobrun"] > 1:
                seen["eobn"] += 1
            orig(bw, ac_codes, state)

        monkeypatch.setattr(jpeg, "_flush_eobrun", spy)
        jpeg.encode_progressive_jpeg(np.full((32, 48), 200, np.uint8))
        assert seen["eobn"] > 0

    def test_stream_structure(self):
        payload = jpeg.encode_progressive_jpeg(
            np.full((16, 16), 99, np.uint8)
        )
        assert b"\xff\xc2" in payload  # SOF2
        assert payload.count(b"\xff\xda") >= 6  # one SOS per scan

    def test_hand_written_bitstream(self):
        """Decoder pinned against a BY-HAND progressive stream (unit
        quant table, one block, DC scan + AC first pass at Al=1 + AC
        refinement at Al=0), independent of our own encoder.

        Target zigzag coefficients: DC=0, k1=+3, k2=-2.  First AC pass
        codes 3>>1=1 and |-2|>>1=1; the refinement pass transmits the
        two correction bits (3&1=1, 2&1=0) riding behind an EOB0."""
        unit = np.ones(64, np.int32)
        # DC table: single symbol 0 (size category 0) at code length 1
        dht_dc = jpeg._dht_segment(0, 0, ([1] + [0] * 15, [0]))
        # AC pass-1 table: {EOB0=0x00, r0s1=0x01} at length 2
        dht_ac1 = jpeg._dht_segment(1, 0, ([0, 2] + [0] * 14, [0x00, 0x01]))
        # AC refine table: {EOB0} at length 1
        dht_ac2 = jpeg._dht_segment(1, 0, ([1] + [0] * 15, [0x00]))
        sof = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
        payload = (
            b"\xff\xd8"
            + jpeg._dqt_segment(0, unit)
            + b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof
            + dht_dc
            # DC first scan: size-0 symbol "0", 1-padded -> 0x7F
            + b"\xff\xda\x00\x08" + bytes([1, 1, 0x00, 0, 0, 0x00])
            + b"\x7f"
            # AC first, Ss=1 Se=63 Al=1: "01 1 01 0 00" -> 0x68
            + dht_ac1
            + b"\xff\xda\x00\x08" + bytes([1, 1, 0x10, 1, 63, 0x01])
            + b"\x68"
            # AC refine, Ah=1 Al=0: EOB0 "0" + bits 1,0 -> 0x5F
            + dht_ac2
            + b"\xff\xda\x00\x08" + bytes([1, 1, 0x10, 1, 63, 0x10])
            + b"\x5f"
            + b"\xff\xd9"
        )
        got = jpeg.decode_jpeg(payload)
        coef = np.zeros((8, 8))
        coef[0, 1] = 3.0   # zigzag k=1
        coef[1, 0] = -2.0  # zigzag k=2
        want = np.clip(
            np.round(jpeg.idct2(coef) + 128.0), 0, 255
        ).astype(np.uint8)
        assert (got == want).all()


class TestHonestScope:
    def test_arithmetic_coding_raises(self):
        # SOF9 = extended sequential, arithmetic coding
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(b"\xff\xd8\xff\xc9\x00\x0b" + bytes(9))

    def test_non_jpeg_rejected(self):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_16bit_quant_tables_raise(self):
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(
                b"\xff\xd8\xff\xdb\x00\x84" + b"\x10" + bytes(129)
            )


class TestMultimodalIntegration:
    def test_pixel_sums_match_closed_form(self, spark):
        from xapian_spark.ops import multimodal

        media = multimodal.synth_jpeg_media(spark, n=8)
        got = {
            r["media_id"]: (r["n_raw"], r["sum_r"], r["sum_g"], r["sum_b"])
            for r in multimodal.image_pixel_sums(media).collect()
        }
        assert len(got) == 8
        for i in range(8):
            txn, tyn = 2 + i % 3, 1 + i % 4
            s = sum(
                64 * ((42 + 13 * i + 29 * ty + 53 * tx) % 256)
                for ty in range(tyn)
                for tx in range(txn)
            )
            assert got[i] == (8 * txn * 8 * tyn * 3, s, s, s)

    def test_real_feature_and_resize_accept_jpeg(self, spark):
        from xapian_spark.ops import multimodal

        media = multimodal.synth_jpeg_media(spark, n=3)
        feats = multimodal.extract_features(media, decode="real").collect()
        assert len(feats) == 3
        assert all(len(r["feature"]) == 16 for r in feats)
        thumbs = multimodal.resize_images(media, 8, 8).collect()
        assert len(thumbs) == 3
        for t in thumbs:
            img = multimodal.decode_ppm(bytes(t["payload"]))
            assert img.shape == (8, 8, 3)
