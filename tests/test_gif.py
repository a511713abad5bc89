"""GIF codec (ops/gif.py): LZW, interlace, animation/disposal, and the
Spark pixel-sum plumbing over the driver fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from xapian_spark.ops import gif, multimodal

PAL4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
)
PAL256 = (np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) * 7 + 3) % 256


class TestLZW:
    def test_roundtrip_width_growth_and_reset(self):
        # 120k symbols over 256 roots: width walks 9->12 and the table
        # hits 4096 several times, forcing Clear-code resets
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, 120_000, dtype=np.int64)
        out = gif.lzw_decode(gif.lzw_encode(data, 8), 8)
        assert np.array_equal(np.array(out), data)

    def test_kwkwk_case(self):
        # runs of one symbol make the decoder receive code == len(table)
        data = [1] * 40 + [2] * 40 + [1, 2] * 40
        assert gif.lzw_decode(gif.lzw_encode(data, 2), 2) == data

    def test_missing_eoi_tolerated(self):
        enc = gif.lzw_encode([0, 1, 2, 3], 2)
        # strip trailing bytes until the EOI is gone; decode still yields
        # a prefix instead of raising (files in the wild do this)
        out = gif.lzw_decode(enc[:-1], 2)
        assert out == [0, 1, 2, 3][: len(out)]


class TestRoundTrip:
    def test_random_256_colors(self):
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 256, (60, 90), dtype=np.uint8)
        frames, _ = gif.decode_gif(gif.encode_gif([idx], PAL256))
        assert np.array_equal(frames[0, :, :, :3], PAL256[idx])
        assert (frames[0, :, :, 3] == 255).all()

    def test_interlaced(self):
        # height not a multiple of 8: ragged interlace passes
        idx = (np.add.outer(np.arange(29), np.arange(31)) % 4).astype(
            np.uint8
        )
        frames, _ = gif.decode_gif(
            gif.encode_gif([idx], PAL4, interlace=True)
        )
        assert np.array_equal(frames[0, :, :, :3], PAL4[idx])

    def test_two_colors_min_code_floor(self):
        # 1-bit palette still uses min LZW code size 2 (GIF spec floor)
        pal2 = PAL4[:2]
        rng = np.random.default_rng(2)
        idx = rng.integers(0, 2, (9, 9), dtype=np.uint8)
        frames, _ = gif.decode_gif(gif.encode_gif([idx], pal2))
        assert np.array_equal(frames[0, :, :, :3], pal2[idx])

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            gif.decode_gif(b"NOTGIF" + bytes(20))


def _two_frame(transparent=1):
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 2, np.uint8)
    b[2:5, 2:5] = transparent  # hole
    return gif.encode_gif(
        [a, b], PAL4, delays_ms=[40, 70], transparent=transparent
    )


def _patch_disposal(payload: bytes, disposal: int) -> bytes:
    # first GCE block: 21 F9 04 <flags> — rewrite frame 1's disposal bits
    at = payload.index(b"\x21\xf9\x04")
    flags = payload[at + 3]
    flags = (flags & ~0x1C) | (disposal << 2)
    return payload[:at + 3] + bytes([flags]) + payload[at + 4 :]


class TestAnimation:
    def test_disposal_1_composites_over(self):
        frames, delays = gif.decode_gif(_two_frame())
        assert delays == [40, 70]
        assert frames.shape[0] == 2
        # hole keeps frame-1 pixels (palette 0), rest overwritten
        assert (frames[1, 3, 3, :3] == PAL4[0]).all()
        assert frames[1, 3, 3, 3] == 255
        assert (frames[1, 0, 0, :3] == PAL4[2]).all()

    def test_disposal_2_clears_to_transparent(self):
        frames, _ = gif.decode_gif(_patch_disposal(_two_frame(), 2))
        # frame 1's rect is cleared before frame 2, so the hole is now
        # fully transparent rather than frame-1 black
        assert frames[1, 3, 3, 3] == 0

    def test_disposal_3_restores_previous(self):
        frames, _ = gif.decode_gif(_patch_disposal(_two_frame(), 3))
        # previous canvas (pre-frame-1) was transparent too
        assert frames[1, 3, 3, 3] == 0
        assert (frames[1, 0, 0, :3] == PAL4[2]).all()


class TestLocalColorTable:
    def test_lct_overrides_missing_gct(self):
        # hand-built stream: no global table, image carries a local one
        idx = np.array([[0, 1], [1, 0]], np.uint8)
        lct = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
        data = gif.lzw_encode(idx.ravel(), 2)
        payload = (
            b"GIF89a" + (2).to_bytes(2, "little") * 2 + bytes([0, 0, 0])
            + b"\x2c" + bytes(4)
            + (2).to_bytes(2, "little") * 2
            + bytes([0x80 | 0])                    # LCT flag, 2 entries
            + lct.tobytes()
            + bytes([2]) + gif._sub_blocks(data)
            + b"\x3b"
        )
        frames, _ = gif.decode_gif(payload)
        assert np.array_equal(frames[0, :, :, :3], lct[idx])


class TestFixture:
    def test_closed_form(self):
        for i in (0, 3, 7):
            idx, pal = multimodal.gif_fixture(i)
            h, w = idx.shape
            assert (w, h) == (6 + 2 * (i % 5), 4 + 2 * (i % 3))
            assert idx[1, 2] == (5 * i + 3 + 4) % 16
            assert tuple(pal[5]) == (36, 58, 70)


class TestSparkOps:
    def test_gif_pixel_sums_byte_exact(self, spark):
        media = multimodal.synth_gif_media(spark, n=8)
        got = {
            r["media_id"]: r
            for r in multimodal.image_pixel_sums(media).collect()
        }
        assert sorted(got) == list(range(8))
        for i in range(8):
            idx, pal = multimodal.gif_fixture(i)
            s = pal[idx].reshape(-1, 3).sum(axis=0, dtype=np.int64)
            row = got[i]
            assert row["n_raw"] == idx.size * 3
            assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(s)

    def test_extract_features_real_gif(self, spark):
        media = multimodal.synth_gif_media(spark, n=1)
        feats = multimodal.extract_features(media, decode="real").collect()
        assert len(feats) == 1 and len(feats[0]["feature"]) == 16
