"""MP4 / ISO-BMFF demuxer + muxer (ops/mp4.py) and its Spark plumbing.

Three capability levels under test, matching the module's honesty
contract: container metadata parses for ANY codec, demux resolves every
sample's bytes codec-free, and full decode works only for the
uncompressed ``raw ``/``twos``/``sowt`` sample entries (compressed
codecs raise at the exact decode call, never earlier)."""

from __future__ import annotations

import numpy as np
import pytest

from xapian_spark.ops import mp4, multimodal


def _frames(n=7, h=12, w=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


class TestBoxWalk:
    def test_largesize_box(self):
        # size==1 -> 64-bit largesize header (14496-12 4.2)
        body = b"x" * 10
        box = (
            (1).to_bytes(4, "big") + b"free"
            + (16 + len(body)).to_bytes(8, "big") + body
        )
        out = list(mp4._walk(box, 0, len(box)))
        assert out == [(b"free", 16, len(box))]

    def test_size_zero_extends_to_end(self):
        box = (0).to_bytes(4, "big") + b"free" + b"y" * 5
        assert list(mp4._walk(box, 0, len(box))) == [(b"free", 8, len(box))]

    def test_truncated_box_raises(self):
        box = (100).to_bytes(4, "big") + b"free" + b"z" * 4
        with pytest.raises(ValueError, match="malformed"):
            list(mp4._walk(box, 0, len(box)))

    def test_not_bmff_raises(self):
        with pytest.raises(ValueError):
            mp4.parse_mp4(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)


class TestVideoRoundTrip:
    def test_byte_exact_multi_chunk(self):
        # 7 frames at chunk_samples=3 -> chunks of 3/3/1: the ragged last
        # chunk needs its own stsc run, and decode must walk all three
        frames = _frames(7)
        dec, fps = mp4.decode_mp4_video(
            mp4.encode_mp4_raw_video(frames, fps=5)
        )
        assert fps == 5
        assert np.array_equal(dec, frames)

    def test_single_chunk(self):
        frames = _frames(2)
        dec, _ = mp4.decode_mp4_video(
            mp4.encode_mp4_raw_video(frames, fps=10, chunk_samples=8)
        )
        assert np.array_equal(dec, frames)

    def test_chunk_exact_multiple(self):
        # n divisible by chunk_samples: no ragged stsc entry
        frames = _frames(6)
        dec, _ = mp4.decode_mp4_video(
            mp4.encode_mp4_raw_video(frames, fps=5, chunk_samples=3)
        )
        assert np.array_equal(dec, frames)

    def test_sample_spans_slice_mdat(self):
        frames = _frames(5, h=4, w=4)
        payload = mp4.encode_mp4_raw_video(frames, fps=5, chunk_samples=2)
        tr = mp4.parse_mp4(payload).track("vide")
        spans = tr.sample_spans()
        assert len(spans) == 5
        for (off, size), f in zip(spans, frames):
            assert payload[off : off + size] == f.tobytes()


class TestAudioRoundTrip:
    @pytest.mark.parametrize("codec", ["sowt", "twos"])
    def test_mono(self, codec):
        x = np.arange(-250, 250, dtype=np.int16)
        dec, rate = mp4.decode_mp4_audio(
            mp4.encode_mp4_pcm_audio(x, rate=8000, codec=codec)
        )
        assert rate == 8000
        assert np.array_equal(dec[:, 0], x)

    def test_stereo(self):
        x = np.stack(
            [np.arange(100, dtype=np.int16),
             np.arange(100, dtype=np.int16) * -2],
            axis=1,
        )
        dec, _ = mp4.decode_mp4_audio(mp4.encode_mp4_pcm_audio(x, rate=4000))
        assert np.array_equal(dec, x)


class TestMetadata:
    def test_video_metadata(self):
        frames = _frames(7, h=12, w=16)
        info = mp4.parse_mp4(mp4.encode_mp4_raw_video(frames, fps=5))
        assert info.major_brand == "isom"
        assert info.duration_ms == 7 * 1000 // 5
        tr = info.track("vide")
        assert (tr.codec, tr.width, tr.height, tr.depth) == ("raw ", 16, 12, 24)
        assert tr.n_samples == 7 and tr.duration_ms == 1400

    def test_audio_metadata(self):
        info = mp4.parse_mp4(
            mp4.encode_mp4_pcm_audio(np.zeros(800, np.int16), rate=8000)
        )
        tr = info.track("soun")
        assert (tr.codec, tr.channels, tr.sample_bits) == ("sowt", 1, 16)
        assert tr.sample_rate == 8000 and tr.duration_ms == 100


class TestHonestScope:
    """Compressed codecs: metadata + demux keep working; ONLY the frame
    decode raises, naming the codec."""

    def test_avc1_metadata_and_demux_work(self):
        frames = _frames(4)
        payload = mp4.encode_mp4_raw_video(frames, fps=5, codec="avc1")
        tr = mp4.parse_mp4(payload).track("vide")
        assert tr.codec == "avc1" and tr.width == 16
        # demux is codec-free: the sample bytes come out regardless
        assert mp4.demux_track(payload, tr)[2] == frames[2].tobytes()

    def test_avc1_decode_raises(self):
        payload = mp4.encode_mp4_raw_video(_frames(2), fps=5, codec="avc1")
        with pytest.raises(NotImplementedError, match="avc1"):
            mp4.decode_mp4_video(payload)

    def test_mp4a_audio_decode_raises(self):
        payload = mp4.encode_mp4_pcm_audio(
            np.zeros(16, np.int16), codec="mp4a"
        )
        with pytest.raises(NotImplementedError, match="mp4a"):
            mp4.decode_mp4_audio(payload)


class TestFixtureClosedForm:
    def test_fixture_matches_formula(self):
        for i in (0, 3, 5):
            frames, fps = multimodal.mp4_fixture_frames(i)
            nf, h, w = frames.shape[:3]
            assert (w, h, nf, fps) == (
                8 * (1 + i % 3), 4 * (1 + i % 2), 2 + i % 3, 5 + i % 3
            )
            assert frames[1, 2, 3, 1] == (42 + 17 * i + 7 + 58 + 159 + 101) % 256


class TestSparkOps:
    def test_video_pixel_sums_byte_exact(self, spark):
        media = multimodal.synth_mp4_media(spark, n=8)
        got = {
            r["media_id"]: r
            for r in multimodal.video_pixel_sums(media).collect()
        }
        # odd rows are avc1-labeled: dropped (decode is not ours to claim)
        assert sorted(got) == [0, 2, 4, 6]
        for i in got:
            frames, _ = multimodal.mp4_fixture_frames(i)
            s = frames.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            row = got[i]
            assert row["n_raw"] == frames.size
            assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(s)

    def test_mp4_metadata_all_codecs(self, spark):
        media = multimodal.synth_mp4_media(spark, n=8)
        got = {r["media_id"]: r for r in multimodal.mp4_metadata(media).collect()}
        assert sorted(got) == list(range(8))
        for i, row in got.items():
            frames, fps = multimodal.mp4_fixture_frames(i)
            nf, h, w = frames.shape[:3]
            assert row["codec"] == ("raw " if i % 2 == 0 else "avc1")
            assert row["decodable"] == (i % 2 == 0)
            assert (row["width"], row["height"]) == (w, h)
            assert row["n_frames"] == nf
            assert row["duration_ms"] == nf * 1000 // fps

    def test_extract_features_real_mp4(self, spark):
        media = multimodal.synth_mp4_media(spark, n=2).where("media_id = 0")
        feats = multimodal.extract_features(media, decode="real").collect()
        assert len(feats) == 1
        frames, _ = multimodal.mp4_fixture_frames(0)
        assert feats[0]["feature"][0] == pytest.approx(
            frames.shape[0] / 100.0
        )

    def test_extract_features_real_mp4_audio(self, spark):
        # an MP4-contained PCM track goes through the same audio feature
        # math as WAV: identical samples => identical feature vectors
        t = np.arange(4000)
        x = (3000 * np.sin(t / 7.0)).astype(np.int16)
        p_mp4 = mp4.encode_mp4_pcm_audio(x, rate=8000)
        p_wav = multimodal.encode_wav(x, sample_rate=8000)
        rows = [(0, "audio", "audio/mp4", None, None, 500, p_mp4),
                (1, "audio", "audio/wav", None, None, 500, p_wav)]
        media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        feats = {
            r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, decode="real")
            .collect()
        }
        assert feats[0] == pytest.approx(feats[1])

    def test_sample_frames_mp4(self, spark):
        # raw-codec rows emit real luma frames; avc1-labeled rows are
        # skipped (metadata-only), not errored
        media = multimodal.synth_mp4_media(spark, n=2)
        got = multimodal.sample_frames(media, every_ms=200).collect()
        assert got and all(r["media_id"] == 0 for r in got)
        frames, _ = multimodal.mp4_fixture_frames(0)
        luma = (
            frames @ np.array([0.299, 0.587, 0.114], np.float32)
        ).astype(np.uint8)
        first = got[0]
        assert first["payload"].startswith(b"P5\n")
        assert first["payload"].endswith(luma[0].tobytes())
