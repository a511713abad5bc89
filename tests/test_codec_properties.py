"""Property-based round-trip tests over every from-scratch codec
(hypothesis, mirroring tests/test_sortable.py's strategy): arbitrary
inputs must survive encode -> decode byte-exactly (or, for lossy JPEG,
the progressive and baseline pipelines must agree exactly with each
other, which pins the entropy coders without pinning the DCT)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xapian_spark.ops import gif, mp4, multimodal


# -- GIF LZW ---------------------------------------------------------------


@given(
    st.integers(2, 8),
    st.lists(st.integers(0, 255), min_size=0, max_size=2000),
)
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip(min_code, data):
    data = [d % (1 << min_code) for d in data]
    assert gif.lzw_decode(gif.lzw_encode(data, min_code), min_code) == data


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip(data):
    h = data.draw(st.integers(1, 24), label="h")
    w = data.draw(st.integers(1, 24), label="w")
    nbits = data.draw(st.integers(1, 8), label="palette_bits")
    n = 1 << nbits
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    interlace = data.draw(st.booleans(), label="interlace")
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    frames, _ = gif.decode_gif(
        gif.encode_gif([idx], palette, interlace=interlace)
    )
    assert np.array_equal(frames[0, :, :, :3], palette[idx])


# -- MP4 -------------------------------------------------------------------


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_mp4_video_roundtrip(data):
    n = data.draw(st.integers(1, 9), label="frames")
    h = data.draw(st.integers(1, 12), label="h")
    w = data.draw(st.integers(1, 12), label="w")
    chunk = data.draw(st.integers(1, 10), label="chunk_samples")
    fps = data.draw(st.integers(1, 60), label="fps")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    dec, got_fps = mp4.decode_mp4_video(
        mp4.encode_mp4_raw_video(frames, fps=fps, chunk_samples=chunk)
    )
    assert got_fps == fps
    assert np.array_equal(dec, frames)


@given(
    st.integers(1, 2),
    st.integers(1, 400),
    st.sampled_from(["sowt", "twos"]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_mp4_audio_roundtrip(channels, n, codec, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, (n, channels)).astype(np.int16)
    dec, rate = mp4.decode_mp4_audio(
        mp4.encode_mp4_pcm_audio(x, rate=8000, codec=codec)
    )
    assert rate == 8000
    assert np.array_equal(dec, x)


# -- PNG / PPM / WAV / Y4M --------------------------------------------------


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_rgb(data):
    h = data.draw(st.integers(1, 20), label="h")
    w = data.draw(st.integers(1, 20), label="w")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = multimodal.decode_png(multimodal.encode_png(img, filters=filters))
    assert np.array_equal(dec, img)


@given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_ppm(multimodal.encode_ppm(img)), img
    )


@given(st.integers(1, 2000), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n).astype(np.int16)
    dec, rate = multimodal.decode_wav(multimodal.encode_wav(x, 8000))
    assert rate == 8000
    assert np.array_equal((dec * 32768.0).astype(np.int16), x)


@given(
    st.integers(1, 6), st.integers(2, 16), st.integers(2, 16),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip(nf, h, w, seed):
    # C420 plane layout needs even dims
    h, w = h * 2, w * 2
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
    dec, fps = multimodal.decode_y4m(multimodal.encode_y4m(frames, fps=10))
    assert fps == 10
    assert np.array_equal(dec, frames)


# -- JPEG: progressive == baseline ------------------------------------------


@given(st.data())
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_equals_baseline(data):
    from xapian_spark.ops import jpeg

    h = data.draw(st.integers(4, 24), label="h")
    w = data.draw(st.integers(4, 24), label="w")
    gray = data.draw(st.booleans(), label="gray")
    quality = data.draw(st.sampled_from([40, 75, 92]), label="quality")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
    p = jpeg.decode_jpeg(jpeg.encode_progressive_jpeg(img, quality=quality))
    assert np.array_equal(b, p)
