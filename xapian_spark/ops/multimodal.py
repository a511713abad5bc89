"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Two decode paths:

- ``decode="fake"`` produces a deterministic sha256-derived feature vector
  from the raw bytes, reproducible in ANSI SQL, so the driver's DuckDB
  oracle can hash-check the full mapInPandas pipeline (this is the path
  the driver-contract ``multimodal_features`` entry uses).
- ``decode="real"`` actually decodes the payload and computes signal-level
  features — implemented from scratch for the public formats decodable
  with stdlib alone: PPM P6 images (netpbm), full baseline PNG (zlib
  inflate + the five row filters, every legal depth 1/2/4/8/16 x colour
  type grey/RGB/palette+tRNS/grey+alpha/RGBA, Adam7 interlace), baseline
  JPEG (ops/jpeg.py: Huffman + IDCT per ITU-T T.81, grayscale/4:4:4/
  4:2:0, restart markers, baseline AND progressive SOF2), RIFF/WAV PCM
  audio (stdlib ``wave``), YUV4MPEG2 video (the uncompressed
  interchange format used by mjpegtools/ffmpeg), and MP4/ISO-BMFF
  (ops/mp4.py: container metadata + codec-free demux for ANY codec,
  full frame/sample decode for the uncompressed ``raw ``/``twos``/
  ``sowt`` sample entries).  Payloads needing a real codec library
  (H.264/AAC sample data inside MP4, arithmetic-coded/12-bit JPEG)
  still raise NotImplementedError at the exact point PIL/ffmpeg would
  plug in — this container ships none.

``synth_real_media`` generates genuine PPM/WAV/Y4M payloads so the real
path is testable end-to-end; ``resize_images`` and ``sample_frames`` are
the resize / frame-sample stages over the same binary columns.
"""

from __future__ import annotations

import hashlib
import io
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 512 if kind != "audio" else None,
                48 + i % 256 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: bytes -> R^dim.

    feature[j] = byte_j(sha256(hex(payload))) / 255 * 2 - 1 — chosen to be
    reproducible in ANSI SQL (DuckDB sha256 is VARCHAR-only, hence the hex
    round-trip), so the driver's oracle can hash-check the full mapInPandas
    pipeline, not just row counts.  dim <= 32.
    """
    h = hashlib.sha256(payload.hex().encode()).digest()
    return [h[j] / 255.0 * 2.0 - 1.0 for j in range(dim)]


# ---------------------------------------------------------------------------
# Real container-free codecs (pure numpy/stdlib; formats are public specs:
# netpbm PPM, RIFF/WAV PCM, YUV4MPEG2)
# ---------------------------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    """netpbm P6: 'P6\\n<w> <h>\\n255\\n' + interleaved RGB bytes."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse P6 (binary PPM) -> (h, w, 3) uint8.  Tolerates comments and
    arbitrary whitespace in the header, per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec Paeth predictor (left a, above b, upper-left c)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Baseline PNG encoder, pure stdlib zlib (PNG spec, RFC 2083):
    8-bit greyscale (h, w), RGB (h, w, 3) or RGBA (h, w, 4), non-
    interlaced, one IDAT.  ``filters`` picks the per-row filter type
    (0-4); the default cycles row % 5 so a round-trip exercises every
    unfilter path (None/Sub/Up/Average/Paeth) — a production encoder
    would pick per-row minimum-sum-of-absolutes instead."""
    assert img.dtype == np.uint8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = img.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, np.int16)
    out = []
    for r in range(h):
        ft = filters[r % len(filters)] if filters else r % 5
        row = raw[r]
        left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
        up = prev
        upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - up
        elif ft == 3:
            enc = row - (left + up) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, up, upleft)),
                np.int16, count=w * ch,
            )
            enc = row - pred
        out.append(bytes([ft]) + (enc % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(out)))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) per the
# PNG spec's 8x8 pattern, in transmission order.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# Valid (colour type -> bit depths) combinations, PNG spec table 11.1.
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG row filters over h scanlines of `stride` bytes
    (each preceded by its filter-type byte).  Filters operate on BYTES
    with the left neighbour `bpp` bytes back (one whole pixel, min 1) —
    the same logic serves every depth/colour-type combination."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    for r in range(h):
        ft, row = int(rows[r, 0]), rows[r, 1:].astype(np.int32)
        prev = out[r - 1] if r else np.zeros(stride, np.int32)
        if ft == 0:
            out[r] = row
        elif ft == 2:
            out[r] = (row + prev) % 256
        elif ft in (1, 3, 4):
            cur = out[r]
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + prev[i]) // 2
                else:
                    pred = _paeth(a, int(prev[i]),
                                  int(prev[i - bpp]) if i >= bpp else 0)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out.astype(np.uint8)


def _png_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, stride) -> sample array (h, w*ch) of
    raw sample values (uint16 for 16-bit, else 0..2^depth-1)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].astype(np.uint16)
    if depth == 16:
        return ((rows[:, 0::2].astype(np.uint16) << 8)
                | rows[:, 1::2])[:, : w * ch]
    # 1/2/4-bit: packed MSB-first, ch == 1 (grey or palette indices)
    bits = np.unpackbits(rows, axis=1).reshape(h, -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (bits * weights).sum(axis=2)[:, :w].astype(np.uint16)


def decode_png(payload: bytes) -> np.ndarray:
    """Baseline PNG decoder, pure stdlib zlib (PNG spec / RFC 2083):
    every legal depth (1/2/4/8/16 bit) x colour type (grey, RGB,
    palette incl. tRNS alpha, grey+alpha, RGBA) x interlace method
    (none, Adam7), all five row filters.  Returns uint8 arrays: (h, w)
    for grey, else (h, w, channels); sub-8-bit grey is rescaled to
    0..255 per the spec's sample-max (2^depth - 1) and 16-bit samples
    take their high byte, so downstream feature code sees one dtype."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos < len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if depth not in _PNG_DEPTHS.get(color_type, ()) or interlace not in (0, 1):
        raise ValueError(
            f"illegal PNG depth={depth} color_type={color_type} "
            f"interlace={interlace}"
        )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, (ch * depth + 7) // 8)
    flat = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)

    samples = np.zeros((h, w, ch), np.uint16)
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * ch * depth + 7) // 8
        n = ph * (stride + 1)
        if off + n > flat.size:
            raise ValueError("bad IDAT payload size")
        rows = _png_unfilter(flat[off : off + n], ph, stride, bpp)
        off += n
        samples[y0::dy, x0::dx, :] = _png_samples(
            rows, pw, ch, depth
        ).reshape(ph, pw, ch)
    if off != flat.size:
        raise ValueError("bad IDAT payload size")

    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[: a.size] = a
            return np.dstack([pal[idx], alpha[idx][:, :, None]])
        return pal[idx]
    if depth == 16:
        img = (samples >> 8).astype(np.uint8)
    elif depth < 8:  # grey only (type 0): rescale to full 8-bit range
        img = (samples * 255 // ((1 << depth) - 1)).astype(np.uint8)
    else:
        img = samples.astype(np.uint8)
    return img.reshape(h, w) if ch == 1 else img


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAV from an int16 sample array (stdlib wave)."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM -> (float32 samples in [-1, 1] of channel 0, rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, width, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width={width}")
    x = np.frombuffer(raw, np.int16).reshape(-1, nch)[:, 0]
    return x.astype(np.float32) / 32768.0, rate


def encode_y4m(frames_y: np.ndarray, fps: int = 10) -> bytes:
    """YUV4MPEG2 C420 from a (n, h, w) uint8 luma stack (U=V=128 gray).

    Stream layout per the y4m spec: one ASCII header line, then per frame
    'FRAME\\n' + Y plane + quarter-size U and V planes."""
    n, h, w = frames_y.shape
    assert h % 2 == 0 and w % 2 == 0 and frames_y.dtype == np.uint8
    uv = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\n" % (w, h, fps)]
    for f in frames_y:
        out.append(b"FRAME\n" + f.tobytes() + uv + uv)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 -> ((n, h, w) uint8 luma stack, fps).  C420 only."""
    nl = payload.index(b"\n")
    header = payload[:nl].split()
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) // int(den)
    if not (w and h and fps):
        raise ValueError("missing W/H/F in y4m header")
    ysz, uvsz = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(payload):
        fe = payload.index(b"\n", pos)
        if payload[pos:fe].split()[0] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fe + 1
        frames.append(np.frombuffer(payload, np.uint8, count=ysz, offset=pos).reshape(h, w))
        pos += ysz + 2 * uvsz
    return np.stack(frames), fps


def synth_real_media(spark, n: int = 48, seed: int = 42) -> DataFrame:
    """Like synth_media but the payloads are REAL decodable media: PPM
    gradient images, WAV sine tones, Y4M moving-gradient clips — all
    deterministic in (seed, i), so decode="real" is testable end-to-end."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
            yy, xx = np.indices((h, w), dtype=np.uint16)
            rgb = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    np.full((h, w), (seed + i * 37) % 256, np.uint8),
                ],
                axis=-1,
            )
            # alternate PPM / PNG so both real image decoders are
            # exercised end-to-end (PNG's default filter choice cycles
            # all five row filters)
            if (i // 3) % 2:
                rows.append((i, kind, "image/png", w, h, None, encode_png(rgb)))
            else:
                rows.append(
                    (i, kind, "image/x-portable-pixmap", w, h, None,
                     encode_ppm(rgb))
                )
        elif kind == "audio":
            rate, dur_ms = 8000, 250 + (i % 8) * 125
            freq = 200.0 + 50.0 * (i % 12)
            t = np.arange(rate * dur_ms // 1000, dtype=np.float64) / rate
            samples = (0.5 * np.sin(2 * np.pi * freq * t + seed % 7)) * 32767
            rows.append(
                (i, kind, "audio/wav", None, None, dur_ms,
                 encode_wav(samples.astype(np.int16), rate))
            )
        else:
            w, h, fps, nf = 32, 24, 10, 3 + i % 5
            yy, xx = np.indices((h, w), dtype=np.uint16)
            frames = np.stack(
                [((xx + yy + 8 * f + seed + i) % 256).astype(np.uint8) for f in range(nf)]
            )
            rows.append(
                (i, kind, "video/x-yuv4mpeg", w, h, nf * 1000 // fps,
                 encode_y4m(frames, fps))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_jpeg_media(spark, n: int = 8, seed: int = 42) -> DataFrame:
    """Deterministic REAL-JPEG media rows: flat-tile grayscale images
    encoded with unit quantization tables (ops/jpeg.py), which decode
    BYTE-EXACTLY — a flat 8x8 block is DC-only and its DC coefficient
    8*(v-128) is an integer, so quantization by 1 loses nothing.  The
    fixture rotation covers every decoder mode under that exactness
    check: i % 4 == 2 rows are progressive (SOF2, Annex G successive
    approximation), odd rows add a restart interval (RSTn resync + DC
    predictor reset), the rest are plain baseline.  The pixel
    sums have the closed form the driver oracle replays:
    tile (ty, tx) of image i = (seed + 13*i + 29*ty + 53*tx) % 256."""
    from xapian_spark.ops.jpeg import encode_flat_tile_jpeg, flat_tile_image

    rows = []
    for i in range(n):
        img = flat_tile_image(i, seed)
        h, w = img.shape
        rows.append(
            (i, "image", "image/jpeg", w, h, None,
             encode_flat_tile_jpeg(i, seed))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gif_fixture(i: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic indexed image + 16-color palette with the closed
    form the driver oracle replays: palette[j] = (7j+1, 11j+3, 13j+5)
    (all < 256 for j < 16, so no wrap), index(y, x) = (5i + 3y + 2x)
    % 16, w = 6 + 2*(i%5), h = 4 + 2*(i%3)."""
    w, h = 6 + 2 * (i % 5), 4 + 2 * (i % 3)
    j = np.arange(16, dtype=np.int64)
    palette = np.stack([7 * j + 1, 11 * j + 3, 13 * j + 5], axis=1)
    idx = (
        5 * i
        + 3 * np.arange(h, dtype=np.int64)[:, None]
        + 2 * np.arange(w, dtype=np.int64)[None, :]
    ) % 16
    return idx.astype(np.uint8), palette.astype(np.uint8)


def synth_gif_media(spark, n: int = 8) -> DataFrame:
    """Deterministic REAL-GIF media rows (ops/gif.py): 16-color palette
    images, odd rows interlaced so the four-pass row order sits under
    the driver's byte-exact pixel-sum check alongside the LZW decode."""
    from xapian_spark.ops.gif import encode_gif

    rows = []
    for i in range(n):
        idx, palette = gif_fixture(i)
        h, w = idx.shape
        rows.append(
            (i, "image", "image/gif", w, h, None,
             encode_gif([idx], palette, interlace=bool(i % 2)))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def mp4_fixture_frames(i: int, seed: int = 42) -> tuple[np.ndarray, int]:
    """Deterministic RGB video with the closed form the driver oracle
    replays: pixel (f, y, x, c) of video i =
    (seed + 17*i + 7*f + 29*y + 53*x + 101*c) % 256.
    w = 8*(1 + i%3), h = 4*(1 + i%2), nf = 2 + i%3, fps = 5 + i%3."""
    w, h, nf = 8 * (1 + i % 3), 4 * (1 + i % 2), 2 + i % 3
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    frames = (seed + 17 * i + 7 * f + 29 * y + 53 * x + 101 * c) % 256
    return frames.astype(np.uint8), 5 + i % 3


def synth_mp4_media(spark, n: int = 8, seed: int = 42) -> DataFrame:
    """Deterministic REAL-MP4 media rows (ops/mp4.py muxer): uncompressed
    24-bit RGB frames in a conformant ISO-BMFF container with a full
    sample table, multi-chunk so the stsc/stco walk is exercised.  Even
    rows carry the decodable ``raw `` sample entry; odd rows hold the
    same bytes under an ``avc1`` fourcc — container metadata and demux
    must still work for them (frame decode correctly raises), mirroring
    what a 100-TB pipeline does with compressed video: filter and route
    on metadata without any codec."""
    from xapian_spark.ops.mp4 import encode_mp4_raw_video

    rows = []
    for i in range(n):
        frames, fps = mp4_fixture_frames(i, seed)
        nf, h, w = frames.shape[:3]
        rows.append(
            (i, "video", "video/mp4", w, h, nf * 1000 // fps,
             encode_mp4_raw_video(
                 frames, fps=fps, codec="raw " if i % 2 == 0 else "avc1"
             ))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fit(vec: list[float], dim: int) -> list[float]:
    v = [float(x) for x in vec[:dim]]
    return v + [0.0] * (dim - len(v))


def _real_feature(kind: str, payload: bytes, dim: int) -> list[float]:
    """Signal-level features per modality (the encoder a production
    pipeline would replace with a learned embedding):

    - image:  per-channel mean/std (6) + 8-bin luma histogram + edge energy
    - audio:  rms, zero-crossing rate, peak, duration + 8 FFT band energies
    - video:  frame count, luma mean/std over time, temporal-diff energy +
              8-bin histogram of the first frame
    """
    if kind == "image":
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            raw = decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            from xapian_spark.ops.jpeg import decode_jpeg

            raw = decode_jpeg(payload)
        elif payload[:4] == b"GIF8":
            from xapian_spark.ops.gif import decode_gif_image

            raw = decode_gif_image(payload)
        else:
            raw = decode_ppm(payload)
        if raw.ndim == 2:  # grey -> 3-channel
            raw = np.repeat(raw[:, :, None], 3, axis=2)
        img = raw[:, :, :3].astype(np.float32) / 255.0  # RGBA: ignore alpha
        luma = img @ np.array([0.299, 0.587, 0.114], np.float32)
        hist = np.histogram(luma, bins=8, range=(0.0, 1.0))[0]
        vec = (
            list(img.mean(axis=(0, 1))) + list(img.std(axis=(0, 1)))
            + list(hist / max(luma.size, 1))
            + [float(np.abs(np.diff(luma, axis=1)).mean())]
        )
    elif kind == "audio":
        if payload[4:8] == b"ftyp":
            from xapian_spark.ops.mp4 import decode_mp4_audio

            pcm, rate = decode_mp4_audio(payload)  # (n, ch) int16
            x = pcm[:, 0].astype(np.float32) / 32768.0
        else:
            x, rate = decode_wav(payload)
        spec = np.abs(np.fft.rfft(x))
        bands = [
            float(chunk.mean()) if chunk.size else 0.0
            for chunk in np.array_split(spec, 8)
        ]
        tot = sum(bands) or 1.0
        vec = [
            float(np.sqrt((x * x).mean())) if x.size else 0.0,
            float((np.diff(np.signbit(x)) != 0).mean()) if x.size > 1 else 0.0,
            float(np.abs(x).max()) if x.size else 0.0,
            x.size / rate / 10.0,
        ] + [b / tot for b in bands]
    elif kind == "video":
        if payload[4:8] == b"ftyp":
            from xapian_spark.ops.mp4 import decode_mp4_video

            rgb, fps = decode_mp4_video(payload)  # (n, h, w, 3)
            frames = (
                rgb @ np.array([0.299, 0.587, 0.114], np.float32)
            ).astype(np.uint8)
        else:
            frames, fps = decode_y4m(payload)
        fl = frames.astype(np.float32) / 255.0
        means = fl.mean(axis=(1, 2))
        hist = np.histogram(fl[0], bins=8, range=(0.0, 1.0))[0]
        vec = [
            frames.shape[0] / 100.0,
            float(means.mean()),
            float(means.std()),
            float(np.abs(np.diff(fl, axis=0)).mean()) if len(fl) > 1 else 0.0,
        ] + list(hist / max(fl[0].size, 1))
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return _fit(vec, dim)


def extract_features(
    media: DataFrame, decode: str = "fake", dim: int = 16, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: the real scale plumbing.

    Each Arrow batch is a pandas DataFrame of media rows; a real decoder
    would release the GIL in C (PIL/ffmpeg).  Partitioning: upstream should
    repartition by size class so batches have uniform decode cost.
    """
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "real":
                feats = []
                for kind, p in zip(pdf["kind"], pdf["payload"]):
                    p = bytes(p)
                    # container-free formats only; anything else needs a
                    # codec library this container doesn't ship
                    if not (
                        p[:2] == b"P6"
                        or p[:8] == b"\x89PNG\r\n\x1a\n"
                        or p[:2] == b"\xff\xd8"
                        or p[:4] == b"RIFF"
                        or p[:9] == b"YUV4MPEG2"
                        or p[4:8] == b"ftyp"
                        or p[:4] == b"GIF8"
                    ):
                        raise NotImplementedError(
                            "unrecognized container; only PPM/PNG/JPEG/"
                            "GIF/WAV/Y4M/MP4 decode in-container — plug "
                            "a codec library in here"
                        )
                    feats.append(_real_feature(kind, p, dim))
            else:
                feats = [
                    _fake_feature(bytes(p), dim) for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


PIXEL_SUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_raw", T.LongType()),  # decoded bytes: h * w * 3
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def image_pixel_sums(media: DataFrame) -> DataFrame:
    """Byte-exact decode check: per-channel pixel sums of REAL-decoded
    images (PNG or PPM rows; other kinds dropped).  Integer outputs make
    this oracle-verifiable to the last bit — the driver's closed-form SQL
    recomputes the sums from the synthetic gradient definition, so any
    decode error (a wrong unfilter, an off-by-one stride) flips the hash."""

    def _sums(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_raw", "sum_r", "sum_g", "sum_b")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(p)
                elif p[:2] == b"\xff\xd8":
                    from xapian_spark.ops.jpeg import decode_jpeg

                    img = decode_jpeg(p)
                elif p[:4] == b"GIF8":
                    from xapian_spark.ops.gif import decode_gif_image

                    img = decode_gif_image(p)
                elif p[:2] == b"P6":
                    img = decode_ppm(p)
                else:
                    continue
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                img = img[:, :, :3]
                s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["media_id"].append(mid)
                rows["n_raw"].append(int(img.size))
                rows["sum_r"].append(int(s[0]))
                rows["sum_g"].append(int(s[1]))
                rows["sum_b"].append(int(s[2]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(_sums, PIXEL_SUM_SCHEMA)


def video_pixel_sums(media: DataFrame) -> DataFrame:
    """Byte-exact MP4 decode check: per-channel pixel sums over ALL
    frames of uncompressed-codec video rows (compressed-codec rows are
    dropped — their decode is a codec library's job, not ours).  Same
    integer-exactness contract as image_pixel_sums: the driver oracle
    recomputes the sums from the fixture's closed form, so a wrong
    chunk offset, sample size, or channel order flips the hash."""
    from xapian_spark.ops.mp4 import (
        UNCOMPRESSED_VIDEO, decode_mp4_video, parse_mp4,
    )

    def _sums(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                k: [] for k in ("media_id", "n_raw", "sum_r", "sum_g", "sum_b")
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[4:8] != b"ftyp":
                    continue
                tr = parse_mp4(p).track("vide")
                if tr is None or tr.codec not in UNCOMPRESSED_VIDEO:
                    continue
                frames, _fps = decode_mp4_video(p)
                s = frames.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["media_id"].append(mid)
                rows["n_raw"].append(int(frames.size))
                rows["sum_r"].append(int(s[0]))
                rows["sum_g"].append(int(s[1]))
                rows["sum_b"].append(int(s[2]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(_sums, PIXEL_SUM_SCHEMA)


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("decodable", T.BooleanType()),
    ]
)


def mp4_metadata(media: DataFrame) -> DataFrame:
    """Codec-free MP4 container metadata per row (ops/mp4.py parse): the
    operation a training-data pipeline runs FIRST over petabytes of
    crawled video — filter by duration/resolution, route by codec,
    shard by size — none of which needs a codec library.  Works for
    compressed-codec files too; ``decodable`` says whether this
    container could also decode the frames itself."""
    from xapian_spark.ops.mp4 import UNCOMPRESSED_VIDEO, parse_mp4

    def _meta(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in MP4_META_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[4:8] != b"ftyp":
                    continue
                info = parse_mp4(p)
                tr = info.track("vide") or info.tracks[0]
                rows["media_id"].append(mid)
                rows["brand"].append(info.major_brand)
                rows["codec"].append(tr.codec)
                rows["width"].append(tr.width)
                rows["height"].append(tr.height)
                rows["n_frames"].append(tr.n_samples)
                rows["duration_ms"].append(info.duration_ms)
                rows["decodable"].append(tr.codec in UNCOMPRESSED_VIDEO)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_meta, MP4_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # PPM P6 thumbnail
    ]
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Real image resize over the binary column: decode PPM or PNG,
    area-style nearest-index downsample with numpy fancy indexing,
    re-encode PPM.  Other formats are dropped (a production pipeline
    routes by mime)."""

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(p)
                elif p[:2] == b"\xff\xd8":
                    from xapian_spark.ops.jpeg import decode_jpeg

                    img = decode_jpeg(p)
                elif p[:4] == b"GIF8":
                    from xapian_spark.ops.gif import decode_gif_image

                    img = decode_gif_image(p)
                elif p[:2] == b"P6":
                    img = decode_ppm(p)
                else:
                    continue
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                img = np.ascontiguousarray(img[:, :, :3])
                h, w = img.shape[:2]
                ri = np.arange(out_h) * h // out_h
                ci = np.arange(out_w) * w // out_w
                ids.append(mid)
                payloads.append(encode_ppm(img[ri][:, ci]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "payload": payloads,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        _resize, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("y_mean", T.FloatType()),
        T.StructField("payload", T.BinaryType()),  # PGM P5 luma frame
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real video frame sampling: decode Y4M, emit the luma plane of the
    frame nearest each every_ms timestamp as a PGM P5 payload (the shape
    frame_sample_plan only planned).  One output row per sampled frame."""

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "media_id", "frame_idx", "frame_ts_ms", "width", "height",
                "y_mean", "payload",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[:9] == b"YUV4MPEG2":
                    frames, fps = decode_y4m(p)
                elif p[4:8] == b"ftyp":
                    from xapian_spark.ops.mp4 import (
                        UNCOMPRESSED_VIDEO, decode_mp4_video, parse_mp4,
                    )

                    tr = parse_mp4(p).track("vide")
                    if tr is None or tr.codec not in UNCOMPRESSED_VIDEO:
                        continue  # compressed codec: metadata-only row
                    rgb, fps = decode_mp4_video(p)
                    frames = (
                        rgb @ np.array([0.299, 0.587, 0.114], np.float32)
                    ).astype(np.uint8)
                else:
                    continue
                nf, h, w = frames.shape
                dur_ms = nf * 1000 // fps
                for ts in range(0, max(dur_ms, 1), every_ms):
                    fi = min(ts * fps // 1000, nf - 1)
                    y = frames[fi]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["frame_ts_ms"].append(ts)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["y_mean"].append(float(y.mean()) / 255.0)
                    rows["payload"].append(
                        b"P5\n%d %d\n255\n" % (w, h) + y.tobytes()
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(
        _frames, FRAME_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the shuffle
    shape of frame extraction without the codec.  Pure column expressions."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
