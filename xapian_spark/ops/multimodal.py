"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Two decode paths:

- ``decode="fake"`` produces a deterministic sha256-derived feature vector
  from the raw bytes, reproducible in ANSI SQL, so the driver's DuckDB
  oracle can hash-check the full mapInPandas pipeline (this is the path
  the driver-contract ``multimodal_features`` entry uses).
- ``decode="real"`` actually decodes the payload and computes signal-level
  features — implemented from scratch for the container-free public
  formats that need no codec library: PPM P6 images (netpbm), RIFF/WAV
  PCM audio (stdlib ``wave``), and YUV4MPEG2 video (the uncompressed
  interchange format used by mjpegtools/ffmpeg).  Compressed formats
  (PNG/JPEG/MP4) still raise NotImplementedError at the exact point a
  codec (PIL/ffmpeg/soundfile) would plug in — this container ships none.

``synth_real_media`` generates genuine PPM/WAV/Y4M payloads so the real
path is testable end-to-end; ``resize_images`` and ``sample_frames`` are
the resize / frame-sample stages over the same binary columns.
"""

from __future__ import annotations

import hashlib
import io
import wave
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
            rows.append((i, kind, "image/x-portable-pixmap", w, h, None, encode_ppm(rgb)))
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
        img = decode_ppm(payload).astype(np.float32) / 255.0
        luma = img @ np.array([0.299, 0.587, 0.114], np.float32)
        hist = np.histogram(luma, bins=8, range=(0.0, 1.0))[0]
        vec = (
            list(img.mean(axis=(0, 1))) + list(img.std(axis=(0, 1)))
            + list(hist / max(luma.size, 1))
            + [float(np.abs(np.diff(luma, axis=1)).mean())]
        )
    elif kind == "audio":
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
                        p[:2] == b"P6" or p[:4] == b"RIFF" or p[:9] == b"YUV4MPEG2"
                    ):
                        raise NotImplementedError(
                            "real decode of compressed formats (PNG/JPEG/MP4) "
                            "requires PIL/ffmpeg/soundfile; only PPM/WAV/Y4M "
                            "decode in-container — plug a codec in here"
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # PPM P6 thumbnail
    ]
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Real image resize over the binary column: decode PPM, area-style
    nearest-index downsample with numpy fancy indexing, re-encode PPM.
    Non-PPM rows are dropped (a production pipeline routes by mime)."""

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p)
                if p[:2] != b"P6":
                    continue
                img = decode_ppm(p)
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
                if p[:9] != b"YUV4MPEG2":
                    continue
                frames, fps = decode_y4m(p)
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
