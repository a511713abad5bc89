"""ISO Base Media File Format (MP4/QuickTime .mov) demuxer + muxer.

From scratch against the PUBLIC specs: ISO/IEC 14496-12 (box structure,
movie/track headers, the full sample table) and the QuickTime File
Format spec (the uncompressed ``raw ``/``twos``/``sowt`` sample-entry
semantics).  Three capability levels, honestly separated:

- **Container metadata** (``parse_mp4``) works for ANY conformant file
  regardless of codec: brands, movie timescale/duration, per-track
  handler, codec fourcc, dimensions / channel layout, sample counts and
  timing — everything a 100-TB training-data pipeline needs to filter,
  route and shard video rows WITHOUT touching a codec.
- **Demux** (``Mp4Track.sample_spans`` via stsc/stco/stsz resolution)
  yields every sample's exact (file_offset, size) so payload bytes of
  any track can be extracted codec-free.
- **Decode** (``decode_mp4_video`` / ``decode_mp4_audio``) is complete
  for the uncompressed codecs: ``raw `` 24-bit RGB video and
  ``twos``/``sowt`` 16-bit PCM audio.  Compressed codecs (avc1, hvc1,
  vp09, av01, mp4a, ...) raise NotImplementedError at the exact point
  libavcodec would plug in — this container ships no codec library.

The muxer (``encode_mp4_raw_video`` / ``encode_mp4_pcm_audio``) writes
spec-conformant minimal files (ftyp + mdat + moov with a full sample
table, multi-chunk on the video path so the stsc walk is exercised),
which is what makes the decoder testable end-to-end in-sandbox and
lets the driver contract check the demux byte-exactly.

Reference parity: xapian-core indexes text only; this module is a
Spark-era extension (SURVEY §2 training-data-pipeline ops), playing the
role omega delegates to external filter programs (omega/docs/omegascript
-> external converters) but kept in-engine so the mapInPandas plumbing
in ops/multimodal.py stays one codebase.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# box types whose body is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf", b"udta",
}

# fourccs this module can fully decode (everything else demuxes only)
UNCOMPRESSED_VIDEO = {"raw "}
UNCOMPRESSED_AUDIO = {"twos", "sowt"}


def _u16(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 2], "big")


def _u32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 4], "big")


def _u64(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 8], "big")


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end).

    Handles size==1 (64-bit largesize) and size==0 (box extends to the
    enclosing scope's end) per 14496-12 §4.2."""
    pos = start
    while pos + 8 <= end:
        size = _u32(buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = _u64(buf, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise ValueError(
                f"mp4: malformed box {fourcc!r} at {pos} (size {size})"
            )
        yield fourcc, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: str = ""          # 'vide' | 'soun' | ...
    codec: str = ""            # sample-entry fourcc
    timescale: int = 0         # media timescale (mdhd)
    duration: int = 0          # media duration in timescale units
    width: int = 0             # video: pixels (tkhd 16.16 -> int)
    height: int = 0
    depth: int = 0             # video sample-entry depth (bits)
    channels: int = 0          # audio
    sample_bits: int = 0       # audio sample size (bits)
    sample_rate: int = 0       # audio (stsd 16.16 -> int)
    n_samples: int = 0
    sample_sizes: list = field(default_factory=list)   # per-sample bytes
    chunk_offsets: list = field(default_factory=list)  # stco/co64
    stsc: list = field(default_factory=list)  # (first_chunk, per_chunk, sdi)
    stts: list = field(default_factory=list)  # (count, delta)

    @property
    def duration_ms(self) -> int:
        if not self.timescale:
            return 0
        return self.duration * 1000 // self.timescale

    def sample_spans(self) -> list:
        """Resolve the sample table to absolute (offset, size) per sample
        (14496-12 §8.7): walk chunks, expanding stsc runs, advancing by
        the preceding samples' sizes within each chunk."""
        spans = []
        n_chunks = len(self.chunk_offsets)
        si = 0
        for ci in range(n_chunks):
            per_chunk = 0
            for first, per, _sdi in self.stsc:
                if first <= ci + 1:
                    per_chunk = per
                else:
                    break
            off = self.chunk_offsets[ci]
            for _ in range(per_chunk):
                if si >= self.n_samples:
                    break
                size = self.sample_sizes[si]
                spans.append((off, size))
                off += size
                si += 1
        if si != self.n_samples:
            raise ValueError(
                f"mp4: sample table inconsistent ({si} placed, "
                f"{self.n_samples} declared)"
            )
        return spans


@dataclass
class Mp4Info:
    major_brand: str = ""
    timescale: int = 0        # movie timescale (mvhd)
    duration: int = 0         # movie duration in timescale units
    tracks: list = field(default_factory=list)

    @property
    def duration_ms(self) -> int:
        if not self.timescale:
            return 0
        return self.duration * 1000 // self.timescale

    def track(self, handler: str) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == handler:
                return t
        return None


def _parse_stsd(buf: bytes, b: int, e: int, tr: Mp4Track) -> None:
    n = _u32(buf, b + 4)
    p = b + 8
    for _ in range(n):
        esize = _u32(buf, p)
        tr.codec = buf[p + 4 : p + 8].decode("latin-1")
        # 6 reserved bytes + data_reference_index(2) then media-specific
        q = p + 16
        if tr.handler == "vide":
            # pre_defined(2) reserved(2) pre_defined(12) w(2) h(2)
            tr.width = _u16(buf, q + 16)
            tr.height = _u16(buf, q + 18)
            # hres(4) vres(4) reserved(4) frame_count(2) name(32) depth(2)
            tr.depth = _u16(buf, q + 66)
        elif tr.handler == "soun":
            # version(2) revision(2) vendor(4) channels(2) bits(2)
            tr.channels = _u16(buf, q + 8)
            tr.sample_bits = _u16(buf, q + 10)
            # compression_id(2) packet_size(2) rate(16.16)
            tr.sample_rate = _u16(buf, q + 16)
        p += esize
        break  # first sample description governs (single-sdi files)


def _parse_stbl(buf: bytes, b: int, e: int, tr: Mp4Track) -> None:
    for fc, cb, ce in _walk(buf, b, e):
        if fc == b"stsd":
            _parse_stsd(buf, cb, ce, tr)
        elif fc == b"stts":
            n = _u32(buf, cb + 4)
            tr.stts = [
                (_u32(buf, cb + 8 + 8 * i), _u32(buf, cb + 12 + 8 * i))
                for i in range(n)
            ]
        elif fc == b"stsz":
            const = _u32(buf, cb + 4)
            cnt = _u32(buf, cb + 8)
            tr.n_samples = cnt
            if const:
                tr.sample_sizes = [const] * cnt
            else:
                tr.sample_sizes = [
                    _u32(buf, cb + 12 + 4 * i) for i in range(cnt)
                ]
        elif fc == b"stsc":
            n = _u32(buf, cb + 4)
            tr.stsc = [
                (
                    _u32(buf, cb + 8 + 12 * i),
                    _u32(buf, cb + 12 + 12 * i),
                    _u32(buf, cb + 16 + 12 * i),
                )
                for i in range(n)
            ]
        elif fc == b"stco":
            n = _u32(buf, cb + 4)
            tr.chunk_offsets = [_u32(buf, cb + 8 + 4 * i) for i in range(n)]
        elif fc == b"co64":
            n = _u32(buf, cb + 4)
            tr.chunk_offsets = [_u64(buf, cb + 8 + 8 * i) for i in range(n)]


def _parse_trak(buf: bytes, b: int, e: int) -> Mp4Track:
    tr = Mp4Track()
    tkhd = _find(buf, b, e, b"tkhd")
    if tkhd:
        tb = tkhd[0]
        ver = buf[tb]
        tr.track_id = _u32(buf, tb + (20 if ver else 12))
        # width/height are the LAST 8 bytes of tkhd, 16.16 fixed point
        tr.width = _u32(buf, tkhd[1] - 8) >> 16
        tr.height = _u32(buf, tkhd[1] - 4) >> 16
    mdia = _find(buf, b, e, b"mdia")
    if not mdia:
        return tr
    mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        mb = mdhd[0]
        if buf[mb]:  # version 1
            tr.timescale = _u32(buf, mb + 20)
            tr.duration = _u64(buf, mb + 24)
        else:
            tr.timescale = _u32(buf, mb + 12)
            tr.duration = _u32(buf, mb + 16)
    hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        tr.handler = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
    minf = _find(buf, mdia[0], mdia[1], b"minf")
    if minf:
        stbl = _find(buf, minf[0], minf[1], b"stbl")
        if stbl:
            _parse_stbl(buf, stbl[0], stbl[1], tr)
    return tr


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse container metadata + full sample tables; codec-independent."""
    info = Mp4Info()
    saw_box = False
    for fc, b, e in _walk(payload, 0, len(payload)):
        saw_box = True
        if fc == b"ftyp":
            info.major_brand = payload[b : b + 4].decode("latin-1")
        elif fc == b"moov":
            for mfc, mb, me in _walk(payload, b, e):
                if mfc == b"mvhd":
                    if payload[mb]:  # version 1
                        info.timescale = _u32(payload, mb + 20)
                        info.duration = _u64(payload, mb + 24)
                    else:
                        info.timescale = _u32(payload, mb + 12)
                        info.duration = _u32(payload, mb + 16)
                elif mfc == b"trak":
                    info.tracks.append(_parse_trak(payload, mb, me))
    if not saw_box or not info.tracks:
        raise ValueError("mp4: no moov/trak found — not an ISO BMFF file")
    return info


def demux_track(payload: bytes, tr: Mp4Track) -> list:
    """Raw sample payloads (codec-free byte extraction)."""
    return [payload[o : o + s] for o, s in tr.sample_spans()]


def decode_mp4_video(payload: bytes) -> tuple:
    """Decode the first video track -> ((n, h, w, 3) uint8 RGB, fps).

    Only the uncompressed ``raw `` 24-bit RGB sample entry decodes;
    compressed codecs raise with the codec named."""
    info = parse_mp4(payload)
    tr = info.track("vide")
    if tr is None:
        raise ValueError("mp4: no video track")
    if tr.codec not in UNCOMPRESSED_VIDEO:
        raise NotImplementedError(
            f"mp4: real decode of codec {tr.codec!r} requires a codec "
            "library (ffmpeg/libavcodec) — this container ships none; "
            "metadata + demux remain available"
        )
    if tr.depth not in (0, 24):
        raise NotImplementedError(f"mp4: 'raw ' depth {tr.depth} != 24")
    h, w = tr.height, tr.width
    frames = np.stack(
        [
            np.frombuffer(s, np.uint8).reshape(h, w, 3)
            for s in demux_track(payload, tr)
        ]
    )
    # fps from the dominant stts delta in the media timescale
    delta = tr.stts[0][1] if tr.stts else 1
    fps = tr.timescale // max(delta, 1)
    return frames, fps


def decode_mp4_audio(payload: bytes) -> tuple:
    """Decode the first audio track -> (int16 samples [n, channels], rate).

    ``twos`` = big-endian signed PCM, ``sowt`` = little-endian (QuickTime
    spec); anything else raises."""
    info = parse_mp4(payload)
    tr = info.track("soun")
    if tr is None:
        raise ValueError("mp4: no audio track")
    if tr.codec not in UNCOMPRESSED_AUDIO:
        raise NotImplementedError(
            f"mp4: real decode of codec {tr.codec!r} requires a codec "
            "library — metadata + demux remain available"
        )
    raw = b"".join(demux_track(payload, tr))
    dt = ">i2" if tr.codec == "twos" else "<i2"
    x = np.frombuffer(raw, dt).astype(np.int16)
    ch = max(tr.channels, 1)
    return x.reshape(-1, ch), tr.sample_rate


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + body)


def _mvhd(timescale: int, duration: int) -> bytes:
    body = (
        (0).to_bytes(8, "big")                       # creation+modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")            # rate 1.0
        + (0x0100).to_bytes(2, "big")                # volume 1.0
        + bytes(10)                                   # reserved
        + _UNITY_MATRIX
        + bytes(24)                                   # pre_defined
        + (2).to_bytes(4, "big")                     # next_track_ID
    )
    return _full(b"mvhd", 0, body)


_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + bytes(4) * 2
    + bytes(4) + (0x00010000).to_bytes(4, "big") + bytes(4)
    + bytes(4) * 2 + (0x40000000).to_bytes(4, "big")
)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    body = (
        (0).to_bytes(8, "big")
        + track_id.to_bytes(4, "big")
        + bytes(4)
        + duration.to_bytes(4, "big")
        + bytes(8)                                    # reserved
        + bytes(2) * 2                                # layer, alt group
        + bytes(2)                                    # volume
        + bytes(2)                                    # reserved
        + _UNITY_MATRIX
        + (w << 16).to_bytes(4, "big")
        + (h << 16).to_bytes(4, "big")
    )
    # flags: enabled | in_movie
    return _box(b"tkhd", bytes([0, 0, 0, 3]) + body)


def _mdhd(timescale: int, duration: int) -> bytes:
    body = (
        (0).to_bytes(8, "big")
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x55C4).to_bytes(2, "big")                # language 'und'
        + bytes(2)
    )
    return _full(b"mdhd", 0, body)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(b"hdlr", 0, bytes(4) + handler + bytes(12) + name + b"\0")


def _dinf() -> bytes:
    url = _box(b"url ", bytes([0, 0, 0, 1]))         # self-contained flag
    return _box(b"dinf", _full(b"dref", 0, (1).to_bytes(4, "big") + url))


def _stts(entries: list) -> bytes:
    body = len(entries).to_bytes(4, "big") + b"".join(
        c.to_bytes(4, "big") + d.to_bytes(4, "big") for c, d in entries
    )
    return _full(b"stts", 0, body)


def _stsc(entries: list) -> bytes:
    body = len(entries).to_bytes(4, "big") + b"".join(
        f.to_bytes(4, "big") + p.to_bytes(4, "big") + s.to_bytes(4, "big")
        for f, p, s in entries
    )
    return _full(b"stsc", 0, body)


def _stsz(const: int, sizes: list) -> bytes:
    body = const.to_bytes(4, "big") + len(sizes).to_bytes(4, "big")
    if not const:
        body += b"".join(s.to_bytes(4, "big") for s in sizes)
    return _full(b"stsz", 0, body)


def _stco(offsets: list) -> bytes:
    body = len(offsets).to_bytes(4, "big") + b"".join(
        o.to_bytes(4, "big") for o in offsets
    )
    return _full(b"stco", 0, body)


def encode_mp4_raw_video(
    frames: np.ndarray,
    fps: int = 10,
    chunk_samples: int = 3,
    codec: str = "raw ",
) -> bytes:
    """Minimal conformant MP4: one ``raw `` 24-bit RGB video track.

    Chunks of ``chunk_samples`` frames (last one ragged) so decoders
    must actually walk stsc/stco, not assume one chunk.  ``codec``
    overrides the sample-entry fourcc — used by tests to build
    compressed-codec-labeled files for the honest-raise path."""
    assert frames.dtype == np.uint8 and frames.ndim == 4
    n, h, w, ch = frames.shape
    assert ch == 3
    samples = [f.tobytes() for f in frames]
    ssize = h * w * 3
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp41")
    mdat = _box(b"mdat", b"".join(samples))
    mdat_payload = len(ftyp) + 8

    n_chunks = -(-n // chunk_samples)
    offsets = [mdat_payload + ci * chunk_samples * ssize
               for ci in range(n_chunks)]
    stsc_entries = [(1, chunk_samples, 1)]
    rem = n - (n_chunks - 1) * chunk_samples
    if n_chunks > 1 and rem != chunk_samples:
        stsc_entries.append((n_chunks, rem, 1))
    if n_chunks == 1:
        stsc_entries = [(1, n, 1)]

    # video sample entry (QuickTime 'raw ': uncompressed RGB, depth 24)
    entry = (
        bytes(6) + (1).to_bytes(2, "big")            # data_ref_index
        + bytes(2) * 2 + bytes(12)                   # pre_defined/reserved
        + w.to_bytes(2, "big") + h.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2        # 72 dpi
        + bytes(4)
        + (1).to_bytes(2, "big")                     # frame_count
        + bytes(32)                                   # compressorname
        + (24).to_bytes(2, "big")                    # depth
        + (0xFFFF).to_bytes(2, "big")                # color_table_id -1
    )
    stsd = _full(
        b"stsd", 0,
        (1).to_bytes(4, "big") + _box(codec.encode("latin-1"), entry),
    )
    stbl = _box(
        b"stbl",
        stsd + _stts([(n, 1)]) + _stsc(stsc_entries)
        + _stsz(ssize, samples) + _stco(offsets),
    )
    vmhd = _box(b"vmhd", bytes([0, 0, 0, 1]) + bytes(8))
    minf = _box(b"minf", vmhd + _dinf() + stbl)
    mdia = _box(b"mdia", _mdhd(fps, n) + _hdlr(b"vide", b"video") + minf)
    movie_dur = n * 1000 // fps
    trak = _box(b"trak", _tkhd(1, movie_dur, w, h) + mdia)
    moov = _box(b"moov", _mvhd(1000, movie_dur) + trak)
    return ftyp + mdat + moov


def encode_mp4_pcm_audio(
    samples: np.ndarray, rate: int = 8000, codec: str = "sowt"
) -> bytes:
    """Minimal MP4 with one PCM audio track (QuickTime 'sowt'/'twos')."""
    assert samples.dtype == np.int16
    x = samples.reshape(len(samples), -1)
    n, ch = x.shape
    raw = x.astype("<i2" if codec == "sowt" else ">i2").tobytes()
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp41")
    mdat = _box(b"mdat", raw)
    bps = 2 * ch
    entry = (
        bytes(6) + (1).to_bytes(2, "big")
        + bytes(2) * 2 + bytes(4)                    # version/rev/vendor
        + ch.to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes(2) * 2                               # compression/packet
        + (rate << 16).to_bytes(4, "big")
    )
    stsd = _full(
        b"stsd", 0,
        (1).to_bytes(4, "big") + _box(codec.encode("latin-1"), entry),
    )
    stbl = _box(
        b"stbl",
        stsd + _stts([(n, 1)]) + _stsc([(1, n, 1)])
        + _stsz(bps, [bps] * n) + _stco([len(ftyp) + 8]),
    )
    smhd = _full(b"smhd", 0, bytes(4))
    minf = _box(b"minf", smhd + _dinf() + stbl)
    mdia = _box(b"mdia", _mdhd(rate, n) + _hdlr(b"soun", b"audio") + minf)
    movie_dur = n * 1000 // rate
    trak = _box(b"trak", _tkhd(1, movie_dur, 0, 0) + mdia)
    moov = _box(b"moov", _mvhd(1000, movie_dur) + trak)
    return ftyp + mdat + moov
