"""GIF87a/89a codec, from scratch against the public GIF specification
(CompuServe GIF89a spec / W3C note) — stdlib + numpy only.

Decoder: logical screen + global/local color tables, LZW decompression
with variable code width and Clear/EOI handling, interlaced images
(the four-pass row order), multi-frame animations with the Graphic
Control Extension (frame disposal modes 0-3, transparency index,
per-frame delay).  ``decode_gif`` returns the composited RGBA frame
stack + per-frame delays; ``decode_gif_image`` the first composited
frame as RGB.

Encoder (fixture-grade, like the PNG/JPEG/MP4 muxers): real LZW
compression with code-width growth and dictionary reset at 4096, so
the decoder's full code path is exercised by round-trip tests rather
than a degenerate literal stream.  Supports animation (one image block
per frame + GCE) and interlace.

Reference parity: xapian-core indexes text; this is a Spark-era
training-data-pipeline extension alongside ops/{png,jpeg,mp4}.py.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, MSB-last bit packing per byte,
# Clear and EOI codes, max code 4095)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> list:
    """GIF LZW -> list of palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # dictionary as list of tuples of indices
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_code_size + 1
    prev: tuple | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # tolerate missing EOI (common in the wild)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def lzw_encode(indices, min_code_size: int) -> bytes:
    """Indices -> GIF LZW stream (with Clear resets at table overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    seq: tuple = ()
    for idx in indices:
        idx = int(idx)
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        # grow width AFTER assigning (decoder grows when table fills)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (idx,)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


def _interlace_order(h: int) -> list:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> tuple:
    """-> ((n_frames, h, w, 4) uint8 RGBA composited frames, delays_ms).

    Frames are composited onto the logical screen per the GCE disposal
    semantics: 0/1 leave the canvas, 2 restores the frame rect to
    transparent-background, 3 restores the previous canvas."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    # bg_index = payload[11]; aspect = payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 4), np.uint8)
    frames = []
    delays = []
    # pending GCE state
    transparent = -1
    disposal = 0
    delay_ms = 0

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                block = payload[pos + 1 : pos + 1 + size]
                flags = block[0]
                disposal = (flags >> 2) & 0x07
                delay_ms = int.from_bytes(block[1:3], "little") * 10
                transparent = block[3] if flags & 0x01 else -1
            # skip this extension's sub-blocks
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix = int.from_bytes(payload[pos + 1 : pos + 3], "little")
            iy = int.from_bytes(payload[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("gif: image with no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(
                lzw_decode(bytes(data), min_code)[: iw * ih], np.int32
            ).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: rows arrive in pass order
                ordered = np.empty_like(idx)
                ordered[_interlace_order(ih)] = idx
                idx = ordered

            saved = canvas.copy() if disposal == 3 else None
            rgba = np.concatenate(
                [ct[idx], np.full((ih, iw, 1), 255, np.uint8)], axis=2
            )
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = rgba[mask]
            else:
                region[:] = rgba
            frames.append(canvas.copy())
            delays.append(delay_ms)
            if disposal == 2:
                canvas[iy : iy + ih, ix : ix + iw] = 0
            elif disposal == 3 and saved is not None:
                canvas = saved
            transparent = -1
            disposal = 0
            delay_ms = 0
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x} at {pos}")
    if not frames:
        raise ValueError("gif: no image data")
    return np.stack(frames), delays


def decode_gif_image(payload: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    frames, _ = decode_gif(payload)
    return frames[0, :, :, :3]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames_idx,
    palette: np.ndarray,
    delays_ms=None,
    interlace: bool = False,
    transparent: int = -1,
) -> bytes:
    """Indexed frames + shared palette -> GIF89a (GIF87a if single frame,
    no transparency, no interlace... still emitted as 89a for one header
    path).  ``frames_idx``: list of (h, w) uint8 index arrays (all full
    logical-screen size here; fixture-grade).  ``palette``: (n, 3) uint8
    with n a power of two >= 2."""
    frames_idx = [np.asarray(f, np.uint8) for f in frames_idx]
    h, w = frames_idx[0].shape
    n = len(palette)
    assert n >= 2 and (n & (n - 1)) == 0, "palette size must be a power of 2"
    ctbits = max((n - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (ctbits - 1), 0, 0])
    out += np.asarray(palette, np.uint8).tobytes()
    min_code = max(ctbits, 2)
    for fi, frame in enumerate(frames_idx):
        delay = (delays_ms[fi] if delays_ms else 0) // 10
        if delays_ms or transparent >= 0:
            flags = (1 if transparent >= 0 else 0)
            if len(frames_idx) > 1:
                flags |= 0x04  # disposal 1 (leave in place)
            out += bytes([0x21, 0xF9, 4, flags])
            out += delay.to_bytes(2, "little")
            out += bytes([max(transparent, 0), 0])
        out += b"\x2c" + bytes(4)  # descriptor at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        rows = frame[_interlace_order(h)] if interlace else frame
        out += bytes([min_code])
        out += _sub_blocks(lzw_encode(rows.ravel(), min_code))
    out += b"\x3b"
    return bytes(out)
