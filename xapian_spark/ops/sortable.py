"""Order-preserving double serialization (Xapian sortable_serialise).

Byte-level parity with the reference encoding
(`xapian-core/api/sortable-serialise.cc:48-260`): doubles map to byte
strings whose lexicographic order equals numeric order, with short
encodings for common values (0 -> b"\\x80", small integers 5 bytes).

The Spark engine stores values as REAL typed columns (native predicates,
min/max pruning), so this codec exists for interop parity: reading or
writing value slots exchanged with a byte-oriented xapian database, and
for golden tests of the §1.1 data-model mapping.

Known reference quirk (reproduced here for byte parity — verified by
compiling the reference's exact logic): for NEGATIVE doubles whose low
32 mantissa bits are nonzero, the post-negation carry goes to +1 on the
high word (sortable-serialise.cc:148-150) where a 58-bit two's-complement
negation needs -1 — so e.g. -0.5000000000755905 encodes lexicographically
AFTER -0.5.  Order preservation holds exactly for all non-negative
doubles and for negatives with a zero low mantissa word (which includes
every float32-representable and small-integer value).
"""

from __future__ import annotations

import math

_U32 = 0xFFFFFFFF


def _neg_u32(x: int) -> int:
    return (-x) & _U32


def sortable_serialise(value: float) -> bytes:
    # Negative infinity -> empty string
    if value == float("-inf"):
        return b""
    if math.isnan(value):
        # reference relies on IEEE comparisons; NaN is caller error — mirror
        # the < -DBL_MAX fallthrough by treating it as 0-adjacent is wrong,
        # so reject explicitly.
        raise ValueError("cannot serialise NaN")

    mantissa, exponent = math.frexp(value)

    if mantissa == 0.0 or exponent < -2039:
        return b"\x80"

    negative = mantissa < 0
    if negative:
        mantissa = -mantissa

    # Positive infinity (negative inf handled above)
    if value == float("inf") or exponent > 2055:
        return b"\xff" * 9

    buf = bytearray()
    nxt = 0x00 if negative else 0xE0

    exponent -= 8
    exponent_negative = exponent < 0
    if exponent_negative:
        exponent = -exponent
        nxt ^= 0x60

    if exponent < 8:
        nxt ^= 0x20
        nxt |= exponent << 2
        if negative ^ exponent_negative:
            nxt ^= 0x1C
    else:
        nxt |= exponent >> 6
        if negative ^ exponent_negative:
            nxt ^= 0x1F
        buf.append(nxt & 0xFF)
        nxt = (exponent << 2) & 0xFF
        if negative ^ exponent_negative:
            nxt ^= 0xFC

    mantissa *= 1 << (26 if negative else 27)
    word1 = int(mantissa)
    mantissa -= word1
    word2 = int(mantissa * 4294967296.0)

    if negative:
        word1 = _neg_u32(word1)
        if word2 != 0:
            word1 = (word1 + 1) & _U32
        word2 = _neg_u32(word2)

    word1 &= 0x03FFFFFF
    nxt |= word1 >> 24
    buf.append(nxt & 0xFF)
    buf.append((word1 >> 16) & 0xFF)
    buf.append((word1 >> 8) & 0xFF)
    buf.append(word1 & 0xFF)
    buf.append((word2 >> 24) & 0xFF)
    buf.append((word2 >> 16) & 0xFF)
    buf.append((word2 >> 8) & 0xFF)
    buf.append(word2 & 0xFF)

    while buf and buf[-1] == 0:
        buf.pop()
    return bytes(buf)


def _num(data: bytes, pos: int) -> int:
    return data[pos] if pos < len(data) else 0


def sortable_unserialise(data: bytes) -> float:
    if len(data) == 1 and data[0] == 0x80:
        return 0.0
    if len(data) == 9 and data == b"\xff" * 9:
        return float("inf")
    if not data:
        return float("-inf")

    first = _num(data, 0)
    i = 0

    first ^= (first & 0xC0) >> 1
    negative = not (first & 0x80)
    exponent_negative = bool(first & 0x40)
    explen = not (first & 0x20)
    exponent = first & 0x1F
    if not explen:
        exponent >>= 2
        if negative ^ exponent_negative:
            exponent ^= 0x07
    else:
        i += 1
        first = _num(data, i)
        exponent <<= 6
        exponent |= first >> 2
        if negative ^ exponent_negative:
            exponent ^= 0x07FF

    word1 = (first & 0x03) << 24
    i += 1
    word1 |= _num(data, i) << 16
    i += 1
    word1 |= _num(data, i) << 8
    i += 1
    word1 |= _num(data, i)

    word2 = 0
    if i < len(data):
        i += 1
        word2 = _num(data, i) << 24
        i += 1
        word2 |= _num(data, i) << 16
        i += 1
        word2 |= _num(data, i) << 8
        i += 1
        word2 |= _num(data, i)

    if negative:
        word1 = _neg_u32(word1)
        if word2 != 0:
            word1 = (word1 + 1) & _U32
        word2 = _neg_u32(word2)
        word1 &= 0x03FFFFFF
    if not negative:
        word1 |= 1 << 26

    mantissa = 0.0
    if word2:
        mantissa = word2 / 4294967296.0
    mantissa += word1
    mantissa /= 1 << (26 if negative else 27)

    if exponent_negative:
        exponent = -exponent
    exponent += 8

    if negative:
        mantissa = -mantissa

    return math.ldexp(mantissa, exponent)
