"""Range processors: RangeProcessor / DateRangeProcessor /
NumberRangeProcessor (re-derivation of `xapian-core/api/valuerangeproc.cc`).

The reference's processors turn `lo..hi` query syntax into value-slot
ranges; each processor may carry a marker string required as a prefix
(`$10..50`) or suffix (`10..50kg`) of the range (check_range,
valuerangeproc.cc:122-160).  Dates normalize to YYYYMMDD strings
(format_yyyymmdd, :115-120) — the omega convention for date value slots —
accepting YYYYMMDD, YYYY-MM-DD (also `.` and `/` separators), and
D/M/Y-or-M/D/Y forms disambiguated exactly like the reference
(decode_xxy/vet_dm + the begin<=end heuristic, :173-245).  Numbers parse
to float; by default they compare against typed numeric columns
(Spark-first: value slots are typed DataFrame columns), with
`serialise=True` routing through the sortable codec (ops/sortable.py) for
byte-parity with reference-stored slots (NumberRangeProcessor,
:250-305).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from xapian_spark.query import ast

_MAX_MONTH_LEN = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _decode_xxy(s: str) -> tuple[int, int, int] | None:
    """(x1, x2, y) from 'xx<sep>xx<sep>y+' with sep in /-. — or None.
    Empty string decodes to (-1, -1, -1) (open end).  Mirrors
    valuerangeproc.cc:39-69."""
    if s == "":
        return (-1, -1, -1)
    m = re.fullmatch(r"(\d{1,2})([/.-])(\d{1,2})\2(\d{1,4})", s)
    if not m:
        return None
    x1, x2, y = int(m.group(1)), int(m.group(3)), int(m.group(4))
    if not (1 <= x1 <= 31) or not (1 <= x2 <= 31):
        return None
    return (x1, x2, y)


def _vet_dm(d: int, m: int) -> bool:
    """Plausibility of day-d in month-m (valuerangeproc.cc:76-86)."""
    if m == -1:
        return True
    if m < 1 or m > 12:
        return False
    return 1 <= d <= _MAX_MONTH_LEN[m - 1]


def _yyyymmdd(y: int, m: int, d: int) -> str:
    return f"{y % 10000:04d}{m % 100:02d}{d % 100:02d}"


@dataclass
class RangeProcessor:
    """Base: marker matching + a plain string value range.

    field:  docs-table column this processor filters on
    marker: literal string required on the range (e.g. "$", "kg",
            "date:"); empty accepts any range
    suffix: marker is required at the END of the range (RP_SUFFIX)
    repeated: marker may optionally appear on both halves (RP_REPEATED)
    """

    field: str
    marker: str = ""
    suffix: bool = False
    repeated: bool = False

    def check_range(self, b: str, e: str) -> ast.Node | None:
        """Marker handling (valuerangeproc.cc:122-160): strip the marker
        and delegate to __call__, or None when the range isn't ours."""
        if self.marker:
            if not self.suffix:
                if not b.startswith(self.marker):
                    return None
                b = b[len(self.marker):]
                if self.repeated and e.startswith(self.marker):
                    e = e[len(self.marker):]
            else:
                if not e.endswith(self.marker):
                    return None
                e = e[: len(e) - len(self.marker)]
                if self.repeated and b.endswith(self.marker):
                    b = b[: len(b) - len(self.marker)]
        return self(b, e)

    def __call__(self, b: str, e: str) -> ast.Node | None:
        """OP_VALUE_GE when e is empty, else OP_VALUE_RANGE
        (valuerangeproc.cc:164-170)."""
        return ast.ValueRange(self.field, b or None, e or None)


@dataclass
class DateRangeProcessor(RangeProcessor):
    """Date ranges normalized to YYYYMMDD strings
    (valuerangeproc.cc:173-245)."""

    prefer_mdy: bool = False  # RP_DATE_PREFER_MDY
    epoch_year: int = 1970    # 2-digit year pivot

    def __call__(self, b: str, e: str) -> ast.Node | None:
        digits = re.compile(r"\d{8}")
        if (len(b) in (0, 8) and len(e) in (0, 8)
                and (not b or digits.fullmatch(b))
                and (not e or digits.fullmatch(e))):
            return super().__call__(b, e)
        ymd = re.compile(r"(\d{4})([-./])(\d\d)\2(\d\d)")
        if len(b) in (0, 10) and len(e) in (0, 10):
            mb = ymd.fullmatch(b) if b else None
            me = ymd.fullmatch(e) if e else None
            if (not b or mb) and (not e or me):
                nb = "".join(mb.group(1, 3, 4)) if mb else ""
                ne = "".join(me.group(1, 3, 4)) if me else ""
                return super().__call__(nb, ne)

        db = _decode_xxy(b)
        de = _decode_xxy(e)
        if db is None or de is None:
            return None
        b_d, b_m, b_y = db
        e_d, e_m, e_y = de
        # D/M/Y vs M/D/Y disambiguation with the begin<=end heuristic
        # (valuerangeproc.cc:203-218)
        if (not self.prefer_mdy and _vet_dm(b_d, b_m) and _vet_dm(e_d, e_m)
                and (b_y != e_y or b_m < e_m
                     or (b_m == e_m and b_d <= e_d))):
            pass
        elif (_vet_dm(b_m, b_d) and _vet_dm(e_m, e_d)
                and (b_y != e_y or b_d < e_d
                     or (b_d == e_d and b_m <= e_m))):
            b_m, b_d = b_d, b_m
            e_m, e_d = e_d, e_m
        elif (self.prefer_mdy and _vet_dm(b_d, b_m) and _vet_dm(e_d, e_m)
                and (b_y != e_y or b_m < e_m
                     or (b_m == e_m and b_d <= e_d))):
            pass
        else:
            return None

        def fix_year(y: int) -> int:
            if 0 <= y < 100:
                y += 1900
                if y < self.epoch_year:
                    y += 100
            return y

        nb = _yyyymmdd(fix_year(b_y), b_m, b_d) if b else ""
        ne = _yyyymmdd(fix_year(e_y), e_m, e_d) if e else ""
        return super(DateRangeProcessor, self).__call__(nb, ne)


_NUM_RE = re.compile(r"-?(\d+(\.\d*)?|\.\d+)([eE][-+]?\d+)?")

# B/K/M/G = 1024^0..3 (valuerangeproc.cc:311-329)
_BYTE_UNITS = {"B": 1.0, "K": 1024.0, "M": 1024.0 ** 2, "G": 1024.0 ** 3}


@dataclass
class NumberRangeProcessor(RangeProcessor):
    """Numeric ranges (valuerangeproc.cc:250-305).  serialise=True emits
    sortable_serialise'd string bounds (byte-parity with reference slots
    written via Xapian::sortable_serialise); default compares floats
    against a typed numeric column (Spark-first value slots)."""

    serialise: bool = False

    def __call__(self, b: str, e: str) -> ast.Node | None:
        num_b = num_e = None
        if b:
            if not _NUM_RE.fullmatch(b):
                return None
            num_b = float(b)
        if e:
            if not _NUM_RE.fullmatch(e):
                return None
            num_e = float(e)
        if self.serialise:
            from xapian_spark.ops.sortable import sortable_serialise

            lo = sortable_serialise(num_b) if num_b is not None else None
            hi = sortable_serialise(num_e) if num_e is not None else None
            return ast.ValueRange(self.field, lo, hi)
        return ast.ValueRange(self.field, num_b, num_e)


@dataclass
class UnitRangeProcessor(RangeProcessor):
    """Byte-unit numeric ranges, e.g. ``size:3K..10M``
    (queryparser.h:409-442, UnitRangeProcessor::operator(),
    valuerangeproc.cc:331-434).

    Suffix B/K/M/G multiplies by 1024^0..3.  Reference semantics: the END
    bound must carry a unit (``20..100K``); a unitless BEGIN inherits the
    end bound's factor; a begin-only range (``200K..``) requires the unit
    on the begin; anything else is not our range.  The unit must be
    exactly the final character (strtod endptr == size-1 in the
    reference).  serialise mirrors NumberRangeProcessor.
    """

    serialise: bool = False

    def __call__(self, b: str, e: str) -> ast.Node | None:
        num_b = num_e = None
        b_has_unit = False
        if b:
            m = _NUM_RE.match(b)
            if not m:
                return None
            num_b = float(m.group(0))
            rest = b[m.end():]
            if rest:
                if rest not in _BYTE_UNITS:
                    return None
                num_b *= _BYTE_UNITS[rest]
                b_has_unit = True
        if e:
            m = _NUM_RE.match(e)
            if not m:
                return None
            num_e = float(m.group(0))
            rest = e[m.end():]
            if rest not in _BYTE_UNITS:
                return None
            num_e *= _BYTE_UNITS[rest]
            if b and not b_has_unit:
                num_b *= _BYTE_UNITS[rest]
        elif b and not b_has_unit:
            # fail case when the lower bound has no unit, e.g. "200.."
            return None
        if self.serialise:
            from xapian_spark.ops.sortable import sortable_serialise

            lo = sortable_serialise(num_b) if num_b is not None else None
            hi = sortable_serialise(num_e) if num_e is not None else None
            return ast.ValueRange(self.field, lo, hi)
        return ast.ValueRange(self.field, num_b, num_e)
