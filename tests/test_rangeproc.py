"""Range processor goldens from the reference's api_queryparser.cc
(qp_daterange1 :2134-2170, qp_daterange2 :2172-2225, qp_stringrange1
:2227-2260) — same inputs, same normalized bounds."""

from __future__ import annotations

import pytest

from xapian_spark.query import ast
from xapian_spark.query.parser import QueryParser
from xapian_spark.query.rangeproc import (
    DateRangeProcessor,
    NumberRangeProcessor,
    RangeProcessor,
)


def _range(qp: QueryParser, q: str) -> ast.ValueRange:
    node = qp.parse_query(q)
    assert isinstance(node, ast.ValueRange), node
    return node


# qp_daterange1: DateRangeProcessor(1, RP_DATE_PREFER_MDY, 1960)
DATERANGE1 = [
    ("12/03/99..12/04/01", "19991203", "20011204"),
    ("03-12-99..04-14-01", "19990312", "20010414"),
    ("01/30/60..02/02/59", "19600130", "20590202"),
    ("1999-03-12..2001-04-14", "19990312", "20010414"),
]


@pytest.mark.parametrize("q,lo,hi", DATERANGE1)
def test_daterange1_goldens(q, lo, hi):
    qp = QueryParser()
    qp.add_rangeprocessor(
        DateRangeProcessor("d", prefer_mdy=True, epoch_year=1960)
    )
    node = _range(qp, q)
    assert (node.lo, node.hi) == (lo, hi)


@pytest.mark.parametrize("q", ["12/03/99..02", "1999-03-12..2001"])
def test_daterange1_errors(q):
    qp = QueryParser()
    qp.add_rangeprocessor(
        DateRangeProcessor("d", prefer_mdy=True, epoch_year=1960)
    )
    with pytest.raises(ValueError, match="Unknown range"):
        qp.parse_query(q)


# qp_daterange2: four prefixed processors; default-flag one parses DMY
DATERANGE2 = [
    ("created:12/03/99..12/04/01", "created", "19991203", "20011204"),
    ("modified:03-12-99..04-14-01", "modified", "19990312", "20010414"),
    ("accessed:01/30/70..02/02/69", "accessed", "19700130", "20690202"),
    ("deleted:12/03/99..12/04/01", "deleted", "19990312", "20010412"),
]


def _qp2() -> QueryParser:
    qp = QueryParser()
    for f in ("created", "modified", "accessed"):
        qp.add_rangeprocessor(
            DateRangeProcessor(f, marker=f + ":", prefer_mdy=True,
                               epoch_year=1970)
        )
    qp.add_rangeprocessor(DateRangeProcessor("deleted", marker="deleted:"))
    return qp


@pytest.mark.parametrize("q,field,lo,hi", DATERANGE2)
def test_daterange2_goldens(q, field, lo, hi):
    node = _range(_qp2(), q)
    assert node.field == field
    assert (node.lo, node.hi) == (lo, hi)


@pytest.mark.parametrize(
    "q",
    ["1999-03-12..2001-04-14", "12/03/99..created:12/04/01",
     "12/03/99created:..12/04/01", "12/03/99..12/04/01created:",
     "12/03/99..02", "1999-03-12..2001"],
)
def test_daterange2_errors(q):
    with pytest.raises(ValueError, match="Unknown range"):
        _qp2().parse_query(q)


def test_stringrange_goldens():
    qp = QueryParser()
    qp.add_rangeprocessor(RangeProcessor("tag", marker="tag:"))
    qp.add_rangeprocessor(RangeProcessor("v0"))
    node = _range(qp, "tag:bar..foo")
    assert (node.field, node.lo, node.hi) == ("tag", "bar", "foo")
    node = _range(qp, "bar..foo")
    assert (node.field, node.lo, node.hi) == ("v0", "bar", "foo")


def test_open_ended_and_yyyymmdd():
    qp = QueryParser()
    qp.add_rangeprocessor(DateRangeProcessor("d", marker="date:"))
    node = _range(qp, "date:20200101..20201231")
    assert (node.lo, node.hi) == ("20200101", "20201231")
    node = _range(qp, "date:20200101..")
    assert (node.lo, node.hi) == ("20200101", None)  # VALUE_GE
    node = _range(qp, "date:..20201231")
    assert (node.lo, node.hi) == (None, "20201231")


def test_number_rangeprocessor():
    qp = QueryParser()
    qp.add_rangeprocessor(NumberRangeProcessor("price", marker="$"))
    node = _range(qp, "$10..50")
    assert (node.field, node.lo, node.hi) == ("price", 10.0, 50.0)
    # repeated marker allowed only with repeated=True
    with pytest.raises(ValueError):
        qp.parse_query("$10..$50")
    qp2 = QueryParser()
    qp2.add_rangeprocessor(
        NumberRangeProcessor("price", marker="$", repeated=True)
    )
    node = _range(qp2, "$10..$50")
    assert (node.lo, node.hi) == (10.0, 50.0)
    # suffix marker (10..50kg)
    qp3 = QueryParser()
    qp3.add_rangeprocessor(
        NumberRangeProcessor("weight", marker="kg", suffix=True)
    )
    node = _range(qp3, "10..50kg")
    assert (node.field, node.lo, node.hi) == ("weight", 10.0, 50.0)


def test_number_serialised_bounds():
    from xapian_spark.ops.sortable import sortable_serialise

    qp = QueryParser()
    qp.add_rangeprocessor(
        NumberRangeProcessor("slot0", marker="n:", serialise=True)
    )
    node = _range(qp, "n:1.5..2.5")
    assert node.lo == sortable_serialise(1.5)
    assert node.hi == sortable_serialise(2.5)


def test_range_combines_as_filter():
    """term + range -> Filter(term, range); two same-slot ranges OR."""
    qp = QueryParser()
    qp.add_rangeprocessor(DateRangeProcessor("d", marker="date:"))
    node = qp.parse_query("hello date:20200101..20201231")
    assert isinstance(node, ast.Filter)
    assert isinstance(node.left, ast.Term)
    assert isinstance(node.right, ast.ValueRange)
    node = qp.parse_query(
        "hello date:20200101..20200131 date:20210101..20210131"
    )
    assert isinstance(node, ast.Filter)
    assert isinstance(node.right, ast.Or)


def test_rangeproc_does_not_break_field_qualifiers():
    """Registering a RangeProcessor must not hijack field-qualified
    range tokens handled by range_fields / field_processors (regression:
    the rangeproc check used to raise before field parsing ran)."""
    qp = QueryParser(range_fields={"n_chars": "n_chars"})
    qp.add_rangeprocessor(DateRangeProcessor("date_val", marker="date:"))
    node = qp.parse_query("join n_chars:120..360")
    assert isinstance(node, ast.Filter)
    vr = node.right
    assert (vr.field, vr.lo, vr.hi) == ("n_chars", 120.0, 360.0)
    # field processors also win over the unknown-range error
    qp2 = QueryParser()
    qp2.add_rangeprocessor(DateRangeProcessor("d", marker="date:"))
    qp2.add_field_processor("span", lambda text: ast.Term("SP" + text))
    assert qp2.parse_query("span:a..b") == ast.Term("SPa..b")
    # truly unclaimed ranges still raise
    import pytest as _pt

    with _pt.raises(ValueError, match="Unknown range"):
        qp2.parse_query("1999-03-12..2001")


# qp_range5 / test_unitrange1_queries (api_queryparser.cc:2091-2105):
# UnitRangeProcessor(1, "size:") — B/K/M/G byte units, end unit required,
# unitless begin inherits the end's factor
UNITRANGE1 = [
    ("size:100K..1M", 100.0 * 1024, 1024.0 ** 2),
    ("size:1B..1G", 1.0, 1024.0 ** 3),
    # interpret as size:10K..100K
    ("size:10..100K", 10.0 * 1024, 100.0 * 1024),
]


@pytest.mark.parametrize("q,lo,hi", UNITRANGE1)
def test_unitrange_goldens(q, lo, hi):
    from xapian_spark.query.rangeproc import UnitRangeProcessor

    qp = QueryParser()
    qp.add_rangeprocessor(UnitRangeProcessor("size_val", marker="size:"))
    node = _range(qp, q)
    assert (node.lo, node.hi) == (lo, hi)


def test_unitrange_single_ended():
    from xapian_spark.query.rangeproc import UnitRangeProcessor

    qp = QueryParser()
    qp.add_rangeprocessor(UnitRangeProcessor("size_val", marker="size:"))
    node = _range(qp, "size:10K..")
    assert (node.lo, node.hi) == (10.0 * 1024, None)
    node = _range(qp, "size:..2M")
    assert (node.lo, node.hi) == (None, 2.0 * 1024 ** 2)


@pytest.mark.parametrize(
    "q", ["size:10B..100", "size:10..100", "size:..100", "size:10.."]
)
def test_unitrange_forbidden(q):
    """The reference rejects these as 'Unknown range operation'."""
    from xapian_spark.query.rangeproc import UnitRangeProcessor

    qp = QueryParser()
    qp.add_rangeprocessor(UnitRangeProcessor("size_val", marker="size:"))
    with pytest.raises(ValueError, match="Unknown range"):
        qp.parse_query(q)


def test_unitrange_serialise_mode():
    """serialise=True routes bounds through sortable_serialise — byte
    parity with reference-stored slots (the class contract in
    queryparser.h:404-407)."""
    from xapian_spark.ops.sortable import sortable_serialise
    from xapian_spark.query.rangeproc import UnitRangeProcessor

    qp = QueryParser()
    qp.add_rangeprocessor(
        UnitRangeProcessor("size_val", marker="size:", serialise=True)
    )
    node = _range(qp, "size:100K..1M")
    assert node.lo == sortable_serialise(102400.0)
    assert node.hi == sortable_serialise(1048576.0)
