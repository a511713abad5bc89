"""ops/pii.py — PII detection and redaction."""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from xapian_spark.ops.pii import (  # noqa: E402
    REDACTIONS,
    pii_redact,
    pii_report,
    pii_scan,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["id", "text"]
    )


SAMPLES = [
    "plain text with no pii at all",
    "mail me at alice.smith+dev@sub.example.co.uk today",
    "two mails a@b.io and c_d%e@f-g.org in one line",
    "call +4915123456789 or 415-555-0199 now",
    "host 192.168.0.1 and 10.0.255.254 up",
    "leaked token sk-abcDEF0123456789xyzw in a commit",
    "mixed bob@example.com at 127.0.0.1 phone +12025550142",
    "",
]


def test_scan_counts(spark):
    rows = pii_scan(_df(spark, SAMPLES), "id", "text").orderBy("id").collect()
    got = [
        (r.n_emails, r.n_phones, r.n_ipv4, r.n_secrets, r.n_pii) for r in rows
    ]
    assert got == [
        (0, 0, 0, 0, 0),
        (1, 0, 0, 0, 1),
        (2, 0, 0, 0, 2),
        (0, 2, 0, 0, 2),
        (0, 0, 2, 0, 2),
        (0, 0, 0, 1, 1),
        (1, 1, 1, 0, 3),
        (0, 0, 0, 0, 0),
    ]


def test_redaction_text(spark):
    rows = (
        pii_redact(_df(spark, SAMPLES), "id", "text").orderBy("id").collect()
    )
    got = [r.text_redacted for r in rows]
    assert got[1] == "mail me at <EMAIL> today"
    assert got[3] == "call <PHONE> or <PHONE> now"
    assert got[4] == "host <IP> and <IP> up"
    assert got[5] == "leaked token <SECRET> in a commit"
    assert got[6] == "mixed <EMAIL> at <IP> phone <PHONE>"
    # no raw PII survives anywhere
    for t in got:
        assert "@" not in t and not re.search(r"\d{3}-\d{3}-\d{4}", t)


def test_report_matches_scan_plus_redact(spark):
    df = _df(spark, SAMPLES)
    rep = {r.id: r for r in pii_report(df, "id", "text").collect()}
    scan = {r.id: r for r in pii_scan(df, "id", "text").collect()}
    red = {r.id: r for r in pii_redact(df, "id", "text").collect()}
    for i in rep:
        assert rep[i].n_pii == scan[i].n_pii
        assert rep[i].text_redacted == red[i].text_redacted


def test_python_re_ground_truth(spark):
    """Independent check: Spark's sequential redaction equals Python re
    applying the same ordered pattern list."""
    rows = (
        pii_redact(_df(spark, SAMPLES), "id", "text").orderBy("id").collect()
    )
    for r, raw in zip(rows, SAMPLES):
        expect = raw
        for pat, tag in REDACTIONS:
            expect = re.sub(pat, tag, expect)
        assert r.text_redacted == expect


def test_email_digits_not_double_counted_as_phone(spark):
    # 10+ digit local part must not count as an E.164 phone
    df = _df(spark, ["reach 12345678901@example.com ok"])
    r = pii_scan(df, "id", "text").collect()[0]
    assert (r.n_emails, r.n_phones) == (1, 0)
