"""PII detection and redaction for training-data pipelines.

Not a reference operator; part of the Spark-era LLM-pipeline surface next
to ops/textstats.py and ops/dedup.py.  Pretraining corpora are scrubbed of
emails / phone numbers / IP addresses / credential-shaped strings before
training; the scrub must be deterministic (reruns and backfills produce
byte-identical text) and cheap enough to ride the ingest scan.

Everything here is pure Catalyst regexp work — `regexp_extract_all` for
counting and sequential `regexp_replace` for redaction — so it runs inside
whole-stage codegen with zero shuffle and pipelines with the parquet scan
at 100 TB.  The patterns deliberately use only the regex subset with
identical semantics in Java regex (Spark) and RE2 (DuckDB): character
classes, bounded repetition, non-capturing groups and ``\\b`` — no
backreferences, no lookaround — so an ANSI-SQL oracle can replay the scrub
exactly.

Redaction is ordered (emails, then secrets, then phones, then IPv4) and
each class is replaced by a stable tag; order matters because the later
patterns could otherwise match inside the span of an earlier one (a phone
digit-run inside an e-mail local part).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex == RE2 subset only (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SECRET_RE = r"\b(?:sk|pk|key|token)-[A-Za-z0-9]{16,}\b"
PHONE_E164_RE = r"\+\d{7,15}\b"
PHONE_US_RE = r"\b\d{3}-\d{3}-\d{4}\b"
# Deliberately loose (standard scrub simplification): accepts out-of-range
# octets (999.999.999.999) and version-number-like quads in prose, i.e. it
# over-redacts rather than leaking.  A tighter bound would stay in the
# Java∩RE2 subset via octet alternation
# (25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d) — swap in if under-redaction of
# version strings ever matters more than recall.
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (pattern, replacement tag) in redaction order.
REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (SECRET_RE, "<SECRET>"),
    (PHONE_E164_RE, "<PHONE>"),
    (PHONE_US_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def _count_cols(text_col: str) -> list[Column]:
    """The five aliased count columns shared by pii_scan / pii_report.

    E.164/IPv4 counting must not re-count digit runs inside e-mail local
    parts or secrets, so those two count on the email/secret-redacted
    text — exactly as the ordered redaction pass sees it."""
    t = F.col(text_col)
    emails = _count(t, EMAIL_RE)
    secrets = _count(t, SECRET_RE)
    t2 = F.regexp_replace(
        F.regexp_replace(t, F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(SECRET_RE),
        F.lit("<SECRET>"),
    )
    phones = _count(t2, PHONE_E164_RE) + _count(t2, PHONE_US_RE)
    ipv4 = _count(t2, IPV4_RE)
    return [
        emails.cast("int").alias("n_emails"),
        phones.cast("int").alias("n_phones"),
        ipv4.cast("int").alias("n_ipv4"),
        secrets.cast("int").alias("n_secrets"),
        (emails + phones + ipv4 + secrets).cast("int").alias("n_pii"),
    ]


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_emails, n_phones, n_ipv4, n_secrets, n_pii): per-document
    PII match counts.  Emails and secrets count on the raw text; phone
    and IPv4 counts run on the email/secret-REDACTED text (see
    _count_cols) so digit runs inside an e-mail local part or a secret
    are not double-counted.  Note phone and IPv4 are both counted at
    that same partial-redaction stage, while redacted_text() applies
    PHONE before IP — in the (practically disjoint) case of a phone
    match overlapping a dotted quad, n_ipv4 could disagree with the
    <IP> tags in text_redacted.  Phone = E.164 + US dashed forms.
    Pure Catalyst, no shuffle."""
    return df.select(F.col(id_col).alias("id"), *_count_cols(text_col))


def redacted_text(text_col: str) -> Column:
    """The redacted-text column expression: sequential class-tag
    replacement in the module's fixed order."""
    out = F.col(text_col)
    for pattern, tag in REDACTIONS:
        out = F.regexp_replace(out, F.lit(pattern), F.lit(tag))
    return out


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text_redacted): text with every PII span replaced by its
    class tag (<EMAIL>/<SECRET>/<PHONE>/<IP>).  Deterministic: identical
    output for identical input on any run, any partitioning."""
    return df.select(
        F.col(id_col).alias("id"),
        redacted_text(text_col).alias("text_redacted"),
    )


def pii_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """pii_scan's counts + the redacted text in ONE select — a single
    pass over the corpus (what a 100-TB scrub job runs), no self-join."""
    return df.select(
        F.col(id_col).alias("id"),
        *_count_cols(text_col),
        redacted_text(text_col).alias("text_redacted"),
    )
