"""PII detection / redaction expressions for training-corpus hygiene.

Before text reaches a pre-training mix, the standard scrub pass removes or
pseudonymizes direct identifiers (emails, phone numbers, IP addresses —
the pattern classes the public corpus pipelines document, e.g. the BigScience
ROOTS / Dolma PII filters). Everything here is a NATIVE column expression
(regexp_replace / regexp_extract_all / md5) — JVM-side, whole-stage-codegen,
zero Python UDFs — so a scrub of 100 TB is a pure map stage with no shuffle.

Patterns deliberately stick to the regex subset with identical semantics in
Java regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
word boundaries — so every redaction is oracle-verifiable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# TPC-H-style international phone: CC-DDD-DDD-DDDD (also the shape OpenF1
# driver-contact exports use); extend with locale patterns at the call site.
PHONE_RE = r"\b\d{2}-\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def count_matches(col: Column, pattern: str) -> Column:
    """How many times ``pattern`` occurs in ``col`` (int)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def mask_emails(col: Column, token: str = "<EMAIL>") -> Column:
    return F.regexp_replace(col, EMAIL_RE, token)


def mask_phones(col: Column, token: str = "<PHONE>") -> Column:
    return F.regexp_replace(col, PHONE_RE, token)


def mask_ipv4(col: Column, token: str = "<IP>") -> Column:
    return F.regexp_replace(col, IPV4_RE, token)


def scrub_pii(col: Column) -> Column:
    """Full scrub: emails, then phones, then IPv4 addresses.

    Email runs first so the later passes see already-neutralized text.
    A numeric-host address like ``user@1.2.3.4`` is not a strict-RE email
    (no alphabetic TLD) and falls through to the IP mask → ``user@<IP>``:
    the routable identifier is still removed, just by the later pass.
    """
    return mask_ipv4(mask_phones(mask_emails(col)))


def pseudonymize(col: Column, salt: str) -> Column:
    """Deterministic salted pseudonym: 12 hex chars of md5(salt || value).

    Replaces an identifier with a stable token so joins/aggregations over the
    scrubbed corpus still link records of the same entity, without exposing
    the value. Same construction as the portable oracle hash, so it is
    reproducible cross-engine; rotate ``salt`` per release to break linkage
    across corpus versions.
    """
    return F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 12)
