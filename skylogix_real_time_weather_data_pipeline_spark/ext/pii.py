"""PII detection and redaction for training-data curation (r14).

Every production pre-training pipeline runs a PII pass before text
ships (emails, IP addresses, phone numbers at minimum — the classes the
public C4/RefinedWeb/ROOTS curation write-ups scrub); this module is
that pass as pure column expressions: ``regexp_count`` for per-document
detection stats and chained ``regexp_replace`` for redaction. JVM-side,
whole-stage-codegen, zero shuffles — a narrow scan-speed projection at
any corpus scale, exactly like the quality-filter family.

Every pattern is valid in BOTH Java regex (Spark) and RE2 (DuckDB): no
lookaround, no backreferences — so the driver oracle replays the
identical chain and the comparison is a true two-engine differential of
the regex semantics, while the planted synthetic corpus
(:func:`synthetic_pii_texts`) additionally pins counts against a CLOSED
FORM derived from id arithmetic (the synthetic_urls two-path pattern).

Redaction order is part of the contract: emails first (an email's host
may embed an IP-shaped quad — ``user@10.0.0.5.example.org`` must redact
as ONE email, not an email plus a leftover IP), then IPs, then phones.

This module is the CANONICAL pattern source (r14): ``text.PII_PATTERNS``
— the r2-era single-pass scrub behind ``docs_pii_scrub`` — re-derives
from :data:`PII_CLASSES` with its legacy ``<TAG>`` placeholders, so the
two surfaces can never drift. Relative to the r2 list, the IPv4 class
gained the per-octet 0-255 range check; the phone alternation is carried
over verbatim (its false-positive regressions are pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RFC-5322-lite email shape — the practical crawl-scrubbing form (the
#: full grammar is not regular; every public pipeline uses this class).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: Dotted-quad IPv4 with per-octet range check (0-255) — no lookarounds,
#: anchored by word boundaries so version strings like 1.2.3.4.5 don't
#: half-match.
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_PATTERN = rf"\b({_OCT}\.){{3}}{_OCT}\b"

#: Phone alternation, carried over verbatim from the r2-era
#: ``text.PII_PATTERNS`` (this module canonicalizes that list — see
#: module doc): international +-prefixed, US (xxx) xxx-xxxx, and bare
#: separator-tight digit runs. The r2 ADVICE regression (a ``\s`` inside
#: an unbounded span ate whitespace-separated year/id lists) is pinned in
#: tests/test_ext.py and must survive any edit here.
PHONE_PATTERN = (
    r"\+[0-9](?:[\s()\-]{0,2}[0-9]){6,14}"
    r"|\(?[0-9]{3}\)[\s]?[0-9]{3}[\s\-]?[0-9]{4}"
    r"|[0-9](?:[()\-]?[0-9]){8,14}"
)

#: (name, pattern, replacement) in REDACTION ORDER (see module doc).
PII_CLASSES = (
    ("email", EMAIL_PATTERN, "[EMAIL]"),
    ("ipv4", IPV4_PATTERN, "[IP]"),
    ("phone", PHONE_PATTERN, "[PHONE]"),
)


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII detection stats: one match count per PII class
    plus the total — the audit table a curation run reviews (and
    thresholds on: documents dense in PII are usually scraped directories
    or dumps, dropped rather than redacted). Pure regexp_count
    projection, no shuffle."""
    counts = [
        F.regexp_count(_as_col(text_col), F.lit(pat)).alias(f"{name}_n")
        for name, pat, _ in PII_CLASSES
    ]
    out = df.select(_as_col(id_col), *counts)
    total = None
    for name, _, _ in PII_CLASSES:
        c = F.col(f"{name}_n")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def pii_redact(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Redacted text + per-class removal counts: each PII class replaced
    by its placeholder IN ORDER (emails consume embedded IP-shaped hosts
    before the IP pass runs). Counts are computed on the pre-redaction
    text for the class's own pass order — i.e. what that regexp_replace
    actually replaced."""
    t = _as_col(text_col)
    cols = [_as_col(id_col)]
    redacted = t
    for name, pat, repl in PII_CLASSES:
        cols.append(F.regexp_count(redacted, F.lit(pat)).alias(f"{name}_n"))
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(*cols, redacted.alias("clean_text"))


# ---------------------------------------------------------------------------
# Synthetic planting — deterministic, SQL-parity, closed-form counts.
# ---------------------------------------------------------------------------

def synthetic_pii_texts(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Append deterministic PII to the corpus text, driven by id
    arithmetic: an email when ``id % 3 == 0`` (its host EMBEDS a
    dotted-quad when additionally ``id % 9 == 0`` —
    ``user@10.0.0.X.example.org`` — the redaction-order trap), an IPv4
    when ``id % 5 == 0``, a phone when ``id % 7 == 0``. Closed-form
    per-doc counts (the two-path pytest pin; the base corpus text is
    word-salad with no '@'/'+'/dotted-quad tokens, asserted separately):

    - DETECTION (:func:`pii_counts`, each class on the raw text):
      email_n = [id%3==0]; ipv4_n = [id%5==0] + [id%9==0] (the embedded
      host quad IS a detection hit); phone_n = [id%7==0].
    - REDACTION (:func:`pii_redact`, ordered passes): ipv4_n drops the
      [id%9==0] term — the email pass consumed the host before the IP
      pass ran. The difference IS the order contract.
    """
    i = _as_col(id_col)
    email_host = F.when(
        i % 9 == 0,
        F.concat(F.lit("10.0.0."), (i % 200).cast("string"),
                 F.lit(".example.org")),
    ).otherwise(F.concat(F.lit("mail"), (i % 4).cast("string"),
                         F.lit(".example.org")))
    email = F.when(
        i % 3 == 0,
        F.concat(F.lit(" contact user"), (i % 50).cast("string"),
                 F.lit("@"), email_host),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 5 == 0,
        F.concat(F.lit(" from 192.168."), (i % 256).cast("string"),
                 F.lit("."), (i % 100).cast("string")),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 7 == 0,
        F.concat(F.lit(" call +1 555 "),
                 F.lpad((i % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return docs.withColumn(
        text_col, F.concat(_as_col(text_col), email, ip, phone)
    )
