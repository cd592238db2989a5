"""PII detection/redaction (ext/pii.py, r14): closed-form planted counts,
the ordered-pass contract, idempotence, and pattern edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from skylogix_real_time_weather_data_pipeline_spark.ext.pii import (
    pii_counts,
    pii_redact,
    synthetic_pii_texts,
)


def test_planted_counts_match_closed_form(spark):
    """Two-path pin: detection counts from the regex chain must equal the
    id-arithmetic closed form — including the detection/redaction split
    on id % 9 rows, where the planted email host embeds a dotted-quad
    (a DETECTION hit for the IP class; consumed by the email pass before
    the IP pass in REDACTION)."""
    docs = spark.range(0, 315).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text"))
    d = synthetic_pii_texts(docs)

    det = {r["doc_id"]: (r["email_n"], r["ipv4_n"], r["phone_n"], r["pii_total"])
           for r in pii_counts(d).collect()}
    red = {r["doc_id"]: (r["email_n"], r["ipv4_n"], r["phone_n"])
           for r in pii_redact(d).collect()}
    for i in range(315):
        e = 1 if i % 3 == 0 else 0
        ip_det = (1 if i % 5 == 0 else 0) + (1 if i % 9 == 0 else 0)
        ip_red = 1 if i % 5 == 0 else 0
        ph = 1 if i % 7 == 0 else 0
        assert det[i] == (e, ip_det, ph, e + ip_det + ph), i
        assert red[i] == (e, ip_red, ph), i


def test_redaction_order_email_consumes_embedded_ip(spark):
    df = spark.createDataFrame(
        [(1, "write to ops@10.0.0.5.example.org today"),
         (2, "server 10.0.0.5 is down"),
         (3, "mail me at a.b+tag@mail.example.co.uk or +44 207 9460000")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in pii_redact(df).collect()}
    assert got[1] == "write to [EMAIL] today"
    assert got[2] == "server [IP] is down"
    assert got[3] == "mail me at [EMAIL] or [PHONE]"


def test_redaction_is_idempotent_and_total_scrub(spark):
    """pii_counts over redacted text must be all-zero: placeholders carry
    no residual matches, and nothing survives the three passes."""
    d = synthetic_pii_texts(spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit("plain words here").alias("text")))
    clean = pii_redact(d).select(
        "doc_id", F.col("clean_text").alias("text"))
    residual = pii_counts(clean).agg(F.sum("pii_total").alias("s")).collect()
    assert residual[0]["s"] == 0


def test_pattern_edges(spark):
    cases = {
        # octet range check: 256 is not an IP octet
        "at 256.1.1.1 nothing": 0,
        "at 255.255.255.255 yes": 1,
        # a 5-part version string DOES yield one quad match ("2.3.4.5" —
        # \b is a word boundary, '.' is not a word char): the known
        # false-positive class every regex-based scrubber accepts, pinned
        # here so a pattern change that silently alters it is visible
        "v1.2.3.4.5 release": 1,
        # prose numbers without + are not phones
        "chapter 12 345 6789 end": 0,
        # bare TLD-less token is not an email
        "user@localhost says hi": 0,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string")
    got = {r["doc_id"]: r["pii_total"] for r in pii_counts(df).collect()}
    for i, (t, want) in enumerate(cases.items()):
        assert got[i] == want, t
