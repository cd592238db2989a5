"""HTML-to-text extraction (ext/html.py, r14): closed-form planted
extraction, chain-order semantics, and edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from skylogix_real_time_weather_data_pipeline_spark.ext.html import (
    html_strip,
    html_to_text,
    synthetic_html_texts,
)


def _extract(spark, htmls):
    df = spark.createDataFrame([(h,) for h in htmls], "html string")
    return [r[0] for r in df.select(html_to_text("html")).collect()]


def test_extraction_edge_cases(spark):
    cases = {
        # script/style payloads vanish entirely, including across newlines
        "<p>keep</p><script>\nvar x = 'gone';\n</script><p>this</p>":
            "keep this",
        "<style>.a { color: red }</style>text": "text",
        # case-insensitive tags
        "<SCRIPT>nope()</SCRIPT>after": "after",
        # comments vanish, multi-line
        "a <!-- secret\nnote --> b": "a b",
        # attribute-heavy tags strip whole
        "<a href=\"/x?a=1&amp;b=2\" rel=\"nofollow\">link</a>": "link",
        # entity decode AFTER tag strip: literal &lt;b&gt; stays text
        "x &lt;b&gt; y &amp; z &#39;q&#39; &quot;w&quot;":
            "x <b> y & z 'q' \"w\"",
        # whitespace collapse + trim
        "  <p>a</p>\n\n<p>b</p>  ": "a b",
    }
    got = _extract(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: got {g!r}"


def test_planted_extraction_matches_closed_form(spark):
    """Two-path pin: extraction over the planted markup equals the text
    the id arithmetic predicts — script payloads never leak, anchors
    contribute their link text, entities decode."""
    base = "alpha beta"
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text"))
    got = {r["doc_id"]: r["text"]
           for r in html_strip(synthetic_html_texts(docs)).collect()}
    for i in range(200):
        parts = []
        if i % 3 == 0:
            parts.append(f"Title {i % 6}")
        parts.append(base)
        if i % 5 == 0:
            parts.append(f"link{i % 9}")
        if i % 7 == 0:
            parts.append("a&b <tag> 'q'")
        want = " ".join(parts)
        assert got[i] == want, (i, got[i], want)
        assert f"junk{i}" not in got[i]  # script payload never leaks


def test_ratio_thresholds_chrome_only_pages(spark):
    """The text/markup ratio separates prose pages from chrome-only
    ones — the drop signal crawl pipelines use."""
    df = spark.createDataFrame(
        [(1, "<div><nav><a href='/'>home</a></nav></div>" * 20),
         (2, "<p>" + ("real prose content here " * 50) + "</p>")],
        "doc_id long, html string")
    got = {r["doc_id"]: r["text_ratio_pm"] for r in html_strip(df).collect()}
    assert got[1] < 150          # chrome-dominated
    assert got[2] > 900          # prose-dominated
