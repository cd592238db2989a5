"""HTML-to-text extraction for crawl curation (r14).

Before any text operator runs, a crawl pipeline reduces raw HTML to
prose: drop script/style payloads, strip tags, decode the common
entities, collapse whitespace. This module is that pass as pure column
expressions (chained ``regexp_replace`` — JVM-side, codegen, zero
shuffles, scan-speed at any corpus scale). It is deliberately the
REGULAR fragment of extraction: a full boilerplate model (readability /
trafilatura class) needs a DOM, which is not regular — what ships here
is the deterministic normalization layer those tools also start from.

Every pattern is valid in BOTH Java regex (Spark) and RE2 (DuckDB) —
inline ``(?s)``/``(?i)`` flags and lazy quantifiers, no lookaround — so
the driver oracle replays the identical chain (two-engine regex
differential), and :func:`synthetic_html_texts` plants closed-form
markup from id arithmetic for the independent pytest pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) chain, in order. Script/style payloads go
#: FIRST (their text content must not leak into prose), then comments,
#: then tags, then entities, then whitespace normalization.
HTML_STRIP_CHAIN = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"\s+", " "),
)


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def html_to_text(html: Column | str) -> Column:
    """Prose text of an HTML fragment: the :data:`HTML_STRIP_CHAIN`
    applied in order, then trimmed. Entity decode runs AFTER tag
    removal, so literal ``&lt;b&gt;`` in the source renders as the text
    ``<b>`` instead of becoming a strippable tag — the same order every
    serious extractor uses."""
    out = _as_col(html)
    for pat, repl in HTML_STRIP_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def html_strip(df: DataFrame, html_col: str = "html",
               id_col: str = "doc_id") -> DataFrame:
    """Extraction audit table: the extracted text plus the size ratio
    (text length / markup length, per-mille) — the signal crawl
    pipelines threshold on to drop chrome-only pages. Narrow projection,
    no shuffle."""
    text = html_to_text(html_col)
    return df.select(
        _as_col(id_col),
        text.alias("text"),
        F.length(html_col).alias("html_len"),
        F.length(text).alias("text_len"),
        F.floor(
            F.length(text) * F.lit(1000)
            / F.greatest(F.length(html_col), F.lit(1))
        ).cast("long").alias("text_ratio_pm"),
    )


# ---------------------------------------------------------------------------
# Synthetic planting — deterministic, SQL-parity, closed-form prose.
# ---------------------------------------------------------------------------

def synthetic_html_texts(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Wrap the corpus text in deterministic markup driven by id
    arithmetic: a heading when ``id % 3 == 0``, an inline script payload
    (which must vanish entirely) when ``id % 4 == 0``, an attribute-heavy
    anchor when ``id % 5 == 0``, an entity-encoded snippet when
    ``id % 7 == 0``, and an HTML comment when ``id % 11 == 0``. The
    closed-form extracted text is derivable from the same arithmetic
    (tests/test_html.py pins it): the script body ``junk<id>();`` never
    appears, the anchor contributes ``link<id%9>``, the entities decode
    to ``a&b <tag> 'q'``."""
    i = _as_col(id_col)
    head = F.when(
        i % 3 == 0,
        F.concat(F.lit("<h1 class=\"t\">Title "), (i % 6).cast("string"),
                 F.lit("</h1> ")),
    ).otherwise(F.lit(""))
    script = F.when(
        i % 4 == 0,
        F.concat(F.lit("<script type=\"text/javascript\">junk"),
                 i.cast("string"), F.lit("();\nmore();</script>")),
    ).otherwise(F.lit(""))
    anchor = F.when(
        i % 5 == 0,
        F.concat(F.lit(" <a href=\"/p?id="), i.cast("string"),
                 F.lit("&amp;v=1\" rel=\"nofollow\">link"),
                 (i % 9).cast("string"), F.lit("</a>")),
    ).otherwise(F.lit(""))
    entity = F.when(
        i % 7 == 0, F.lit(" a&amp;b &lt;tag&gt; &#39;q&#39;")
    ).otherwise(F.lit(""))
    comment = F.when(
        i % 11 == 0, F.lit("<!-- hidden\nnote -->")
    ).otherwise(F.lit(""))
    return docs.select(
        _as_col(id_col),
        F.concat(head, script, F.lit("<p>"), _as_col(text_col),
                 F.lit("</p>"), anchor, entity, comment).alias("html"),
    )
