"""URL operators for large-scale training-data pipelines (r13).

Canonicalization, URL-level dedup, registrable-domain mix, and URL
decontamination — the standard pre-training curation steps that run on
the crawl-metadata side of the corpus (CCNet/RefinedWeb-style pipelines
dedup on canonical URL before ever touching document text, because the
URL join is orders of magnitude cheaper than content sharding).

All column-expression based (JVM-side, whole-stage codegen) — no Python
UDFs, nothing row-at-a-time. Every regex used here is anchored or
lookaround-free so the SAME pattern is valid in Java regex (Spark) and
RE2 (DuckDB), letting the oracle mirror each step exactly.

Scale notes: canonicalization is a narrow projection (no shuffle);
``url_dedup`` shuffles once on the canonical-url hash — the natural
partitioning key, no skew beyond genuine mega-duplicates; domain mix is
a low-cardinality groupBy with map-side partials;
``url_decontaminate`` broadcasts the benchmark's canonical set (a
100k-URL eval suite is a few MB) so the corpus side needs no shuffle.

The synthetic generator at the bottom exists because the test corpus
(/root/testdata documents.parquet) carries no URL column: it derives a
deterministic URL per doc_id with planted canonical collisions, the same
pattern multimodal.synthetic_texture_assets uses for images.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters stripped by canonicalization — the query-string
#: noise that splits otherwise-identical crawl URLs (RE2- and Java-valid).
TRACKING_PARAM_PATTERN = "(utm_[a-z]+|fbclid|gclid|msclkid)"

#: Embedded multi-label public-suffix set (r14 — the r13 5-entry sample
#: mis-grouped *.github.io-style hosts on real crawls): a curated slice
#: of the public suffix list (publicsuffix.org — the Mozilla-maintained
#: public dataset), covering the common ccSLD families plus the
#: high-traffic private-section hosting domains. Hosts ending in a
#: 2-label entry keep THREE labels in their registrable domain (3-label
#: entries keep four). A production deployment swaps in the FULL list
#: through the same operators: these tuples seed
#: :func:`default_psl_frame`, and :func:`registrable_domain_psl` is the
#: broadcast-join form that takes any suffix table.
PUBLIC_SUFFIXES_2 = (
    # ccSLD families (ICANN section)
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.za", "org.za", "net.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke",
    "com.gh", "org.gh", "edu.gh", "gov.gh",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "or.th", "in.th", "ac.th", "go.th",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    # high-traffic private-section hosting/platform domains
    "github.io", "gitlab.io", "gitbook.io", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "blogspot.com",
    "appspot.com", "herokuapp.com", "azurewebsites.net",
    "cloudfront.net", "wixsite.com", "weebly.com", "neocities.org",
    "readthedocs.io", "sourceforge.io", "bitbucket.io",
)

#: 3-label public-suffix entries (same provenance) — hosts ending in one
#: of these keep FOUR labels in their registrable domain. Small because
#: the 3-label section of the list is dominated by the US k12/cc/lib
#: state families and region-scoped cloud endpoints.
PUBLIC_SUFFIXES_3 = (
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.ma.us", "k12.wa.us", "k12.pa.us", "k12.oh.us", "k12.mi.us",
    "cc.ca.us", "cc.ny.us", "lib.ca.us", "lib.ny.us",
    "act.edu.au", "nsw.edu.au", "vic.edu.au", "qld.edu.au",
    "s3.amazonaws.com", "compute.amazonaws.com",
)


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url: Column | str) -> Column:
    """Lower-cased scheme ('' when absent)."""
    return F.lower(F.regexp_extract(_as_col(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column | str) -> Column:
    """Lower-cased host with any ``www.`` prefix and any port removed."""
    hostport = F.lower(
        F.regexp_extract(_as_col(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    return F.regexp_replace(
        F.regexp_replace(hostport, "^www\\.", ""), ":[0-9]+$", ""
    )


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain of a host per public-suffix semantics: the
    longest matching suffix from the embedded PSL slice keeps one extra
    label (3-label suffix → last four labels, 2-label → last three);
    otherwise the last two labels. A single-label host is returned as-is
    (it has no registrable domain — grouping on itself beats '').

    r14: the r13 regex-alternation over a 5-entry sample became a
    label-slice + IN-set form — the set compiles to a JVM InSet (a
    literal broadcast membership, O(1) per row regardless of set size),
    so the embedded ~200-entry slice costs the same as 5 did, and the
    full publicsuffix.org list swaps in via the broadcast-join twin
    :func:`registrable_domain_psl`."""
    host = _as_col(host)
    labels = F.split(host, "\\.")
    n = F.size(labels)

    def last(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    return (
        F.when((n > 3) & last(3).isin(*PUBLIC_SUFFIXES_3), last(4))
        .when((n > 2) & last(2).isin(*PUBLIC_SUFFIXES_2), last(3))
        .when(n >= 2, last(2))
        .otherwise(host)
    )


def default_psl_frame(spark) -> DataFrame:
    """(suffix, nlabels) rows of the embedded public-suffix slice — the
    seed a deployment replaces with the full publicsuffix.org dump (same
    two columns; the list is ~10k multi-label rows, i.e. kilobytes —
    always broadcastable)."""
    rows = sorted(
        [(s, 2) for s in PUBLIC_SUFFIXES_2]
        + [(s, 3) for s in PUBLIC_SUFFIXES_3]
    )
    return spark.createDataFrame(rows, "suffix string, nlabels int")


def registrable_domain_psl(df: DataFrame, psl: DataFrame,
                           host_col: str = "host",
                           out_col: str = "domain") -> DataFrame:
    """Registrable domain against an ARBITRARY suffix table — the
    production full-PSL path :data:`PUBLIC_SUFFIXES_2`'s docstring
    promises: two broadcast left-joins (the host's 3-label candidate
    against the 3-label entries, then 2-label against 2-label) and a
    longest-match coalesce. The corpus side never shuffles — the PSL is
    kilobytes at any corpus scale — and the semantics match
    :func:`registrable_domain` exactly when ``psl`` is
    :func:`default_psl_frame` (pytest-pinned)."""
    labels = F.split(F.col(host_col), "\\.")
    n = F.size(labels)

    def last(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    p3 = psl.filter(F.col("nlabels") == 3).select(F.col("suffix").alias("_s3"))
    p2 = psl.filter(F.col("nlabels") == 2).select(F.col("suffix").alias("_s2"))
    return (
        df.withColumn("_c3", F.when(n > 3, last(3)))
        .withColumn("_c2", F.when(n > 2, last(2)))
        .join(F.broadcast(p3), F.col("_c3") == F.col("_s3"), "left")
        .join(F.broadcast(p2), F.col("_c2") == F.col("_s2"), "left")
        .withColumn(
            out_col,
            F.when(F.col("_s3").isNotNull(), last(4))
            .when(F.col("_s2").isNotNull(), last(3))
            .when(n >= 2, last(2))
            .otherwise(F.col(host_col)),
        )
        .drop("_c3", "_c2", "_s3", "_s2")
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL, the dedup key crawl pipelines group on:

    1. drop the fragment (``#...``);
    2. strip tracking parameters (:data:`TRACKING_PARAM_PATTERN`),
       keeping every other query parameter in its original order;
    3. lower-case scheme and host, drop a ``www.`` prefix;
    4. drop the DEFAULT port only (``:80`` for http, ``:443`` for
       https — a non-default port is a different origin and survives);
    5. collapse trailing slashes on the path (``/a/`` == ``/a``) and a
       dangling ``?``.

    Pure built-in expressions; each regexp is RE2-compatible so the
    DuckDB oracle replays the identical chain (plans/ext.py additionally
    checks the planted CLOSED FORM, an independent derivation)."""
    u = _as_col(url)
    # 1. fragment
    u = F.regexp_replace(u, "#.*$", "")
    # 2. tracking params. Sentinel trick: with the fragment gone the query
    #    runs to the end, so appending one '&' makes EVERY param end in
    #    '&'; a single left-anchored pass then removes whole RUNS of
    #    consecutive tracking params ("([?&])(name=val&)+" -> "$1") without
    #    ever matching inside another param's name (?ref_fbclid=9&v=2 is
    #    untouched — the r13 unanchored pattern spliced it to ?ref_v=2).
    #    Dangling separators left behind ('?', the sentinel '&') are
    #    stripped right here so step 5's slash collapse sees clean ends.
    u = F.when(u.contains("?"), F.concat(u, F.lit("&"))).otherwise(u)
    u = F.regexp_replace(
        u, "([?&])(" + TRACKING_PARAM_PATTERN + "=[^&#]*&)+", "$1"
    )
    u = F.regexp_replace(u, "[?&]+$", "")
    # 3./4. scheme + host normalization, rebuilt around the rest
    scheme = url_scheme(u)
    hostport = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = F.when(
        (scheme == F.lit("http")) & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == F.lit("https")) & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # 5. trailing slashes (before a query or at the end) and dangling '?'
    rest = F.regexp_replace(rest, "/+\\?", "?")
    rest = F.regexp_replace(rest, "/+$", "")
    rest = F.regexp_replace(rest, "\\?$", "")
    return F.concat(scheme, F.lit("://"), host, rest)


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup: one row per canonical URL with the keeper
    (lowest id — the deterministic keep-first rule every dedup family
    here pins) and the duplicate count. One shuffle, on the canonical
    string itself — the same O(n) hash-partition shape as exact_dedup."""
    return (
        df.select(F.col(id_col), canonicalize_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def domain_mix(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Registrable-domain composition of the corpus: doc count and
    corpus share per domain — the domain-balance report a curation run
    checks before fixing source weights. Low-cardinality groupBy with
    map-side partials; the total folds in via a scalar broadcast."""
    domains = df.select(
        registrable_domain(url_host(url_col)).alias("domain")
    )
    counts = domains.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    total = domains.select(F.count(F.lit(1)).alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))  # bnlj-scalar: 1-row total
        .select(
            "domain",
            "n_docs",
            F.round(F.col("n_docs") / F.col("_total"), 6).alias("share"),
        )
    )


def blocklist_filter(df: DataFrame, blocked_domains,
                     url_col: str = "url") -> DataFrame:
    """Domain-blocklist filtering — the crawl-hygiene gate every corpus
    pass runs before content ever ships (spam/adult/malware domain
    lists): keep rows whose REGISTRABLE domain is not blocked, and
    report the decision so the drop is auditable. The blocklist is a
    small broadcast set at any corpus scale (even the full commercial
    lists are ~1M rows — megabytes); the corpus side is a broadcast
    left-join, no shuffle. Subdomains of a blocked domain are blocked
    with it (the match key IS the registrable domain)."""
    spark = df.sparkSession
    bl = F.broadcast(
        spark.createDataFrame([(d,) for d in sorted(set(blocked_domains))],
                              "domain string")
        .withColumn("_blocked", F.lit(1))
    )
    return (
        df.withColumn("domain", registrable_domain(url_host(url_col)))
        .join(bl, "domain", "left")
        .withColumn("kept", F.col("_blocked").isNull())
        .drop("_blocked")
    )


def url_decontaminate(corpus: DataFrame, benchmark: DataFrame,
                      url_col: str = "url",
                      id_col: str = "doc_id") -> DataFrame:
    """URL-level decontamination: flag corpus docs whose canonical URL
    appears in the benchmark/eval set. The benchmark side collapses to
    DISTINCT canonical URLs and broadcasts (an eval suite is tiny
    relative to the corpus), so the corpus needs no shuffle — the same
    broadcast-membership shape as dedup.decontaminate's shingle check."""
    bench = F.broadcast(
        benchmark.select(canonicalize_url(url_col).alias("canonical_url"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        corpus.select(F.col(id_col),
                      canonicalize_url(url_col).alias("canonical_url"))
        .join(bench, "canonical_url", "left")
        .select(
            id_col,
            "canonical_url",
            F.col("_hit").isNotNull().alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Synthetic URL column — deterministic, SQL-parity, planted collisions.
# ---------------------------------------------------------------------------

#: 8 hosts covering single-label domains, subdomains, and two-label
#: public suffixes, so registrable_domain exercises every branch.
SYNTH_HOSTS = (
    "news.example.com", "example.com", "blog.example.co.uk",
    "data.example.org", "cdn.sample.net", "sample.net",
    "docs.sample.co.uk", "wiki.testsite.io",
)

#: Registrable domain per SYNTH_HOSTS entry (closed form for the oracle).
SYNTH_DOMAINS = (
    "example.com", "example.com", "example.co.uk", "example.org",
    "sample.net", "sample.net", "sample.co.uk", "testsite.io",
)


def synthetic_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic ``url`` column derived from ``id_col``.

    Canonical identity is pinned by ``id % 40`` (host = ``id % 8``,
    path = ``id % 10``, kept query param v = ``id % 40``), while the RAW
    string varies within each canonical group by exactly the noise
    canonicalization must remove: scheme case (``id % 2``), a ``www.``
    prefix (``id % 5``), the scheme's default port (``id % 7``),
    tracking params before or after the kept one (``id % 3``), a
    fragment (``id % 4``), and a trailing slash (``id % 6``). 40 is
    coprime to 3 and 7, so every canonical group mixes variants —
    a group collapses only if the canonicalizer handles all of them."""
    i = F.col(id_col)
    hosts = F.array(*[F.lit(h) for h in SYNTH_HOSTS])
    scheme = F.when(i % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP"))
    www = F.when(i % 5 == 0, F.lit("www.")).otherwise(F.lit(""))
    host = F.element_at(hosts, (i % 8 + 1).cast("int"))
    port = F.when(
        i % 7 == 0,
        F.when(i % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")),
    ).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/"), (i % 10).cast("string"))
    trail = F.when(i % 6 == 0, F.lit("/")).otherwise(F.lit(""))
    pre = F.when(i % 3 == 0, F.lit("utm_campaign=launch&")).otherwise(F.lit(""))
    post = F.when(i % 3 == 1, F.lit("&utm_source=feed")).otherwise(F.lit(""))
    query = F.concat(F.lit("?"), pre, F.lit("v="), (i % 40).cast("string"), post)
    frag = F.when(i % 4 == 0, F.lit("#section-1")).otherwise(F.lit(""))
    return docs.withColumn(
        "url", F.concat(scheme, F.lit("://"), www, host, port, path, trail,
                        query, frag)
    )


def synthetic_canonical_url(id_col: Column | str) -> Column:
    """CLOSED-FORM canonical URL for :func:`synthetic_urls` — derived
    from the id arithmetic alone, never from the canonicalizer, so a
    test (or the DuckDB oracle) comparing canonicalize_url(synthetic)
    against this expression is an independent two-path check."""
    i = _as_col(id_col)
    hosts = F.array(*[F.lit(h) for h in SYNTH_HOSTS])
    scheme = F.when(i % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    return F.concat(
        scheme, F.lit("://"), F.element_at(hosts, (i % 8 + 1).cast("int")),
        F.lit("/articles/"), (i % 10).cast("string"),
        F.lit("?v="), (i % 40).cast("string"),
    )
