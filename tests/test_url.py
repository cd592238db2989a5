"""URL operators (ext/url.py, r13): canonicalization edge cases beyond
the planted synthetic structure, the dedup keep rule, domain extraction,
and the decontamination membership semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from skylogix_real_time_weather_data_pipeline_spark.ext.url import (
    canonicalize_url,
    domain_mix,
    registrable_domain,
    synthetic_canonical_url,
    synthetic_urls,
    url_decontaminate,
    url_dedup,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url("url")).collect()]


def test_canonicalize_edge_cases(spark):
    cases = {
        # scheme + host casing, www strip
        "HTTPS://WWW.Example.COM/A": "https://example.com/A",
        # default port strips only when it matches the scheme
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:80/a": "http://example.com/a",
        "http://example.com:443/a": "http://example.com:443/a",
        "https://example.com:8443/a": "https://example.com:8443/a",
        # tracking params: only utm_*/fbclid/gclid/msclkid go; order kept
        "https://e.com/p?utm_source=x&id=7&utm_medium=y&b=2":
            "https://e.com/p?id=7&b=2",
        "https://e.com/p?fbclid=abc": "https://e.com/p",
        "https://e.com/p?gclid=1&v=2": "https://e.com/p?v=2",
        # fragment gone, even with a query
        "https://e.com/p?v=1#frag": "https://e.com/p?v=1",
        "https://e.com/p#frag": "https://e.com/p",
        # trailing slashes collapse, before a query or at the end
        "https://e.com/a/b///": "https://e.com/a/b",
        "https://e.com/a/?v=1": "https://e.com/a?v=1",
        "https://e.com/": "https://e.com",
        # dangling '?' after a tracking-only query
        "https://e.com/a?utm_source=x": "https://e.com/a",
        # non-tracking params that merely START with a tracked name stay
        "https://e.com/a?utm_sourcefoo&v=1": "https://e.com/a?utm_sourcefoo&v=1",
        # r14 ADVICE regression: a param whose name merely ENDS in a
        # tracking token must survive intact (the r13 unanchored strip
        # spliced this to ?ref_v=2)
        "https://e.com/p?ref_fbclid=9&v=2": "https://e.com/p?ref_fbclid=9&v=2",
        "https://e.com/p?xgclid=1&v=2": "https://e.com/p?xgclid=1&v=2",
        # consecutive tracking params strip as a run, wherever they sit
        "https://e.com/p?utm_a=1&utm_b=2&v=3": "https://e.com/p?v=3",
        "https://e.com/p?v=1&utm_a=2&fbclid=3": "https://e.com/p?v=1",
        "https://e.com/p?utm_a=1&fbclid=2&gclid=3": "https://e.com/p",
        "https://e.com/p?a=1&utm_x=2&utm_y=3&b=4": "https://e.com/p?a=1&b=4",
        # a dangling '&' is separator noise, not content
        "https://e.com/p?v=1&": "https://e.com/p?v=1",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_registrable_domain_public_suffixes(spark):
    cases = {
        "news.example.com": "example.com",
        "example.com": "example.com",
        "a.b.deep.example.org": "example.org",
        "blog.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "x.y.sample.com.au": "sample.com.au",
        "wiki.testsite.io": "testsite.io",
        # r14 (r13 verdict #6): private-section hosting domains — the
        # 5-entry r13 sample grouped every *.github.io site as github.io
        "alice.github.io": "alice.github.io",
        "www2.alice.github.io": "alice.github.io",
        "myblog.blogspot.com": "myblog.blogspot.com",
        # 3-label suffixes keep FOUR labels
        "lincoln.k12.ma.us": "lincoln.k12.ma.us",
        "www9.lincoln.k12.ma.us": "lincoln.k12.ma.us",
        # single-label host: no registrable domain — grouped as itself
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = [r[0] for r in df.select(registrable_domain("host")).collect()]
    assert got == list(cases.values())


def test_registrable_domain_psl_join_matches_expression(spark):
    """The broadcast-join PSL path (registrable_domain_psl over
    default_psl_frame — the production full-list swap) must agree with
    the embedded-set expression on every branch: plain 2-label fallback,
    2-label and 3-label suffixes, exact-suffix hosts, single-label."""
    from skylogix_real_time_weather_data_pipeline_spark.ext.url import (
        default_psl_frame,
        registrable_domain_psl,
    )

    hosts = [
        "news.example.com", "example.com", "a.b.deep.example.org",
        "blog.example.co.uk", "example.co.uk", "x.y.sample.com.au",
        "alice.github.io", "github.io", "myblog.blogspot.com",
        "lincoln.k12.ma.us", "www9.lincoln.k12.ma.us", "k12.ma.us",
        "localhost", "sub.host.co.kr", "data.example.org",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    expr = {r["host"]: r["d"] for r in
            df.select("host", registrable_domain("host").alias("d")).collect()}
    joined = {r["host"]: r["domain"] for r in
              registrable_domain_psl(df, default_psl_frame(spark)).collect()}
    assert expr == joined
    # corpus side must not shuffle: both PSL joins broadcast
    plan = registrable_domain_psl(
        df, default_psl_frame(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_url_dedup_mega_duplicate_skew(spark):
    """r14 (r13 verdict #6): the docstring claims url_dedup has 'no skew
    beyond genuine mega-duplicates' — prove it with one canonical URL
    planted at 10% of a 2M-row corpus. The groupBy aggregate's MAP-SIDE
    partial aggregation is the skew answer: every task emits at most one
    row per key before the shuffle, so the hot key crosses the wire as
    n_partitions rows, not 200k. Pins the partial_min/partial_count pair
    in the plan and the exact (keep_id, n_copies) answer."""
    import pyspark.sql.functions as F

    n = 2_000_000
    # ids ending in 0 all collapse to ONE canonical URL (10% of rows);
    # the rest spread over mod-1000 canonical groups
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.lit("https://hot.example.com/dup?v=1"),
        ).otherwise(
            F.concat(F.lit("https://cold.example.com/p?v="),
                     (F.col("id") % 1000).cast("string"))
        ).alias("url"),
    )
    dd = url_dedup(docs)
    plan = dd._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan and "partial_count" in plan, (
        "map-side combine missing: the hot key would cross the shuffle "
        "at full row count")
    rows = {r["canonical_url"]: (r["keep_id"], r["n_copies"])
            for r in dd.collect()}
    assert rows["https://hot.example.com/dup?v=1"] == (0, n // 10)
    # cold groups exist only for v % 10 != 0 (v % 10 == 0 ids are all
    # divisible by 10 and went hot): 900 cold + 1 hot
    assert len(rows) == 901
    # cold group v=1: ids with id%1000==1, none divisible by 10 collide
    assert rows["https://cold.example.com/p?v=1"] == (1, n // 1000)


def test_url_host_strips_www_and_any_port(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Example.COM:8080/a?b#c",), ("http://sub.e.org/x",)],
        "url string")
    assert [r[0] for r in df.select(url_host("url")).collect()] == [
        "example.com", "sub.e.org"]


def test_synthetic_urls_planted_structure(spark):
    """The two-path check the oracle also performs: canonicalize(raw)
    == the closed-form canonical for every id, groups collapse mod 40,
    and every canonical group saw >= 2 distinct raw strings (so the
    canonicalizer, not raw equality, did the collapsing)."""
    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    d = synthetic_urls(docs)
    two_path = d.select(
        (canonicalize_url("url") ==
         synthetic_canonical_url("doc_id")).alias("ok"))
    assert two_path.filter(~F.col("ok")).count() == 0

    dd = url_dedup(d)
    assert dd.count() == 40
    rows = {r["canonical_url"]: (r["keep_id"], r["n_copies"])
            for r in dd.collect()}
    for cu, (keep, n) in rows.items():
        assert n == 10          # 400 ids / 40 residue classes
        assert keep < 40        # keep-lowest-id: the class representative
    assert sorted(k for k, _ in rows.values()) == list(range(40))

    # raw variety inside each canonical group
    variety = (
        d.select(canonicalize_url("url").alias("cu"), "url")
        .groupBy("cu").agg(F.countDistinct("url").alias("nd"))
        .filter(F.col("nd") < 2)
    )
    assert variety.count() == 0


def test_url_decontaminate_membership(spark):
    d = synthetic_urls(spark.range(0, 200).withColumnRenamed("id", "doc_id"))
    benchmark = d.filter(F.col("doc_id") % 23 == 0)
    corpus = d.filter(F.col("doc_id") % 23 != 0)
    got = {r["doc_id"]: r["contaminated"]
           for r in url_decontaminate(corpus, benchmark).collect()}
    bench_classes = {i % 40 for i in range(0, 200, 23)}
    want = {i: (i % 40) in bench_classes
            for i in range(200) if i % 23 != 0}
    assert got == want


def test_domain_mix_shares_sum_to_one(spark):
    d = synthetic_urls(spark.range(0, 400).withColumnRenamed("id", "doc_id"))
    mix = domain_mix(d).collect()
    assert sum(r["n_docs"] for r in mix) == 400
    assert abs(sum(r["share"] for r in mix) - 1.0) < 1e-9
    by_dom = {r["domain"]: r["n_docs"] for r in mix}
    # hosts 0,1 -> example.com; 4,5 -> sample.net (100 docs each)
    assert by_dom["example.com"] == 100
    assert by_dom["sample.net"] == 100
    assert by_dom["example.co.uk"] == 50


def test_blocklist_filter_blocks_subdomains(spark):
    from skylogix_real_time_weather_data_pipeline_spark.ext.url import (
        blocklist_filter,
    )

    df = spark.createDataFrame(
        [(1, "https://blog.example.co.uk/a"),   # subdomain of blocked
         (2, "https://example.co.uk/b"),        # blocked exactly
         (3, "https://example.com/c"),          # kept
         (4, "HTTP://WWW.TESTSITE.IO:80/d")],   # blocked through www/case/port
        "doc_id long, url string")
    got = {r["doc_id"]: (r["domain"], r["kept"])
           for r in blocklist_filter(
               df, ["example.co.uk", "testsite.io"]).collect()}
    assert got == {
        1: ("example.co.uk", False),
        2: ("example.co.uk", False),
        3: ("example.com", True),
        4: ("testsite.io", False),
    }
