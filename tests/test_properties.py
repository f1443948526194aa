"""Property-based parity: the JVM column kernels must agree with their
pure-Python twins (py_*) on adversarial inputs — the JS-vs-Java regex
parity risk called out in SURVEY.md §7.3. Hypothesis generates URL-shaped
strings; each example set runs through Spark in ONE batch."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from web_crawler_spark.functions import urls as U

_scheme = st.sampled_from(
    ["https://", "http://", "javascript:", "mailto:", "tel:", ""]
)
_host = st.sampled_from(
    ["example.com", "www.example.com", "sub.example.co.uk", "host007.example.com"]
)
_path = st.text(
    alphabet="abcdefghij/._-#?=&%0123456789",
    min_size=0, max_size=30,
)
_suffix = st.sampled_from(
    ["", ".png", ".html", ".pdf", "/login", "/blog/x", "#frag", "?q=1&b=2"]
)
url_strategy = st.builds(
    lambda s, h, p, x: f"{s}{h}/{p}{x}", _scheme, _host, _path, _suffix
)


@settings(max_examples=3, deadline=None)
@given(st.lists(url_strategy, min_size=50, max_size=120, unique=True))
def test_url_kernels_match_python_twins(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        U.canonicalize("url").alias("canon"),
        U.is_excluded("url").alias("excl"),
        U.bad_scheme("url").alias("bad"),
        U.priority_tier("url").alias("tier"),
    ).collect()
    for r in rows:
        u = r["url"]
        assert r["canon"] == U.py_canonicalize(u), u
        assert r["excl"] == U.py_is_excluded(u), u
        assert r["bad"] == U.py_bad_scheme(u), u
        assert r["tier"] == U.py_priority_tier(u), u


@settings(max_examples=3, deadline=None)
@given(st.lists(url_strategy, min_size=50, max_size=120, unique=True))
def test_doc_route_kernels_match_python_twins(spark, urls):
    # crawler.service.js:113-134 + professional-crawler.service.js:238-249
    extra = [
        "https://a.ex.com/files/r.pdf", "https://a.ex.com/dl.pdf?v=1",
        "https://a.ex.com/pdf/annual", "https://a.ex.com/doc_financials/q",
        "https://a.ex.com/n.docx", "https://a.ex.com/n.rtf",
        "https://a.ex.com", "https://a.ex.com/", "https://a.ex.com/?q=1",
        "https://a.ex.com#top", "https://a.ex.com/about",
    ]
    allu = list(dict.fromkeys(urls + extra))
    df = spark.createDataFrame([(u,) for u in allu], "url string")
    rows = df.select(
        "url",
        U.is_pdf_url("url").alias("pdf"),
        U.is_document_url("url").alias("doc"),
        U.is_homepage("url").alias("home"),
    ).collect()
    for r in rows:
        u = r["url"]
        assert r["pdf"] == U.py_is_pdf_url(u), u
        assert r["doc"] == U.py_is_document_url(u), u
        assert r["home"] == U.py_is_homepage(u), u
    by = {r["url"]: r for r in rows}
    assert by["https://a.ex.com/?q=1"]["home"]          # query stripped
    assert by["https://a.ex.com#top"]["home"]           # fragment stripped
    assert by["https://a.ex.com/doc_financials/q"]["pdf"]  # investor quirk
    assert not by["https://a.ex.com/about"]["pdf"]


def test_surt_key_examples(spark):
    from web_crawler_spark.functions.urls import surt_key

    cases = [
        ("https://www.Example.com/a/b?b=2&a=1", "com,example,www)/a/b?a=1&b=2"),
        ("https://sub.example.org/p#frag", "org,example,sub)/p"),
        ("https://example.com/", "com,example)/"),
        ("https://example.com/x?single=1#f", "com,example)/x?single=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["s"]
           for r in df.select("url", surt_key("url").alias("s")).collect()}
    for u, want in cases:
        assert got[u] == want


def test_surt_key_clusters_domains_and_folds_param_order(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.urls import surt_key

    df = spark.createDataFrame(
        [("https://a.example.com/1",), ("https://b.example.com/2",),
         ("https://example.net/3",),
         ("https://example.com/q?x=1&y=2",),
         ("https://example.com/q?y=2&x=1",)],
        "url string")
    keys = [r["s"] for r in
            df.select(surt_key("url").alias("s")).orderBy("s").collect()]
    # sorted SURT space puts all of example.com's hosts in one prefix run
    com = [k for k in keys if k.startswith("com,example")]
    assert com == keys[:len(com)]
    # parameter-order aliases collapse to one key
    assert keys.count("com,example)/q?x=1&y=2") == 2
