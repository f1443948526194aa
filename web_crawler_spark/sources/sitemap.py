"""S5: sitemap seed-expansion.

Reference semantics (site-crawler.service.js:199-239, restated): probe the
three conventional sitemap paths per host, regex `<loc>(.*?)</loc>` over
the XML body, strip tags, drop excluded URLs, first working sitemap wins.

Spark restatement: the probe set is a literal cross (`explode(array(...))`)
— at 10^10-host scale this is a generated column, never a driver loop —
and the `<loc>` mining is JVM-side `regexp_extract_all` + `posexplode`
(document order preserved, no Python). Exclusion reuses the F1 kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.functions import urls as U

# site-crawler.service.js:202-206
SITEMAP_PATHS = ["/sitemap.xml", "/sitemap_index.xml", "/sitemap/sitemap.xml"]

LOC_RE = "<loc>(.*?)</loc>"


def sitemap_candidates(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """One probe URL per (host, conventional path): the fetch stage's input."""
    return hosts.select(
        "*",
        F.explode(F.array(*[F.lit(p) for p in SITEMAP_PATHS])).alias("sitemap_path"),
    ).withColumn(
        "sitemap_url",
        F.concat(F.lit("https://"), F.col(host_col), F.col("sitemap_path")),
    )


def extract_locs(
    sitemaps: DataFrame, xml_col: str = "xml", exclude: bool = True
) -> DataFrame:
    """Mine `<loc>` entries in document order; optionally apply the F1
    exclusion filter (shouldExcludeUrl, site-crawler.service.js:221)."""
    out = sitemaps.select(
        "*",
        F.posexplode_outer(
            F.expr(f"regexp_extract_all({xml_col}, '{LOC_RE}', 1)")
        ).alias("loc_idx", "loc_url"),
    ).filter(F.col("loc_url").isNotNull())
    if exclude:
        out = out.filter(~U.is_excluded("loc_url"))
    return out


def first_working_sitemap(
    sitemaps: DataFrame, host_col: str = "host", ok_col: str = "fetch_ok"
) -> DataFrame:
    """Keep each host's first (in SITEMAP_PATHS order) successful sitemap —
    the reference's `break` after the first 200 response (:227)."""
    pos = F.array_position(
        F.array(*[F.lit(p) for p in SITEMAP_PATHS]), F.col("sitemap_path")
    )
    # array_position is 0 for paths outside the conventional list (e.g.
    # harvested from robots.txt Sitemap: lines) — rank those LAST, then by
    # path for determinism, instead of letting 0 sort first
    order = F.when(pos == 0, F.lit(len(SITEMAP_PATHS) + 1)).otherwise(pos)
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(order.asc(), F.col("sitemap_path").asc())
    return (
        sitemaps.filter(F.col(ok_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def classify_sitemap(xml: "Column | str") -> "Column":
    """'index' (a <sitemapindex> of child sitemaps, sitemaps.org protocol)
    vs 'urlset' (a leaf page list).

    The reference treats every sitemap response as a leaf — its regex
    harvests <loc> entries without looking at the root element
    (site-crawler.service.js:199-239), so a real large site's
    /sitemap_index.xml would seed child-SITEMAP urls into the page
    frontier. At 10^10-URL scale index indirection is the norm (the
    protocol caps a urlset at 50k entries), so the engine distinguishes
    the two and routes accordingly."""
    c = F.col(xml) if isinstance(xml, str) else xml
    return (
        F.when(c.contains("<sitemapindex"), F.lit("index"))
        .otherwise(F.lit("urlset"))
    )


def split_locs(
    sitemaps: DataFrame, xml_col: str = "xml", exclude: bool = True
) -> DataFrame:
    """extract_locs + index routing: a loc mined from an index document is
    a CHILD SITEMAP (next fetch round's input), a loc from a urlset is a
    candidate page. Adds (doc_kind, loc_kind); the F1 exclusion filter
    applies only to page locs — child sitemap URLs are fetch targets, not
    crawl candidates, and excluding them would silently drop whole
    subtrees. Fixed-round expansion (fetch children → split_locs again)
    terminates because the protocol forbids index→index nesting beyond
    one level in practice; the caller owns the loop."""
    out = extract_locs(sitemaps, xml_col, exclude=False).withColumn(
        "doc_kind", classify_sitemap(xml_col)
    )
    out = out.withColumn(
        "loc_kind",
        F.when(F.col("doc_kind") == "index", F.lit("sitemap"))
        .otherwise(F.lit("page")),
    )
    if exclude:
        out = out.filter(
            (F.col("loc_kind") == "sitemap") | ~U.is_excluded("loc_url")
        )
    return out
