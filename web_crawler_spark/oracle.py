"""Single-threaded reference-semantics crawl oracle.

Faithful Python restatement of the reference's site-wide BFS
(site-crawler.service.js:129-196 ``crawlEntireSite`` +
:10-79 ``discoverAllLinks``/``shouldExcludeUrl`` + :84-124
``prioritizeUrls``), run over the same SyntheticWeb the Spark engine
fetches from. Used by tests to assert the north_rule's bit-identity:
same visit ordering, same final URL-seen set.

Key reference semantics preserved exactly:
- FIFO queue of (url, depth); loop guard ``visited.size < maxPages``.
- Dedup at ENQUEUE time against visited ∪ allDiscoveredUrls
  (first-discoverer wins, site-crawler.service.js:163-168).
- Entries shifted with depth > maxDepth are skipped WITHOUT counting
  toward maxPages (:145-147).
- Per-page link pipeline: scheme filter → same-domain → canonicalize
  (origin+pathname) → exclusion patterns; per-page Set keeps first
  occurrence in document order (:14-40).
- robots check before visiting (crawler.service.js:289-293): blocked
  URLs are NOT fetched; the reference checks robots in crawlSingleUrl,
  not in discovery — we apply it at visit time, controlled by a flag.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from web_crawler_spark.functions.urls import (
    py_bad_scheme,
    py_canonicalize,
    py_is_excluded,
    py_priority_tier,
    py_same_domain,
)
from web_crawler_spark.synthetic.web import SyntheticWeb


@dataclass
class CrawlResult:
    visit_order: list[str] = field(default_factory=list)  # fetched, in order
    visit_depth: dict = field(default_factory=dict)
    discovered: list[str] = field(default_factory=list)  # enqueue order
    discovered_wave: dict = field(default_factory=dict)
    robots_blocked: list[str] = field(default_factory=list)
    prioritized: list[str] = field(default_factory=list)

    @property
    def seen_set(self) -> set:
        return set(self.discovered)


def discover_links_on_page(web: SyntheticWeb, h: int, p: int, base_host: str) -> list[str]:
    """discoverAllLinks semantics over the synthetic page (h,p)."""
    out: list[str] = []
    seen_local: set[str] = set()
    for href in web.raw_links(h, p):
        if py_bad_scheme(href):
            continue
        if not py_same_domain(href, base_host):
            continue
        clean = py_canonicalize(href)
        if not clean:
            continue
        if py_is_excluded(clean):
            continue
        if clean not in seen_local:
            seen_local.add(clean)
            out.append(clean)
    return out


def crawl_site(
    web: SyntheticWeb,
    seed_url: str,
    max_pages: int = 50,
    max_depth: int = 3,
    check_robots: bool = False,
    max_locations: int | None = None,
) -> CrawlResult:
    """Reference crawlEntireSite over one seed (one site).

    ``max_locations``: W5 early exit (professional-crawler.service.js:79-82)
    — the loop stops before popping the next URL once the cumulative
    extracted-location count reaches the cap; unpopped rows stay queued."""
    res = CrawlResult()
    base_host = seed_url.split("//", 1)[1].split("/", 1)[0]
    visited: set[str] = set()
    to_visit: list[tuple[str, int]] = [(seed_url, 0)]
    all_discovered: set[str] = {seed_url}
    res.discovered.append(seed_url)
    res.discovered_wave[seed_url] = 0

    locations_found = 0
    while to_visit and len(visited) < max_pages:
        if max_locations is not None and locations_found >= max_locations:
            break
        url, depth = to_visit.pop(0)
        if url in visited or depth > max_depth:
            continue
        visited.add(url)
        idx = web.page_index(url)
        if idx is None:
            continue  # 404: reference logs the error and moves on (:176-178)
        h, p = idx
        if check_robots and not web.robots_allows(h, url):
            res.robots_blocked.append(url)
            continue  # blocked page still counts as visited (it was shifted)
        res.visit_order.append(url)
        res.visit_depth[url] = depth
        locations_found += web.n_locations(h, p)
        for link in discover_links_on_page(web, h, p, base_host):
            if link not in visited and link not in all_discovered:
                all_discovered.add(link)
                res.discovered.append(link)
                res.discovered_wave[link] = depth + 1
                to_visit.append((link, depth + 1))

    # Phase 2: stable 3-tier bucket sort (:84-124, 180-182)
    buckets: dict[int, list[str]] = {1: [], 2: [], 3: []}
    for u in res.discovered:
        buckets[py_priority_tier(u)].append(u)
    res.prioritized = buckets[1] + buckets[2] + buckets[3]
    return res


def crawl_all(
    web: SyntheticWeb,
    max_pages: int = 50,
    max_depth: int = 3,
    check_robots: bool = False,
    max_locations: int | None = None,
) -> dict[str, CrawlResult]:
    """Sequential per-seed crawls — the reference loops over the seed list
    (crawler.service.js:55-133); each site crawl is independent."""
    return {
        seed: crawl_site(web, seed, max_pages, max_depth, check_robots,
                         max_locations)
        for seed in web.seed_urls()
    }
