"""Deterministic synthetic web: host graph, HTML pages, robots, images.

Stands in for the network (reference S1-S3 fetch operators,
crawler.service.js:296-302, playwright-renderer.service.js:45-173). Every
byte is a pure function of (seed, host index, page index) via md5-based
hash64 — no wall clock, no RNG state, so the Spark fetch UDF and the
single-threaded Python oracle produce identical pages, and reruns are
bit-identical (north_rule determinism contract).

The generated pages embed the extractor fixtures of FIXTURES.md §F4:
JSON-LD blocks, microdata, plain-text addresses, map iframes with @lat,lon,
inline window.offices JSON, sequential h3 country/city headers ("Nutanix
pattern"), contact lines, and <img> tags with captions (the image+caption
graft payload).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from web_crawler_spark.hashing import hash64

# path segments: mix of high/medium/low-priority and excluded ones so the
# URL filters and the priority tiers all get exercised
_PATH_POOL = [
    "contact", "locations", "office/north", "store/12", "branch/east",
    "find-us", "where-we-are", "address-book", "about/us",
    "about", "company", "corporate", "headquarters", "facility/a", "sitemap",
    "team", "history", "values", "press", "investors", "faq", "help",
    "services", "solutions", "partners", "events", "gallery", "media",
    # excluded by pattern (site-crawler.service.js:63-74)
    "login", "blog/post-1", "news/today", "product/x", "careers/job/1",
    "privacy", "terms", "search", "cart", "admin",
    # excluded by extension
    "logo.png", "styles.css", "data.json", "doc.pdf",
]

_COUNTRIES = ["USA", "GBR", "IND", "NLD", "DEU", "CAN", "AUS", "FRA"]
_CITIES = ["Springfield", "Riverton", "Lakewood", "Fairview", "Georgetown",
           "Ashland", "Dover", "Milton"]
_STREETS = ["Main Street", "Oak Avenue", "Park Road", "Elm Boulevard",
            "Cedar Lane", "High Street", "Station Road", "Market Square"]
_ACTIVITIES = ["Headquarters", "Retail", "Warehouse", "Manufacturing",
               "Data Center", "Restaurant", "Branch Office", "Office"]


@dataclass(frozen=True)
class SyntheticWeb:
    """A reproducible fake internet of ``n_hosts`` sites."""

    n_hosts: int = 10
    pages_per_host: int = 100
    seed: int = 42
    # one designated hot host gets ``hot_factor`` x the pages (skew fixture)
    hot_host: int = 0
    hot_factor: int = 1
    link_min: int = 10
    link_max: int = 30
    _npages: dict = field(default_factory=dict, compare=False)

    # ------------------------------------------------------------- graph --
    def host(self, h: int) -> str:
        return f"host{h:03d}.example.com"

    def n_pages(self, h: int) -> int:
        return self.pages_per_host * (self.hot_factor if h == self.hot_host else 1)

    def path(self, h: int, p: int) -> str:
        if p == 0:
            return "/"
        seg = _PATH_POOL[hash64(self.seed, "path", h, p) % len(_PATH_POOL)]
        return f"/{seg}/p{p}" if "." not in seg else f"/{seg}"

    def url(self, h: int, p: int) -> str:
        return f"https://{self.host(h)}{self.path(h, p)}"

    def seed_urls(self) -> list[str]:
        return [self.url(h, 0) for h in range(self.n_hosts)]

    def page_index(self, url: str) -> tuple[int, int] | None:
        """Reverse-map a canonical URL to (host, page). None if 404."""
        if not url.startswith("https://host"):
            return None
        try:
            hostpart = url.split("//", 1)[1].split("/", 1)[0]
            h = int(hostpart[4:7])
        except (ValueError, IndexError):
            return None
        if not 0 <= h < self.n_hosts:
            return None
        for p in self._page_candidates(h, url):
            if self.url(h, p) == url:
                return (h, p)
        return None

    def _page_candidates(self, h: int, url: str):
        # p is embedded as the trailing '/p{n}' for non-root non-asset paths
        if url.endswith(self.host(h) + "/"):
            yield 0
            return
        tail = url.rsplit("/p", 1)
        if len(tail) == 2 and tail[1].isdigit():
            yield int(tail[1])
        # asset-style paths (no /p{n}): scan is bounded by the path pool —
        # these are excluded URLs anyway; never fetched
        for p in range(min(self.n_pages(h), 0)):  # pragma: no cover
            yield p

    # ------------------------------------------------------------- links --
    def raw_links(self, h: int, p: int) -> list[str]:
        """The hrefs on page (h,p), in document order — pre-filter.

        Includes decorations that the crawl filters must strip/reject:
        query strings + fragments (canonicalization F3), off-domain links
        (F2), javascript:/mailto:/tel: (F4).
        """
        url = self.url(h, p)
        n = self.link_min + hash64(self.seed, "nl", url) % (
            self.link_max - self.link_min + 1
        )
        out: list[str] = []
        npages = self.n_pages(h)
        for j in range(n):
            r = hash64(self.seed, "lk", url, j)
            kind = r % 20
            target = self.url(h, r % npages)
            if kind == 0:
                out.append("javascript:void(0)")
            elif kind == 1:
                out.append(f"mailto:info@{self.host(h)}")
            elif kind == 2:
                # off-domain
                out.append(self.url((h + 1 + r % 7) % max(self.n_hosts, 1), 1))
            elif kind in (3, 4):
                out.append(f"{target}?utm_source=x&ref={j}")
            elif kind == 5:
                out.append(f"{target}#section{j}")
            else:
                out.append(target)
        return out

    # -------------------------------------------------------------- body --
    def n_locations(self, h: int, p: int) -> int:
        """Golden expected record count for page (h,p)."""
        url = self.url(h, p)
        tier = hash64(self.seed, "nlocs", url) % 10
        return 0 if tier < 3 else (tier - 2) % 6

    def location(self, h: int, p: int, k: int) -> dict:
        """k-th planted location record on page (h,p)."""
        url = self.url(h, p)
        r = lambda salt: hash64(self.seed, salt, url, k)  # noqa: E731
        city = _CITIES[r("ci") % len(_CITIES)]
        street_no = 1 + r("no") % 999
        street = _STREETS[r("st") % len(_STREETS)]
        country = _COUNTRIES[r("co") % len(_COUNTRIES)]
        postcode = f"{10000 + r('pc') % 89999}"
        lat = round((r("la") % 120_000_000) / 1_000_000 - 60.0, 6)
        lon = round((r("lo") % 360_000_000) / 1_000_000 - 180.0, 6)
        name = f"{city} {_ACTIVITIES[r('ac') % len(_ACTIVITIES)]}"
        return {
            "name": name,
            "street": f"{street_no} {street}",
            "city": city,
            "postcode": postcode,
            "country": country,
            "lat": lat,
            "lon": lon,
            "phone": f"+1 {200 + r('ph') % 799}-{100 + r('p2') % 899}-{1000 + r('p3') % 8999}",
            "email": f"office{k}@{self.host(h)}",
            "activity": _ACTIVITIES[r("ac") % len(_ACTIVITIES)],
            "image_id": f"img_{hash64(self.seed, 'img', url, k) % 10**12:012d}",
        }

    def strategy(self, h: int, p: int) -> str:
        """Which extractor fixture this page embeds (FIXTURES.md F4)."""
        choices = ["jsonld", "microdata", "text", "map", "script", "h3", "spa"]
        return choices[hash64(self.seed, "strat", self.url(h, p)) % len(choices)]

    def body(self, h: int, p: int) -> str:
        url = self.url(h, p)
        strat = self.strategy(h, p)
        locs = [self.location(h, p, k) for k in range(self.n_locations(h, p))]
        parts = [f"<html><head><title>Page {p} of {self.host(h)}</title></head><body>"]
        parts.append(f"<h1>Welcome to {self.host(h)}</h1>")
        for href in self.raw_links(h, p):
            parts.append(f'<a href="{href}">link</a>')
        if strat == "jsonld" and locs:
            import json as _json
            graph = [
                {
                    "@type": "LocalBusiness",
                    "name": L["name"],
                    "address": {
                        "@type": "PostalAddress",
                        "streetAddress": L["street"],
                        "addressLocality": L["city"],
                        "postalCode": L["postcode"],
                        "addressCountry": L["country"],
                    },
                    "geo": {"latitude": L["lat"], "longitude": L["lon"]},
                    "telephone": L["phone"],
                }
                for L in locs
            ]
            parts.append(
                '<script type="application/ld+json">'
                + _json.dumps({"@context": "https://schema.org", "@graph": graph})
                + "</script>"
            )
        elif strat == "microdata" and locs:
            for L in locs:
                parts.append(
                    '<div itemscope itemtype="https://schema.org/LocalBusiness">'
                    f'<span itemprop="name">{L["name"]}</span>'
                    f'<span itemprop="streetAddress">{L["street"]}</span>'
                    f'<span itemprop="addressLocality">{L["city"]}</span>'
                    f'<span itemprop="postalCode">{L["postcode"]}</span>'
                    "</div>"
                )
        elif strat == "text" and locs:
            for L in locs:
                parts.append(
                    f"<p>{L['name']}: {L['street']}, {L['city']}, "
                    f"{L['postcode']} {L['country']}. Call {L['phone']} "
                    f"or email {L['email']}</p>"
                )
        elif strat == "map" and locs:
            for L in locs:
                parts.append(
                    f'<iframe src="https://maps.example.com/@{L["lat"]},{L["lon"]},15z"></iframe>'
                    f'<div data-lat="{L["lat"]}" data-lon="{L["lon"]}">{L["name"]}</div>'
                )
        elif strat == "script" and locs:
            import json as _json
            blob = [
                {"name": L["name"], "address": f"{L['street']}, {L['city']}",
                 "lat": L["lat"], "lng": L["lon"]}
                for L in locs
            ]
            parts.append(f"<script>window.offices = {_json.dumps(blob)};</script>")
        elif strat == "h3" and locs:
            for L in locs:
                parts.append(f"<h3>{L['country']}</h3>")
                parts.append(f"<h3>{L['city']}</h3>")
                parts.append(f"<p>{L['street']}, {L['postcode']}</p>")
        elif strat == "spa":
            parts.append('<div id="root"></div>')  # needs-JS marker (X21)
        for L in locs:
            parts.append(
                f'<img src="/images/{L["image_id"]}.png" '
                f'alt="{L["name"]} — {L["city"]}, {L["country"]}">'
            )
        parts.append("</body></html>")
        return "\n".join(parts)

    def xhr_json(self, h: int, p: int) -> str | None:
        """XHR sidecar for SPA pages (playwright-renderer S3 analogue)."""
        if self.strategy(h, p) != "spa":
            return None
        import json as _json
        locs = [self.location(h, p, k) for k in range(self.n_locations(h, p))]
        return _json.dumps(
            {"locations": [
                {"name": L["name"], "address": f"{L['street']}, {L['city']}",
                 "latitude": L["lat"], "longitude": L["lon"]}
                for L in locs
            ]}
        )

    # ------------------------------------------------------------ robots --
    def robots(self, h: int) -> dict:
        """Per-host robots fixture (robots.service.js semantics).

        10%% of hosts fail the robots fetch -> permissive (robots.service.js:44-53).
        """
        host = self.host(h)
        fetch_ok = hash64(self.seed, "rb", host) % 10 != 0
        disallow = []
        if fetch_ok and hash64(self.seed, "rbd", host) % 5 == 0:
            # NOTE: pool must NOT overlap EXCLUDE_PATTERNS, or the URL filter
            # eats the rows before the robots gate ever sees them
            pool = ["/team", "/about", "/services", "/gallery"]
            disallow = [pool[hash64(self.seed, "rbp", host) % len(pool)]]
        delay = [0.0, 0.3, 1.0, 2.0][hash64(self.seed, "rbc", host) % 4]
        return {
            "host": host,
            "fetch_ok": fetch_ok,
            "disallow_prefixes": disallow,
            "crawl_delay_s": delay,
            "sitemaps": [],
        }

    def robots_allows(self, h: int, url: str) -> bool:
        rb = self.robots(h)
        if not rb["fetch_ok"]:
            return True  # permissive on failure (robots.service.js:49-53)
        path = "/" + url.split("//", 1)[1].split("/", 1)[1] if "/" in url.split("//", 1)[1] else "/"
        return not any(path.startswith(px) for px in rb["disallow_prefixes"])
