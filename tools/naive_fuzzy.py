"""Independent naive restatement of the reference greedy fuzzy dedup —
the SECOND implementation used to generate the `fuzzy_dedup_greedy` /
`records_pipeline_e2e` golden pins and to cross-check the production
kernel in pytest.

This is a from-scratch O(n^2) restatement of
enhanced-deduplication.service.js:7-42 (deduplicateWithFuzzy),
:44-98 (calculateSimilarity), :100-164 (mergeLocations),
:169-246 (normalizers + full-matrix Levenshtein + haversine). It shares
NO code with ``web_crawler_spark.operators.fuzzy`` — no fast paths, no
early exits, no pandas: full-matrix Levenshtein, full pair scan. If the
production kernel and this module ever disagree, one of them has a
semantics bug and the correctness gate / pytest will say so.

Deliberate convention shared with the production kernel (and the naive
pytest checker this module was factored out of): numeric 0 counts as
PRESENT (`v is not None and str(v) != ''`), where the JS reference's
truthiness test would treat 0 as absent. NaN counts as absent (NaN-safe
`v == v` check) since pandas surfaces missing floats as NaN.
"""

from __future__ import annotations

import math
import re

# Field lists restated from the reference (mergeLocations field arrays),
# NOT imported from operators/fuzzy.py.
NAIVE_SCALAR_FIELDS = [
    "locationName", "locationAddress", "latitude", "longitude",
    "countryIso3", "postcode", "state", "streetOrCity",
    "activityAtAsset", "footprint", "height", "usageShare",
]
NAIVE_ARRAY_FIELDS = ["phone", "email", "hours", "fax", "website"]


def naive_lev(a: str, b: str) -> int:
    """Full-matrix Levenshtein (enhanced-deduplication.service.js:190-218)."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (0 if a[i - 1] == b[j - 1] else 1),
            )
    return d[m][n]


def naive_str_sim(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 - naive_lev(a, b) / max(len(a), len(b))


def naive_norm_addr(s: str) -> str:
    s = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", s.lower()))
    s = re.sub(
        r"\b(street|st|avenue|ave|road|rd|boulevard|blvd|drive|dr|lane|ln)\b",
        "", s)
    return s.strip()


def naive_haversine(lat1, lon1, lat2, lon2) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(h))


def naive_has(r, k) -> bool:
    v = r.get(k)
    return v is not None and str(v) != "" and v == v  # NaN-safe


def naive_similarity(a: dict, b: dict) -> float:
    """calculateSimilarity: weighted address/coords/name/postcode score."""
    num = den = 0.0
    if naive_has(a, "locationAddress") and naive_has(b, "locationAddress"):
        num += 0.4 * naive_str_sim(
            naive_norm_addr(str(a["locationAddress"])),
            naive_norm_addr(str(b["locationAddress"])),
        )
        den += 0.4
    if all(naive_has(r, k) for r in (a, b) for k in ("latitude", "longitude")):
        km = naive_haversine(
            float(a["latitude"]), float(a["longitude"]),
            float(b["latitude"]), float(b["longitude"]),
        )
        num += 0.3 * (1.0 if km < 0.1 else max(0.0, 1 - km / 5))
        den += 0.3
    if naive_has(a, "locationName") and naive_has(b, "locationName"):
        num += 0.2 * naive_str_sim(
            str(a["locationName"]).lower(), str(b["locationName"]).lower()
        )
        den += 0.2
    if naive_has(a, "postcode") and naive_has(b, "postcode"):
        pa = re.sub(r"[^\w]", "", str(a["postcode"]).upper())
        pb = re.sub(r"[^\w]", "", str(b["postcode"]).upper())
        num += 0.1 * (1.0 if pa == pb else 0.0)
        den += 0.1
    return num / den if den else 0.0


def naive_greedy_clusters(rows: list[dict], threshold: float = 0.85) -> list[list[int]]:
    """Greedy first-unclaimed-base pass (the reference loop) — clusters as
    lists of row indices in feed order."""
    claimed = [False] * len(rows)
    clusters = []
    for i, base in enumerate(rows):
        if claimed[i]:
            continue
        claimed[i] = True
        members = [i]
        for j in range(i + 1, len(rows)):
            if not claimed[j] and naive_similarity(base, rows[j]) >= threshold:
                claimed[j] = True
                members.append(j)
        clusters.append(members)
    return clusters


def naive_merge_cluster(records: list[dict]) -> dict:
    """mergeLocations: longest-string-wins scalars (first wins ties — JS
    stable sort), ordered-set union arrays, ', '-joined sourceUrl set, max
    quality, mergedFrom = cluster size (1 for singletons, matching the
    engine's explicit tag where the JS leaves the field absent)."""
    if len(records) == 1:
        out = dict(records[0])
        out["mergedFrom"] = 1
        return out
    merged = dict(records[0])
    for field in NAIVE_SCALAR_FIELDS:
        vals = [r.get(field) for r in records if naive_has(r, field)]
        if vals:
            best = vals[0]
            for v in vals[1:]:
                if len(str(v)) > len(str(best)):
                    best = v
            merged[field] = best
    for field in NAIVE_ARRAY_FIELDS:
        seen: dict = {}
        for r in records:
            v = r.get(field)
            if isinstance(v, (list, tuple)):
                for x in v:
                    seen.setdefault(x, None)
            elif naive_has(r, field):
                seen.setdefault(v, None)
        if seen:
            merged[field] = list(seen)
    urls: dict = {}
    for r in records:
        if naive_has(r, "sourceUrl"):
            urls.setdefault(r["sourceUrl"], None)
    merged["sourceUrl"] = ", ".join(urls)
    scores = [r.get("qualityScore") for r in records if r.get("qualityScore") is not None]
    if scores:
        merged["qualityScore"] = max(scores)
    merged["mergedFrom"] = len(records)
    return merged


def _order_key(row: dict, order_cols: list[str]):
    # None sorts last within each key position (pandas na_position='last',
    # which is what the production kernel's sort_values does)
    return tuple(
        (1, "") if row.get(c) is None else (0, str(row.get(c)))
        for c in order_cols
    )


def naive_blocked_dedup(
    rows: list[dict],
    order_cols: list[str],
    threshold: float = 0.85,
    block_key: str = "seed_host",
) -> list[dict]:
    """The Spark operator's contract, restated: block on ``block_key``,
    feed each block in stable ``order_cols`` order, run the greedy pass,
    merge each cluster. Returns the merged rows (block iteration order is
    input order of first appearance; callers sort)."""
    blocks: dict = {}
    for r in rows:
        blocks.setdefault(r.get(block_key), []).append(r)
    out: list[dict] = []
    for key in blocks:
        brows = sorted(blocks[key], key=lambda r: _order_key(r, order_cols))
        for members in naive_greedy_clusters(brows, threshold):
            out.append(naive_merge_cluster([brows[k] for k in members]))
    return out
