"""Record-enrichment kernels: quality scoring, classification, normalizers.

Spark-first restatements of the reference's enrichment services —
data-quality.service.js (X24-X26), location-extractor.service.js:491-503
(X11 activity classifier), crawler.service.js:491-506 (X12 height),
address-normalizer.service.js (X5-X7, X23, X27). Everything is a pure
column expression (when-chains, create_map literals, format_string) so it
compiles into whole-stage codegen; each has a verbatim SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from itertools import chain

# --- X24: quality score weights (data-quality.service.js:9-23, Σ=100) -----
QUALITY_WEIGHTS = {
    "locationName": 20,
    "locationAddress": 25,
    "latitude": 15,
    "longitude": 15,
    "countryIso3": 10,
    "postcode": 5,
    "state": 5,
    "streetOrCity": 5,
}

# --- X11: activity keywords → class (location-extractor.service.js:491-503)
ACTIVITY_RULES = [
    ("headquarters", "Headquarters"),
    ("hq", "Headquarters"),
    ("corporate", "Headquarters"),
    ("store", "Retail"),
    ("shop", "Retail"),
    ("retail", "Retail"),
    ("warehouse", "Warehouse"),
    ("distribution", "Warehouse"),
    ("factory", "Manufacturing"),
    ("plant", "Manufacturing"),
    ("manufacturing", "Manufacturing"),
    ("data center", "Data Center"),
    ("datacenter", "Data Center"),
    ("restaurant", "Restaurant"),
    ("cafe", "Restaurant"),
    ("branch", "Branch Office"),
]
DEFAULT_ACTIVITY = "Office"

# --- X12: activity → height meters (crawler.service.js:491-506) -----------
HEIGHT_BY_ACTIVITY = {
    "Headquarters": 50.0,
    "Retail": 8.0,
    "Warehouse": 12.0,
    "Manufacturing": 15.0,
    "Data Center": 10.0,
    "Restaurant": 6.0,
    "Branch Office": 20.0,
    "Office": 25.0,
}
DEFAULT_HEIGHT = 25.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _present(col: Column | str) -> Column:
    c = _c(col)
    return c.isNotNull() & (F.length(c.cast("string")) > 0)


def quality_score(colmap: dict[str, Column | str] | None = None) -> Column:
    """X24: weighted field-presence score, clamped to [0,100].

    colmap maps canonical field name → column; defaults to same-named
    columns. Geocode bonus / penalties from the reference are expressed by
    the caller (they depend on provenance columns).
    """
    colmap = colmap or {k: k for k in QUALITY_WEIGHTS}
    score = None
    for field, w in QUALITY_WEIGHTS.items():
        c = F.when(_present(colmap[field]), F.lit(w)).otherwise(F.lit(0))
        score = c if score is None else score + c
    return F.greatest(F.least(score, F.lit(100)), F.lit(0)).cast("int")


def quality_level(score: Column | str) -> Column:
    """X25: ≥90 Excellent, ≥70 Good, ≥50 Fair, else Poor."""
    s = _c(score)
    return (
        F.when(s >= 90, F.lit("Excellent"))
        .when(s >= 70, F.lit("Good"))
        .when(s >= 50, F.lit("Fair"))
        .otherwise(F.lit("Poor"))
    )


def missing_fields(colmap: dict[str, Column | str] | None = None) -> Column:
    """X26: array of absent required-field names, via higher-order filter."""
    colmap = colmap or {k: k for k in QUALITY_WEIGHTS}
    pairs = F.array(
        *[
            F.struct(F.lit(f).alias("f"), _present(colmap[f]).alias("p"))
            for f in QUALITY_WEIGHTS
        ]
    )
    return F.transform(F.filter(pairs, lambda x: ~x["p"]), lambda x: x["f"])


def classify_activity(text: Column | str) -> Column:
    """X11: first keyword hit wins, default 'Office'."""
    t = F.lower(_c(text))
    expr = None
    for kw, label in ACTIVITY_RULES:
        cond = t.contains(kw)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(DEFAULT_ACTIVITY))


def estimate_height(activity: Column | str) -> Column:
    """X12: activity → meters literal map, default 25."""
    m = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in HEIGHT_BY_ACTIVITY.items()))
    return F.coalesce(m[_c(activity)], F.lit(DEFAULT_HEIGHT))


def canonical_key(*cols: Column | str) -> Column:
    """X23: parts.join('|').lower().replace(/[^a-z0-9|]/g,'')
    (address-normalizer.service.js:235-257)."""
    joined = F.concat_ws("|", *[F.coalesce(_c(c).cast("string"), F.lit("")) for c in cols])
    return F.regexp_replace(F.lower(joined), r"[^a-z0-9|]", "")


def format_phone_us(digits: Column | str) -> Column:
    """X7: 10-digit → (###) ###-####; 11 with leading 1 → +1-###-###-####;
    else passthrough (address-normalizer.service.js:197-221)."""
    d = F.regexp_replace(_c(digits).cast("string"), r"[^0-9]", "")
    return (
        F.when(
            F.length(d) == 10,
            F.format_string(
                "(%s) %s-%s", F.substring(d, 1, 3), F.substring(d, 4, 3), F.substring(d, 7, 4)
            ),
        )
        .when(
            (F.length(d) == 11) & (F.substring(d, 1, 1) == "1"),
            F.format_string(
                "+1-%s-%s-%s", F.substring(d, 2, 3), F.substring(d, 5, 3), F.substring(d, 8, 4)
            ),
        )
        .otherwise(_c(digits).cast("string"))
    )


def format_postal_us(zipc: Column | str) -> Column:
    """X5: 9-digit ZIP → #####-#### (address-normalizer.service.js:158-167)."""
    d = F.regexp_replace(_c(zipc).cast("string"), r"[^0-9]", "")
    return F.when(
        F.length(d) == 9,
        F.format_string("%s-%s", F.substring(d, 1, 5), F.substring(d, 6, 4)),
    ).otherwise(_c(zipc).cast("string"))


# --- X27/J6: ISO country dim (subset; geocoding.service.js:126-144) --------
ISO2_TO_ISO3 = {
    "US": "USA", "GB": "GBR", "IN": "IND", "CA": "CAN", "AU": "AUS",
    "DE": "DEU", "FR": "FRA", "NL": "NLD", "JP": "JPN", "CN": "CHN",
    "BR": "BRA", "RU": "RUS", "ES": "ESP", "IT": "ITA", "MX": "MEX",
    "AR": "ARG", "DZ": "DZA", "CA2": "CAN",
}


def iso2_to_iso3(iso2: Column | str) -> Column:
    m = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in ISO2_TO_ISO3.items()))
    return m[F.upper(_c(iso2))]
