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


# --- X27/J6: ISO country dim (full 65-entry map; geocoding.service.js
# :126-144, restated) ------------------------------------------------------
ISO2_TO_ISO3 = {
    "US": "USA", "GB": "GBR", "CA": "CAN", "AU": "AUS", "DE": "DEU",
    "FR": "FRA", "IT": "ITA", "ES": "ESP", "NL": "NLD", "BE": "BEL",
    "CH": "CHE", "AT": "AUT", "SE": "SWE", "NO": "NOR", "DK": "DNK",
    "FI": "FIN", "PL": "POL", "CZ": "CZE", "IE": "IRL", "PT": "PRT",
    "GR": "GRC", "HU": "HUN", "RO": "ROU", "BG": "BGR", "HR": "HRV",
    "SI": "SVN", "SK": "SVK", "LT": "LTU", "LV": "LVA", "EE": "EST",
    "IS": "ISL", "LU": "LUX", "MT": "MLT", "CY": "CYP", "JP": "JPN",
    "CN": "CHN", "IN": "IND", "KR": "KOR", "SG": "SGP", "MY": "MYS",
    "TH": "THA", "ID": "IDN", "PH": "PHL", "VN": "VNM", "NZ": "NZL",
    "MX": "MEX", "BR": "BRA", "AR": "ARG", "CL": "CHL", "CO": "COL",
    "PE": "PER", "VE": "VEN", "ZA": "ZAF", "NG": "NGA", "EG": "EGY",
    "KE": "KEN", "SA": "SAU", "AE": "ARE", "IL": "ISR", "TR": "TUR",
    "RU": "RUS", "UA": "UKR", "BY": "BLR", "KZ": "KAZ", "UZ": "UZB",
}


def iso2_to_iso3(iso2: Column | str) -> Column:
    """J6: ISO2 → ISO3 via the literal dim map; unmapped codes pass
    through unchanged (``mapping[iso2] || iso2``,
    geocoding.service.js:145)."""
    up = F.upper(_c(iso2))
    m = F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in ISO2_TO_ISO3.items()))
    return F.coalesce(m[up], up)


# --- X27: country-name → ISO2 (address-normalizer.service.js:11-26,
# restated) ----------------------------------------------------------------
COUNTRY_NAME_TO_ISO2 = {
    "usa": "US", "united states": "US", "us": "US", "u.s.": "US",
    "u.s.a.": "US",
    "uk": "GB", "united kingdom": "GB", "great britain": "GB",
    "england": "GB",
    "australia": "AU", "aus": "AU",
    "canada": "CA", "can": "CA",
    "germany": "DE", "deutschland": "DE",
    "france": "FR",
    "spain": "ES", "españa": "ES",
    "italy": "IT", "italia": "IT",
    "netherlands": "NL", "holland": "NL",
    "switzerland": "CH", "schweiz": "CH",
    "india": "IN",
    "china": "CN",
    "japan": "JP",
    "singapore": "SG",
}


def normalize_country(country: Column | str) -> Column:
    """X27: 2-letter code passes through uppercased; known full names map
    to ISO2; anything else uppercases (normalizeCountry,
    address-normalizer.service.js:180-192)."""
    c = _c(country).cast("string")
    low = F.lower(F.trim(c))
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in COUNTRY_NAME_TO_ISO2.items()
        )
    )
    return F.when(low.rlike("^[a-z]{2}$"), F.upper(low)).otherwise(
        F.coalesce(m[low], F.upper(low))
    )


# --- J7: US state-name → abbreviation (address-normalizer.service.js
# :133-155, restated) ------------------------------------------------------
US_STATE_TO_ABBREV = {
    "ALABAMA": "AL", "ALASKA": "AK", "ARIZONA": "AZ", "ARKANSAS": "AR",
    "CALIFORNIA": "CA", "COLORADO": "CO", "CONNECTICUT": "CT",
    "DELAWARE": "DE", "FLORIDA": "FL", "GEORGIA": "GA", "HAWAII": "HI",
    "IDAHO": "ID", "ILLINOIS": "IL", "INDIANA": "IN", "IOWA": "IA",
    "KANSAS": "KS", "KENTUCKY": "KY", "LOUISIANA": "LA", "MAINE": "ME",
    "MARYLAND": "MD", "MASSACHUSETTS": "MA", "MICHIGAN": "MI",
    "MINNESOTA": "MN", "MISSISSIPPI": "MS", "MISSOURI": "MO",
    "MONTANA": "MT", "NEBRASKA": "NE", "NEVADA": "NV",
    "NEW HAMPSHIRE": "NH", "NEW JERSEY": "NJ", "NEW MEXICO": "NM",
    "NEW YORK": "NY", "NORTH CAROLINA": "NC", "NORTH DAKOTA": "ND",
    "OHIO": "OH", "OKLAHOMA": "OK", "OREGON": "OR", "PENNSYLVANIA": "PA",
    "RHODE ISLAND": "RI", "SOUTH CAROLINA": "SC", "SOUTH DAKOTA": "SD",
    "TENNESSEE": "TN", "TEXAS": "TX", "UTAH": "UT", "VERMONT": "VT",
    "VIRGINIA": "VA", "WASHINGTON": "WA", "WEST VIRGINIA": "WV",
    "WISCONSIN": "WI", "WYOMING": "WY",
}


def normalize_state(state: Column | str) -> Column:
    """J7: trim+uppercase, then the 50-state literal dim; unmapped values
    pass through uppercased (normalizeState)."""
    up = F.upper(F.trim(_c(state).cast("string")))
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in US_STATE_TO_ABBREV.items()
        )
    )
    return F.coalesce(m[up], up)


def normalize_postal(code: Column | str) -> Column:
    """X5 full battery (normalizePostalCode, address-normalizer.service.js
    :158-175): uppercase, strip spaces/hyphens; US 5 or 9 digits →
    ``#####`` / ``#####-####``; Canadian ``A1A1A1`` → ``A1A 1A1``; anything
    else passes through stripped."""
    d = F.regexp_replace(F.upper(_c(code).cast("string")), r"[\s-]", "")
    return (
        F.when(
            d.rlike(r"^\d{9}$"),
            F.format_string("%s-%s", F.substring(d, 1, 5), F.substring(d, 6, 4)),
        )
        .when(d.rlike(r"^\d{5}$"), d)
        .when(
            d.rlike(r"^[A-Z]\d[A-Z]\d[A-Z]\d$"),
            F.format_string("%s %s", F.substring(d, 1, 3), F.substring(d, 4, 3)),
        )
        .otherwise(d)
    )


def quality_color(score: Column | str) -> Column:
    """X25 hex colors (getQualityColor, data-quality.service.js:60-68):
    ≥90 green, ≥70 blue, ≥50 orange, else red — carried by the UI grid and
    the Excel report."""
    s = _c(score)
    return (
        F.when(s >= 90, F.lit("#10b981"))
        .when(s >= 70, F.lit("#3b82f6"))
        .when(s >= 50, F.lit("#f59e0b"))
        .otherwise(F.lit("#ef4444"))
    )


# --- X6: canonical street-address formatter (normalizeAddress,
# address-normalizer.service.js:107-125; abbrev map :29-46, restated) ------
STREET_ABBREV = {
    "street": "St", "st.": "St", "str": "St",
    "avenue": "Ave", "ave.": "Ave", "av": "Ave",
    "road": "Rd", "rd.": "Rd",
    "boulevard": "Blvd", "blvd.": "Blvd",
    "drive": "Dr", "dr.": "Dr",
    "lane": "Ln", "ln.": "Ln",
    "court": "Ct", "ct.": "Ct",
    "place": "Pl", "pl.": "Pl",
    "square": "Sq", "sq.": "Sq",
    "terrace": "Ter", "ter.": "Ter",
    "parkway": "Pkwy", "pkwy.": "Pkwy",
    "highway": "Hwy", "hwy.": "Hwy",
    "building": "Bldg", "bldg.": "Bldg",
    "suite": "Ste", "ste.": "Ste",
    "floor": "Fl", "fl.": "Fl", "flr": "Fl",
    "apartment": "Apt", "apt.": "Apt",
}


def normalize_address_canonical(address: Column | str) -> Column:
    """X6: trim + collapse whitespace, standardize street-type words to
    their abbreviations (case-insensitive, word-bounded), strip trailing
    ``[,;]``, tighten ``N - M`` ranges to ``N-M``.

    Deviation from the reference, documented: its ``new RegExp(`\\b${full}\\b`)``
    leaves the '.' in dotted keys ('st.', 'ave.', …) as a regex wildcard,
    which would also rewrite arbitrary words ('sta ' → 'St '); we escape
    the dot and match the literal token, which is the evident intent."""
    s = F.trim(_c(address).cast("string"))
    s = F.regexp_replace(s, r"\s+", " ")
    for full, abbr in STREET_ABBREV.items():
        pat = "(?i)\\b" + full.replace(".", "\\.") + "\\b"
        s = F.regexp_replace(s, pat, abbr)
    s = F.regexp_replace(s, r"[,;]+$", "")
    s = F.regexp_replace(s, r"(\d+)\s*-\s*(\d+)", r"$1-$2")
    return s


# --- tagged PIN/postal extraction (advanced-extractor.service.js:22-27,
# 393-406): every match per country pattern, tagged with its country, in
# the constructor's insertion order (india, us, uk, canada). -------------
PIN_PATTERNS = [
    ("india", r"\b\d{6}\b"),
    ("us", r"\b\d{5}(?:-\d{4})?\b"),
    ("uk", r"(?i)\b[A-Z]{1,2}\d{1,2}\s?\d[A-Z]{2}\b"),
    ("canada", r"(?i)\b[A-Z]\d[A-Z]\s?\d[A-Z]\d\b"),
]


def extract_pins(text: Column | str) -> Column:
    """extractPINs: array<struct<code,country>> of all matches, country
    batteries concatenated in insertion order."""
    t = _c(text)

    def tag(country: str):
        # single-arg lambda: a second (defaulted) parameter would make
        # PySpark bind it to the array index instead of the closure
        return lambda c: F.struct(c.alias("code"),
                                  F.lit(country).alias("country"))

    parts = [
        F.transform(F.regexp_extract_all(t, F.lit(pat), 0), tag(name))
        for name, pat in PIN_PATTERNS
    ]
    return F.concat(*parts)
