"""X2/X3/X28/F10: contact-field extraction batteries (phones, emails,
hours, fax, websites, social, contact person).

Reference semantics (contact-extractor.service.js:20-231,
advanced-extractor.service.js:11-19,445-469, restated): regex batteries
over element text plus tel:/mailto:/href attribute harvesting; phones
gated to 7-15 digits; emails lowercased with asset-extension/example-
domain false positives dropped (F10); fax = "Fax:"-prefixed numbers with
≥7 digits; websites = non-social http origins; social = last-seen link
per network; person = "Contact/Manager/Director/Coordinator: First Last".

Spark restatement: every battery is a JVM-side ``regexp_extract_all``
column expression returning an ordered, de-duplicated array — no Python.
href-based harvesting takes a pre-extracted ``array<string>`` of hrefs
(the link parser already produces document-order hrefs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# contact-extractor.service.js:25-32 (Java-regex spellings of the same)
PHONE_PATTERNS = [
    r"(\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,4}",
    r"\b0{1,2}\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{3,4}[-.\s]?\d{3,4}\b",
]

EMAIL_PATTERN = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"

# X2 multi-country battery (advanced-extractor.service.js:14-19, restated
# in Java-regex spelling). Ordered dict: extraction unions the batteries in
# this order (india, us, uk, international) before the digit gate.
ADV_PHONE_PATTERNS = {
    "india": r"(?:\+91|0)?[\s-]?\d{5}[\s-]?\d{5}|\d{3}[\s-]\d{3}[\s-]\d{4}",
    "us": r"(?:\+1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    "uk": r"(?:\+44|0)\s?\d{4}\s?\d{6}|\+44\s?\d{3}\s?\d{3}\s?\d{4}",
    "international": r"\+?\d{1,4}[-.\s]?\(?\d{1,4}\)?[-.\s]?\d{1,4}[-.\s]?\d{1,9}",
}

# contact-extractor.service.js:97-112
HOURS_PATTERNS = [
    r"(?i)(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s-]+(to|through|thru|-)[\s]+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s:]+\d{1,2}:\d{2}\s*[AP]M[\s-]+\d{1,2}:\d{2}\s*[AP]M",
    r"(?i)(Mon|Tue|Wed|Thu|Fri|Sat|Sun)-+(Mon|Tue|Wed|Thu|Fri|Sat|Sun)\s+\d{1,2}[ap]m[-–]\d{1,2}[ap]m",
    r"(?i)\d{1,2}:\d{2}\s*[AP]M[\s-]+\d{1,2}:\d{2}\s*[AP]M",
    r"(?i)Open\s+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s-]+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)",
    r"(?i)Hours?[\s:]+\d{1,2}[ap]m[\s-]+\d{1,2}[ap]m",
]

FAX_PATTERN = r"(?i)(?:Fax|F)[\s:]+(\+?[\d\s\-().]+)"
PERSON_PATTERN = r"(?:Contact|Manager|Director|Coordinator)[\s:]+([A-Z][a-z]+\s+[A-Z][a-z]+)"

SOCIAL_HOSTS = {
    "facebook": ["facebook.com"],
    "twitter": ["twitter.com", "x.com"],
    "linkedin": ["linkedin.com"],
    "instagram": ["instagram.com"],
}
_SOCIAL_ALL = [h for hs in SOCIAL_HOSTS.values() for h in hs]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _digits(s: Column) -> Column:
    return F.length(F.regexp_replace(s, r"[^0-9]", ""))


def _matches(text: Column, pattern: str, group: int = 0) -> Column:
    return F.regexp_extract_all(text, F.lit(pattern), group)


def extract_phones(text: Column | str, tel_hrefs: Column | None = None) -> Column:
    """X2: battery union + trim + 7-15 digit gate + order-preserving dedup;
    tel: hrefs appended (contact-extractor.service.js:20-56)."""
    t = _c(text)
    all_matches = F.flatten(F.array(*[_matches(t, p) for p in PHONE_PATTERNS]))
    if tel_hrefs is not None:
        tels = F.transform(
            F.filter(tel_hrefs, lambda h: h.startswith("tel:")),
            lambda h: F.trim(F.regexp_replace(h, "^tel:", "")),
        )
        all_matches = F.concat(all_matches, tels)
    cleaned = F.transform(all_matches, lambda x: F.trim(x))
    gated = F.filter(cleaned, lambda p: _digits(p).between(7, 15))
    return F.array_distinct(gated)


def extract_emails(text: Column | str, mailto_hrefs: Column | None = None) -> Column:
    """X3 + F10: lowercase emails minus example.com/domain.com/.png/.jpg
    false positives; mailto: hrefs appended (query string stripped)."""
    t = _c(text)
    found = F.transform(_matches(t, EMAIL_PATTERN), F.lower)
    if mailto_hrefs is not None:
        mails = F.transform(
            F.filter(mailto_hrefs, lambda h: h.startswith("mailto:")),
            lambda h: F.lower(
                F.trim(F.split(F.regexp_replace(h, "^mailto:", ""), r"\?")[0])
            ),
        )
        found = F.concat(found, F.filter(mails, lambda m: m.contains("@")))
    ok = F.filter(
        found,
        lambda e: ~(
            e.contains("example.com")
            | e.contains("domain.com")
            | e.contains(".png")
            | e.contains(".jpg")
        ),
    )
    return F.array_distinct(ok)


def extract_hours(text: Column | str) -> Column:
    """X28 hours battery: 5 patterns, trimmed, de-duplicated."""
    t = _c(text)
    all_matches = F.flatten(F.array(*[_matches(t, p) for p in HOURS_PATTERNS]))
    return F.array_distinct(F.transform(all_matches, lambda x: F.trim(x)))


def extract_fax(text: Column | str) -> Column:
    """X28 fax: 'Fax:'-prefixed numbers, prefix stripped, ≥7 digits."""
    t = _c(text)
    nums = F.transform(_matches(t, FAX_PATTERN, 1), lambda x: F.trim(x))
    return F.filter(nums, lambda n: _digits(n) >= 7)


def extract_websites(hrefs: Column) -> Column:
    """X28 websites: http(s) hrefs minus social hosts, reduced to origins."""
    http = F.filter(
        hrefs,
        lambda h: h.rlike("^https?://")
        & ~F.array_contains(
            F.array(*[F.lit(s) for s in _SOCIAL_ALL]),
            F.regexp_replace(
                F.regexp_extract(h, "^https?://([^/?#]+)", 1), "^www\\.", ""
            ),
        ),
    )
    origins = F.transform(http, lambda h: F.regexp_extract(h, "^(https?://[^/?#]+)", 1))
    return F.array_distinct(F.filter(origins, lambda o: o != ""))


def extract_social(hrefs: Column) -> Column:
    """X28 social: struct of last-seen link per network (the reference's
    .each() overwrite keeps the final match)."""
    def _host_pred(hosts: list[str]):
        # closure (not a lambda default): a 2-arg lambda would make Spark
        # pass (element, index) and bind the index to `hosts`
        def pred(h: Column) -> Column:
            return F.array_contains(
                F.array(*[F.lit(s) for s in hosts]),
                F.regexp_replace(
                    F.regexp_extract(h, "^https?://([^/?#]+)", 1), "^www\\.", ""
                ),
            )

        return pred

    fields = []
    for net, hosts in SOCIAL_HOSTS.items():
        matching = F.filter(hrefs, _host_pred(hosts))
        # try_element_at: ANSI-safe null for hosts with no social links
        fields.append(F.try_element_at(matching, F.lit(-1)).alias(net))
    return F.struct(*fields)


def extract_contact_person(text: Column | str) -> Column:
    """X28 person: Title-Case names after Contact/Manager/Director/…"""
    return _matches(_c(text), PERSON_PATTERN, 1)


def normalize_phone_adv(phone: Column) -> Column:
    """X2 normalize (advanced-extractor.service.js:453-469): strip
    ``[-.\\s()]`` separators, drop a leading ``+``, and require ≥10
    remaining chars — result is ``+<digits>``, else NULL."""
    cleaned = F.regexp_replace(phone, r"[-.\s()]", "")
    cleaned = F.regexp_replace(cleaned, r"^\+", "")
    return F.when(F.length(cleaned) >= 10, F.concat(F.lit("+"), cleaned))


def extract_phones_adv(
    text: Column | str, countries: list[str] | None = None
) -> Column:
    """X2 multi-country battery (advanced-extractor.service.js:14-19):
    union the india/us/uk/international regexes in battery order, trim,
    normalize (≥10 digits → ``+<digits>``), order-preserving dedup."""
    t = _c(text)
    pats = [ADV_PHONE_PATTERNS[c] for c in (countries or ADV_PHONE_PATTERNS)]
    all_matches = F.flatten(F.array(*[_matches(t, p) for p in pats]))
    normalized = F.transform(all_matches, lambda x: normalize_phone_adv(F.trim(x)))
    return F.array_distinct(F.filter(normalized, lambda p: p.isNotNull()))
