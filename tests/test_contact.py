"""X2/X3/X28/F10 contact batteries: literal cases lifted from the
reference's semantics (contact-extractor.service.js:20-231)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions import contact as CT


@pytest.fixture(scope="module")
def row(spark):
    text = (
        "Call us at (212) 456-7890 or +31 20 123 4567. "
        "Tiny 123-456 number should drop. "
        "Email sales@acme.com or SUPPORT@ACME.COM; "
        "ignore noreply@example.com and icon@site.png. "
        "Hours: 9am - 5pm. Monday - Friday: 9:00 AM - 5:00 PM. "
        "Fax: +1 212 456 7000 Fax: 123 "
        "Contact: Jane Doe Manager: Bob Smith"
    )
    hrefs = [
        "tel:+1-800-555-0100",
        "mailto:info@acme.com?subject=hi",
        "https://www.facebook.com/acme",
        "https://twitter.com/acme",
        "https://x.com/acme2",
        "https://acme.com/about?x=1",
        "https://partner.example.org/page",
    ]
    df = spark.createDataFrame([(text, hrefs)], "text string, hrefs array<string>")
    out = df.select(
        CT.extract_phones("text", F.col("hrefs")).alias("phones"),
        CT.extract_emails("text", F.col("hrefs")).alias("emails"),
        CT.extract_hours("text").alias("hours"),
        CT.extract_fax("text").alias("fax"),
        CT.extract_websites(F.col("hrefs")).alias("websites"),
        CT.extract_social(F.col("hrefs")).alias("social"),
        CT.extract_contact_person("text").alias("people"),
    )
    return out.collect()[0]


def test_phones(row):
    assert "(212) 456-7890" in row["phones"]
    assert "+31 20 123 4567" in row["phones"]
    assert "+1-800-555-0100" in row["phones"]  # tel: href
    assert all(7 <= sum(c.isdigit() for c in p) <= 15 for p in row["phones"])
    assert "123-456" not in row["phones"]


def test_emails_and_false_positives(row):
    assert "sales@acme.com" in row["emails"]
    assert "support@acme.com" in row["emails"]  # lowercased
    assert "info@acme.com" in row["emails"]  # mailto minus ?subject
    assert not any("example.com" in e or ".png" in e for e in row["emails"])


def test_hours(row):
    assert any(h.startswith("Hours: 9am") for h in row["hours"])
    assert any("9:00 AM - 5:00 PM" in h for h in row["hours"])


def test_fax_digit_gate(row):
    assert any("212 456 7000" in f for f in row["fax"])
    assert not any(f.strip() == "123" for f in row["fax"])


def test_websites_exclude_social(row):
    assert "https://acme.com" in row["websites"]
    assert "https://partner.example.org" in row["websites"]
    assert not any("facebook" in w or "twitter" in w for w in row["websites"])


def test_social_last_wins(row):
    s = row["social"]
    assert s["facebook"] == "https://www.facebook.com/acme"
    assert s["twitter"] == "https://x.com/acme2"  # x.com counted, last wins
    assert s["linkedin"] is None


def test_contact_person(row):
    assert row["people"] == ["Jane Doe", "Bob Smith"]
