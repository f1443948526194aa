"""S7: PDF text source.

Reference semantics (pdf-extractor.service.js:9-38, restated): download a
PDF as bytes, parse to (text, pages), then run line/pattern extraction over
the text. The parse library (pdf-parse) is the reference's only PDF
dependency; everything after it is plain text processing.

Spark restatement: the PDF rides as a ``binary`` column; text extraction
is an Arrow-batched ``mapInPandas`` (bytes never hit the driver). This
container has no PDF library, so the decode step is gated:

- if ``pypdf`` is importable → real extraction;
- else, bytes in our deterministic MINIPDF container (a length-prefixed
  zlib text capsule used by the test fixtures) decode exactly;
- real PDF bytes without pypdf → decode_ok=False rows (not an exception:
  at 10^10 scale a poison row must never kill a stage).

The Spark-side plumbing — schema, batching, error envelope — is the real
production shape; only the codec is swapped.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"%MINIPDF1\x00"

try:  # pragma: no cover - not installed in this container
    import pypdf  # type: ignore

    HAVE_PYPDF = True
except ImportError:
    pypdf = None
    HAVE_PYPDF = False


def encode_minipdf(text: str, pages: int = 1) -> bytes:
    """Deterministic PDF-shaped test capsule: magic + page count + zlib text."""
    payload = zlib.compress(text.encode("utf-8"), 6)
    return MAGIC + struct.pack("<I", pages) + struct.pack("<I", len(payload)) + payload


def decode_minipdf(data: bytes) -> tuple[str, int]:
    if not data.startswith(MAGIC):
        raise ValueError("not a MINIPDF capsule")
    pages = struct.unpack("<I", data[10:14])[0]
    n = struct.unpack("<I", data[14:18])[0]
    return zlib.decompress(data[18 : 18 + n]).decode("utf-8"), pages


def _extract_one(data: bytes) -> tuple[str | None, int | None, bool]:
    if data is None:
        return None, None, False
    if data.startswith(MAGIC):
        text, pages = decode_minipdf(bytes(data))
        return text, pages, True
    if HAVE_PYPDF:  # pragma: no cover
        import io

        reader = pypdf.PdfReader(io.BytesIO(bytes(data)))
        return (
            "\n".join(p.extract_text() or "" for p in reader.pages),
            len(reader.pages),
            True,
        )
    return None, None, False


PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("sourceUrl", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("pages", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def extract_pdf_text(
    pdfs: DataFrame, bytes_col: str = "bytes", url_col: str = "sourceUrl"
) -> DataFrame:
    """binary column → (text, pages) rows; Arrow-batched, fault-tolerant."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                try:
                    text, pages, ok = _extract_one(row[bytes_col])
                except Exception:
                    text, pages, ok = None, None, False
                rows.append((row[url_col], text, pages, ok))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PDF_TEXT_SCHEMA.fields]
            )

    return pdfs.select(url_col, bytes_col).mapInPandas(gen, PDF_TEXT_SCHEMA)


# ---------------------------------------------------------------------------
# X36: the PDF location battery (pdf-extractor.service.js:43-298)
#
# Three strategies over the extracted text — structured keyword blocks
# (:68-101), four regex pattern sweeps with a context window (:106-170),
# and section-header scans in 3-line strides (:175-212) — closed by the
# first-wins normalized-address dedup (:284-298). Everything is per-row
# column algebra (higher-order functions over the line array / match
# array): extraction never shuffles, so the operator scales linearly
# with the document count. Regex semantics note: JS \s is Unicode-wide,
# Java's is ASCII; PDF text from the decode path is '\n'/' ' separated,
# where the two agree.
# ---------------------------------------------------------------------------

# :70-76 — keyword list for structured blocks ('bureau'/'adresse' appear
# twice in the reference; a duplicate literal changes nothing)
_PDF_KEYWORDS = [
    "office", "headquarters", "location", "address", "branch",
    "oficina", "sede", "dirección", "sucursal",
    "bureau", "adres", "vestiging", "kantoor",
    "büro", "adresse", "niederlassung", "siège",
]

# :217-227 hasAddressComponents — one alternation; 'st'/'dr' etc. carry
# no word boundaries in the reference, so e.g. any text containing "st"
# passes (bug-compatible)
_PDF_COMPONENTS_RE = (
    r"(?i)\d{1,5}\s+[a-z]"
    r"|\d{5}"
    r"|\d{4}\s*[a-z]{2}"
    r"|[a-z]{1,2}\d{1,2}[a-z]?\s*\d[a-z]{2}"
    r"|tel:?|phone:?|fax:?"
    r"|street|st|avenue|ave|road|rd|boulevard|blvd|drive|dr|lane|ln"
)

_PDF_US_PAT = r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),\s*([A-Z]{2})\s+(\d{5}(?:-\d{4})?)"
_PDF_UK_PAT = r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s*([A-Z]{1,2}\d{1,2}[A-Z]?\s*\d[A-Z]{2})"
_PDF_NL_PAT = r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s*(\d{4}\s*[A-Z]{2})"
_PDF_STREET_PAT = (
    r"(?i)\d+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,4}"
    r"(?:\s+(?:Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Drive|Dr|Lane|Ln|Way|Court|Ct))?"
)

# :177-184 — section header battery
_PDF_SECTION_RE = (
    r"(?i)our\s+offices?|our\s+locations?|branch\s+offices?"
    r"|contact\s+information|global\s+presence|office\s+locations?"
)

_PDF_CAND_TYPE = (
    "struct<strategy:string,locationName:string,locationAddress:string,"
    "city:string,state:string,postcode:string,countryIso3:string>"
)

def _null_s() -> Column:
    return F.lit(None).cast("string")


def _cand(strategy, name, addr, city=None, state=None, postcode=None, iso3=None):
    return F.struct(
        F.lit(strategy).alias("strategy"),
        name.alias("locationName"),
        addr.alias("locationAddress"),
        (city if city is not None else _null_s()).alias("city"),
        (state if state is not None else _null_s()).alias("state"),
        (postcode if postcode is not None else _null_s()).alias("postcode"),
        (iso3 if iso3 is not None else _null_s()).alias("countryIso3"),
    )


def _empty_cands() -> Column:
    return F.array().cast(f"array<{_PDF_CAND_TYPE}>")


def _int_seq(lo: Column, hi: Column, guard: Column) -> Column:
    """sequence(lo, hi) when guard, else [] — Spark's sequence counts DOWN
    for lo > hi, so the empty case must be explicit."""
    return F.when(guard, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )


def _pdf_lines(text: Column) -> Column:
    """:49 — split on newline, trim, drop empties."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda line: F.trim(line)),
        lambda line: F.length(line) > 0,
    )


def _structured_cands(lines: Column) -> Column:
    """:68-101 extractStructuredAddresses — for every keyword-bearing line
    with i < len-3, gate the 6-line block on hasAddressComponents and emit
    (name=lines[i], address=lines[i+1..i+4] joined ', ')."""
    n = F.size(lines)
    kws = F.array(*[F.lit(k) for k in _PDF_KEYWORDS])
    idxs = _int_seq(F.lit(0).cast("int"), (n - 4).cast("int"), n >= 4)

    def mk(i):
        line_l = F.lower(F.element_at(lines, i + 1))
        has_kw = F.exists(kws, lambda kw: F.contains(line_l, kw))
        block = F.concat_ws("\n", F.slice(lines, i + 1, 6))
        return F.when(
            has_kw & block.rlike(_PDF_COMPONENTS_RE),
            _cand(
                "pdf_struct",
                F.element_at(lines, i + 1),
                F.concat_ws(", ", F.slice(lines, i + 2, 4)),
            ),
        )

    return F.filter(F.transform(idxs, mk), lambda c: c.isNotNull())


def _matches_with_pos(text: Column, pattern: str) -> Column:
    """All non-overlapping matches of ``pattern`` with their 1-based start
    positions: fold over regexp_extract_all, locating each match string
    from a moving offset (the patterns carry no anchors/lookarounds, so
    the first literal occurrence at-or-after the previous match's end IS
    the match position — same advance rule as JS exec/g)."""
    ms = F.regexp_extract_all(text, F.lit(pattern), 0)
    acc0 = F.struct(
        F.lit(1).cast("int").alias("frm"),
        F.array().cast("array<struct<m:string,pos:int>>").alias("out"),
    )

    def step(acc, m):
        p = F.call_function("locate", m, text, acc["frm"]).cast("int")
        return F.struct(
            (p + F.length(m)).cast("int").alias("frm"),
            F.concat(
                acc["out"], F.array(F.struct(m.alias("m"), p.alias("pos")))
            ).alias("out"),
        )

    return F.aggregate(ms, acc0, step, lambda acc: acc["out"])


def _context(text: Column, pos: Column, half: int) -> Column:
    """:233-237 getAddressContext — ±half chars around the match start."""
    start0 = F.greatest(pos - 1 - half, F.lit(0))
    end0 = F.least(F.length(text), pos - 1 + half)
    return F.call_function("substring", text, start0 + 1, end0 - start0)


def _extract_location_name(ctx: Column) -> Column:
    """:242-256 extractLocationName — first trimmed context line with
    5 < len < 100, no zip/NL-postcode digits, and no comma; else the first
    non-empty line; else 'Location'."""
    clines = _pdf_lines(ctx)
    ok = F.filter(
        clines,
        lambda line: (F.length(line) > 5)
        & (F.length(line) < 100)
        & ~line.rlike(r"(?i)\d{5}|\d{4}\s*[a-z]{2}")
        & ~F.contains(line, F.lit(",")),
    )
    return F.coalesce(
        F.element_at(ok, 1), F.element_at(clines, 1), F.lit("Location")
    )


def _pattern_cands(text: Column) -> Column:
    """:106-170 extractAddressPatterns — US city/state/zip, UK postcode,
    NL postcode, then the generic street sweep (the only one gated on
    hasAddressComponents over its ±150 context)."""

    def sweep(pattern, half, mk, ngroups=0):
        wp = _matches_with_pos(text, pattern)
        groups = [
            F.regexp_extract_all(text, F.lit(pattern), g)
            for g in range(1, ngroups + 1)
        ]
        idxs = _int_seq(F.lit(1).cast("int"), F.size(wp).cast("int"), F.size(wp) > 0)

        def one(i):
            m = F.element_at(wp, i)["m"]
            ctx = _context(text, F.element_at(wp, i)["pos"], half)
            gs = [F.element_at(g, i) for g in groups]
            return mk(m, ctx, gs)

        return F.filter(F.transform(idxs, one), lambda c: c.isNotNull())

    us = sweep(
        _PDF_US_PAT, 100,
        lambda m, ctx, g: _cand(
            "pdf_us", _extract_location_name(ctx), m,
            city=g[0], state=g[1], postcode=g[2], iso3=F.lit("USA"),
        ),
        ngroups=3,
    )
    # the UK/NL rows drop their city group in the reference too (:131-138)
    uk = sweep(
        _PDF_UK_PAT, 100,
        lambda m, ctx, g: _cand(
            "pdf_uk", _extract_location_name(ctx), m,
            postcode=g[1], iso3=F.lit("GBR"),
        ),
        ngroups=2,
    )
    nl = sweep(
        _PDF_NL_PAT, 100,
        lambda m, ctx, g: _cand(
            "pdf_nl", _extract_location_name(ctx), m,
            postcode=g[1], iso3=F.lit("NLD"),
        ),
        ngroups=2,
    )
    street = sweep(
        _PDF_STREET_PAT, 150,
        lambda m, ctx, g: F.when(
            ctx.rlike(_PDF_COMPONENTS_RE),
            _cand(
                "pdf_street", _extract_location_name(ctx),
                F.call_function("substring", ctx, F.lit(1), F.lit(200)),
            ),
        ),
    )
    return F.concat(us, uk, nl, street)


def _section_cands(lines: Column) -> Column:
    """:175-212 extractLocationSections — after each header line, scan the
    next 20 lines in strides of 3: a 3-line window passing the component
    gate emits (name=window[0], address=window[1..2] joined ', ')."""
    n = F.size(lines)
    iidx = _int_seq(F.lit(0).cast("int"), (n - 1).cast("int"), n > 0)

    def outer(i):
        sec = F.slice(lines, i + 2, 20)
        m = F.size(sec)
        jidx = F.when(
            F.element_at(lines, i + 1).rlike(_PDF_SECTION_RE) & (m >= 3),
            F.transform(
                F.sequence(
                    F.lit(0).cast("int"), F.floor((m - 3) / 3).cast("int")
                ),
                lambda x: (x * 3).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))

        def inner(j):
            potential = F.concat_ws(", ", F.slice(sec, j + 1, 3))
            return F.when(
                potential.rlike(_PDF_COMPONENTS_RE),
                _cand(
                    "pdf_section",
                    F.element_at(sec, j + 1),
                    F.concat_ws(", ", F.slice(sec, j + 2, 2)),
                ),
            )

        return F.filter(F.transform(jidx, inner), lambda c: c.isNotNull())

    return F.flatten(F.transform(iidx, outer))


def _dedup_cands(cands: Column) -> Column:
    """:284-298 deduplicateLocations — first-wins on the lowercased,
    whitespace-stripped address; keys of length ≤ 5 are dropped outright
    (and never block a later candidate)."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("keys"),
        _empty_cands().alias("kept"),
    )

    def step(acc, c):
        key = F.lower(
            F.regexp_replace(F.coalesce(c["locationAddress"], F.lit("")), r"\s+", "")
        )
        take = (F.length(key) > 5) & ~F.array_contains(acc["keys"], key)
        return F.when(
            take,
            F.struct(
                F.concat(acc["keys"], F.array(key)).alias("keys"),
                F.concat(acc["kept"], F.array(c)).alias("kept"),
            ),
        ).otherwise(acc)

    return F.aggregate(cands, acc0, step, lambda acc: acc["kept"])


def extract_pdf_locations(
    texts: DataFrame, text_col: str = "text", url_col: str = "sourceUrl"
) -> DataFrame:
    """X36: (sourceUrl, text) → deduped location rows, one output row per
    surviving candidate in reference emission order (structured → US →
    UK → NL → street → sections; pdf-extractor.service.js:43-63 + :284).

    Tagged with the emitting ``strategy`` and the post-dedup ``ord`` for
    deterministic downstream ordering. Per-row HOF algebra — no shuffle,
    no Python in the plan."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = _pdf_lines(text)
    cands = F.concat(
        _structured_cands(lines), _pattern_cands(text), _section_cands(lines)
    )
    kept = _dedup_cands(cands)
    out = texts.select(
        F.col(url_col).alias("sourceUrl"), F.posexplode_outer(kept)
    )
    return out.select(
        "sourceUrl",
        F.col("pos").cast("int").alias("ord"),
        F.col("col.strategy").alias("strategy"),
        F.col("col.locationName").alias("locationName"),
        F.col("col.locationAddress").alias("locationAddress"),
        F.col("col.city").alias("city"),
        F.col("col.state").alias("state"),
        F.col("col.postcode").alias("postcode"),
        F.col("col.countryIso3").alias("countryIso3"),
        F.lit("pdf").alias("sourceType"),
    ).where(F.col("ord").isNotNull())
