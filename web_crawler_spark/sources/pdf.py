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
from pyspark.sql import DataFrame
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
