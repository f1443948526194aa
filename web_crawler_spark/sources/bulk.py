"""S8/S9/S10: bulk CSV source, CSV export sink, Excel report sink.

Reference semantics (restated):
- S8 parseCsv (bulk-processor.service.js:100-122): per row, company =
  first present of [Company Name, company, name] else 'Unknown'; url =
  first present of [URL, url, Website, website]; rows without a url are
  dropped; url is trimmed.
- S9 CSV export (CustomDataGrid.jsx:168-190): visible columns only, in
  grid order, every value double-quote-escaped.
- S10 Excel report (bulk-processor.service.js:127-240): two sheets
  (Summary per company, All Locations), quality color-coding.

Spark restatement: S8 is `spark.read.csv(header=True)` + a coalesce over
whichever synonym columns the file actually has (schema-level, not
per-row). S9 is the DataFrameWriter with quoteAll. S10 is a driver-side
sink over `toPandas()` — gated on openpyxl, which this container lacks;
the workbook *structure* (sheet names, column layout, summary rows) is
computed Spark-side and returned so tests cover everything but the final
binary write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPANY_SYNONYMS = ["Company Name", "company", "name"]
URL_SYNONYMS = ["URL", "url", "Website", "website"]

try:  # pragma: no cover - not installed in this container
    import openpyxl  # type: ignore

    HAVE_OPENPYXL = True
except ImportError:
    openpyxl = None
    HAVE_OPENPYXL = False


def coalesce_synonyms(df: DataFrame) -> DataFrame:
    """The header-synonym projection: whatever synonym columns exist in
    this file's header are coalesced in the reference's priority order."""
    have_c = [c for c in COMPANY_SYNONYMS if c in df.columns]
    have_u = [c for c in URL_SYNONYMS if c in df.columns]
    company = (
        F.coalesce(*[F.col(f"`{c}`") for c in have_c], F.lit("Unknown"))
        if have_c
        else F.lit("Unknown")
    )
    if not have_u:
        raise ValueError(f"no URL column among {URL_SYNONYMS} in {df.columns}")
    url = F.coalesce(*[F.col(f"`{c}`") for c in have_u])
    return (
        df.select(company.alias("companyName"), F.trim(url).alias("url"))
        .filter(F.col("url").isNotNull() & (F.trim(F.col("url")) != ""))
    )


def read_bulk_csv(spark: SparkSession, path: str) -> DataFrame:
    """S8: CSV upload → (companyName, url) rows."""
    return coalesce_synonyms(spark.read.csv(path, header=True))


def export_csv(
    df: DataFrame,
    path: str,
    columns: list[str] | None = None,
    hidden: tuple[str, ...] = (),
) -> None:
    """S9: ordered visible columns, quote-everything escaping."""
    cols = [c for c in (columns or df.columns) if c not in hidden]
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        # RFC-4180 double-quote doubling, matching the reference's
        # `.replace(/"/g, '""')` (CustomDataGrid.jsx:176)
        .option("escape", '"')
        .csv(path)
    )


def excel_report_frames(results: DataFrame) -> dict[str, DataFrame]:
    """S10 structure: the two sheets as DataFrames (Spark-side; the binary
    .xlsx write is the only gated part). ``results`` rows are per-company
    crawl outcomes with a ``locations`` count and quality columns."""
    # min, not first: first() is partition-order-dependent and would break
    # the engine's deterministic-rerun contract (X29/X30)
    summary = results.groupBy("companyName").agg(
        F.min("url").alias("url"),
        F.min("status").alias("status"),
        F.sum("locationsCount").alias("locationsCount"),
    )
    if "qualityScore" in results.columns and "qualityColor" not in results.columns:
        # X25 hex color-coding carried by the report
        # (data-quality.service.js:60-68, bulk-processor.service.js:127-240)
        from web_crawler_spark.functions.records import quality_color

        results = results.withColumn("qualityColor", quality_color("qualityScore"))
    return {"Summary": summary, "All Locations": results}


def write_excel_report(results: DataFrame, path: str) -> str:
    """S10: two-sheet workbook with quality color-coded cells. Requires
    openpyxl (driver-side sink)."""
    frames = excel_report_frames(results)
    if not HAVE_OPENPYXL:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl not installed in this environment; sheet structure is "
            "available via excel_report_frames()"
        )
    import pandas as pd  # pragma: no cover

    with pd.ExcelWriter(path, engine="openpyxl") as xw:  # pragma: no cover
        for sheet, sdf in frames.items():
            pdf = sdf.toPandas()
            pdf.to_excel(xw, sheet_name=sheet, index=False)
            if "qualityColor" in pdf.columns and "qualityScore" in pdf.columns:
                from openpyxl.styles import PatternFill

                ws = xw.sheets[sheet]
                ci = list(pdf.columns).index("qualityScore") + 1
                for r, hexcol in enumerate(pdf["qualityColor"], start=2):
                    if hexcol:
                        ws.cell(row=r, column=ci).fill = PatternFill(
                            "solid", fgColor=str(hexcol).lstrip("#")
                        )
    return path  # pragma: no cover
