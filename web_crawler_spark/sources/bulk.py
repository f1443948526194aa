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
sink: the workbook structure (sheet names, column layout, summary rows)
is computed Spark-side; the binary .xlsx write uses openpyxl when
installed, else the stdlib zipfile+XML writer below (an xlsx is a zip of
ECMA-376 SpreadsheetML parts) — the sink runs everywhere.
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


# ---------------------------------------------------------------- S10 ------
# Minimal stdlib xlsx writer: an .xlsx is a zip of ECMA-376 SpreadsheetML
# XML parts. This emits exactly the subset the report needs — inline
# strings (no sharedStrings table), numeric cells, and solid-pattern fills
# for the X25 quality colors — so the Excel sink runs in environments
# without openpyxl (which stays the fast path when installed).

_XLSX_XMLNS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_XLSX_RELNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_letter(i: int) -> str:
    """0-based column index -> A1-notation letters."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _cell_xml(ref: str, v, style: int = 0) -> str:
    s_attr = f' s="{style}"' if style else ""
    if v is None or (isinstance(v, float) and v != v):
        return f'<c r="{ref}"{s_attr}/>'
    if isinstance(v, bool):
        return f'<c r="{ref}"{s_attr} t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"{s_attr}><v>{v!r}</v></c>'
    return (
        f'<c r="{ref}"{s_attr} t="inlineStr"><is><t xml:space="preserve">'
        f"{_xml_escape(str(v))}</t></is></c>"
    )


def _sheet_xml(cols: list[str], rows: list[tuple], styles: list[dict]) -> str:
    """One worksheet: header row + data rows; ``styles`` gives per-row
    {col_index: cellXfs_index} fill assignments."""
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_XLSX_XMLNS}"><sheetData>',
        '<row r="1">'
        + "".join(_cell_xml(f"{_col_letter(i)}1", c) for i, c in enumerate(cols))
        + "</row>",
    ]
    for rn, row in enumerate(rows, start=2):
        smap = styles[rn - 2] if rn - 2 < len(styles) else {}
        out.append(
            f'<row r="{rn}">'
            + "".join(
                _cell_xml(f"{_col_letter(i)}{rn}", v, smap.get(i, 0))
                for i, v in enumerate(row)
            )
            + "</row>"
        )
    out.append("</sheetData></worksheet>")
    return "".join(out)


def _styles_xml(colors: list[str]) -> str:
    """cellXfs index i+1 carries a solid fill of colors[i] (fill ids 0/1
    are the spec-reserved none/gray125 fills)."""
    fills = [
        '<fill><patternFill patternType="none"/></fill>',
        '<fill><patternFill patternType="gray125"/></fill>',
    ] + [
        f'<fill><patternFill patternType="solid"><fgColor rgb="FF{c}"/>'
        '<bgColor indexed="64"/></patternFill></fill>'
        for c in colors
    ]
    xfs = ['<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'] + [
        f'<xf numFmtId="0" fontId="0" fillId="{i + 2}" borderId="0" applyFill="1"/>'
        for i in range(len(colors))
    ]
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_XLSX_XMLNS}">'
        '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        f'<fills count="{len(fills)}">' + "".join(fills) + "</fills>"
        '<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>'
        '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
        f'<cellXfs count="{len(xfs)}">' + "".join(xfs) + "</cellXfs>"
        "</styleSheet>"
    )


def write_xlsx_stdlib(sheets: dict[str, tuple[list[str], list[tuple]]], path: str) -> str:
    """Write a multi-sheet workbook with stdlib zipfile+XML only. ``sheets``
    maps sheet name -> (columns, rows). Cells in a ``qualityScore`` column
    are filled with the row's ``qualityColor`` hex (X25 color-coding,
    bulk-processor.service.js:127-240)."""
    import zipfile

    # collect the distinct quality colors across sheets -> style indices
    colors: list[str] = []
    sheet_styles: dict[str, list[dict]] = {}
    for name, (cols, rows) in sheets.items():
        styles: list[dict] = []
        if "qualityScore" in cols and "qualityColor" in cols:
            si, ci = cols.index("qualityScore"), cols.index("qualityColor")
            for row in rows:
                hexcol = row[ci]
                smap: dict = {}
                if hexcol:
                    c = str(hexcol).lstrip("#").upper()
                    if c not in colors:
                        colors.append(c)
                    smap[si] = colors.index(c) + 1
                styles.append(smap)
        sheet_styles[name] = styles

    names = list(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId1" Type="{_XLSX_RELNS}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_XLSX_XMLNS}" xmlns:r="{_XLSX_RELNS}"><sheets>'
        + "".join(
            f'<sheet name="{_xml_escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_XLSX_RELNS}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="{_XLSX_RELNS}/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _styles_xml(colors))
        for i, n in enumerate(names):
            cols, rows = sheets[n]
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(cols, rows, sheet_styles[n]),
            )
    return path


def read_xlsx_grid(path: str) -> list[tuple[str, int, str, str]]:
    """Strict re-reader for the S10 roundtrip oracle: parse the workbook's
    own XML (zipfile + ElementTree, no spreadsheet library) and return the
    cell grid as (sheet, data_row_index, column_name, value_as_written).
    Header row 1 names the columns; empty cells are omitted."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": _XLSX_XMLNS}

    def _cell_ref_letters(ref: str) -> str:
        return "".join(ch for ch in ref if ch.isalpha())

    def _cell_val(cell) -> str | None:
        if cell.get("t") == "inlineStr":
            t = cell.find("m:is/m:t", ns)
            return t.text if t is not None and t.text is not None else ""
        v = cell.find("m:v", ns)
        return v.text if v is not None else None

    out: list[tuple[str, int, str, str]] = []
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.findall(".//m:sheet", ns)]
        for i, name in enumerate(names):
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i + 1}.xml"))
            rows = root.findall(".//m:row", ns)
            header = {
                _cell_ref_letters(c.get("r")): _cell_val(c)
                for c in rows[0].findall("m:c", ns)
            }
            for rn, row in enumerate(rows[1:]):
                for c in row.findall("m:c", ns):
                    val = _cell_val(c)
                    if val is not None:
                        out.append((name, rn, header[_cell_ref_letters(c.get("r"))], val))
    return out


def write_excel_report(results: DataFrame, path: str, force_stdlib: bool = False) -> str:
    """S10: two-sheet workbook with quality color-coded cells. Uses
    openpyxl when installed (fast path); otherwise falls back to the
    stdlib zipfile+XML writer above — the sink runs everywhere.
    ``force_stdlib`` pins the stdlib writer regardless (the roundtrip
    oracle parses the stdlib writer's exact XML subset)."""
    frames = excel_report_frames(results)
    if force_stdlib or not HAVE_OPENPYXL:
        sheets = {}
        for sheet, sdf in frames.items():
            # deterministic row order: a report is a small, bounded result
            rows = sdf.orderBy(sdf.columns[0]).collect()
            sheets[sheet] = (list(sdf.columns), [tuple(r) for r in rows])
        return write_xlsx_stdlib(sheets, path)
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
