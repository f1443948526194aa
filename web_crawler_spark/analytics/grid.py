"""The analytics/query surface: filter → sort → paginate → export.

Re-expresses the reference UI's data grid pipeline
(web-crawler-ui/src/components/CustomDataGrid.jsx): conjunctive
case-insensitive contains-filters (:44-52, F11), quality-range filter
(AdvancedFilter.jsx:37-44, F12), single-key sort with nulls last (:55-69,
W7), pagination (:72-77, W8), CSV export of the filtered+sorted view
(:168-190, S9) — as one declarative DataFrame chain that Catalyst folds
into a single scan with pushed filters.

Pagination note for scale: ``paginate`` uses a global sort + offset/limit,
which is the correct semantics for a UI page; for deep paging over 10^10
rows use keyset pagination (``after`` anchor), which prunes with the sort
key instead of skipping rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contains_filter(df: DataFrame, filters: dict[str, str]) -> DataFrame:
    """F11: per-column case-insensitive substring, AND-folded."""
    for col, needle in filters.items():
        if needle:
            df = df.filter(F.lower(F.col(col).cast("string")).contains(needle.lower()))
    return df


def range_filter(df: DataFrame, col: str, spec: str) -> DataFrame:
    """F12: '90-100'-style inclusive range."""
    lo, hi = (float(x) for x in spec.split("-", 1))
    return df.filter(F.col(col).between(lo, hi))


def sort_view(df: DataFrame, key: str, ascending: bool = True) -> DataFrame:
    """W7: single-key sort, nulls last either direction."""
    c = F.col(key)
    return df.orderBy(c.asc_nulls_last() if ascending else c.desc_nulls_last())


def paginate(df: DataFrame, page: int, size: int = 20) -> DataFrame:
    """W8: 1-based page slice of an already-sorted view."""
    return df.offset((page - 1) * size).limit(size)


def keyset_page(df: DataFrame, key: str, after, size: int = 20, ascending: bool = True) -> DataFrame:
    """Deep-pagination variant: WHERE key > anchor ORDER BY key LIMIT n —
    partition-prunable, no offset skip."""
    c = F.col(key)
    pred = c > after if ascending else c < after
    return df.filter(pred).orderBy(c.asc() if ascending else c.desc()).limit(size)


def autocomplete(df: DataFrame, col: str, value: str, limit: int = 10) -> DataFrame:
    """Autocomplete suggestions (useAutocomplete.js:11-15): distinct values
    of ``col`` whose lowercase form contains lowercase(value); blank or
    whitespace-only input yields no suggestions (the hook's
    ``value.trim().length > 0`` gate). The reference filters a driver-side
    options array in its original order; the distributed restatement
    returns sorted distinct values (deterministic at any scale) capped at
    ``limit`` — the UI shows a bounded dropdown, so the cap is a top-N,
    not a truncation of semantics."""
    if not value or not value.strip():
        return df.select(F.col(col).cast("string").alias("suggestion")).limit(0)
    return (
        df.select(F.col(col).cast("string").alias("suggestion"))
        .where(F.lower(F.col("suggestion")).contains(value.lower()))
        .distinct()
        .orderBy("suggestion")
        .limit(limit)
    )


def export_csv(df: DataFrame, path: str, columns: list[str] | None = None) -> None:
    """S9: CSV export with full quoting, matching the UI's "-escaped export.
    escape='"' doubles embedded quotes (RFC 4180) instead of Spark's
    default backslash-escaping."""
    out = df.select(*columns) if columns else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def grid_query(
    df: DataFrame,
    filters: dict[str, str] | None = None,
    quality_range: str | None = None,
    sort_key: str | None = None,
    ascending: bool = True,
    page: int = 1,
    size: int = 20,
    quality_col: str = "qualityScore",
) -> DataFrame:
    """The full UI pipeline in one declarative chain."""
    if filters:
        df = contains_filter(df, filters)
    if quality_range:
        df = range_filter(df, quality_col, quality_range)
    if sort_key:
        df = sort_view(df, sort_key, ascending)
    return paginate(df, page, size)
