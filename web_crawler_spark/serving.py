"""S11/S12: the serving boundary — JSON response envelope + result cache.

Reference semantics (restated):
- S11 (controllers/crawl.controller.js:55-64): respond with
  ``{success, data[], totalRecords, cached, mode, jobId, crawledAt}``.
- S12 (cache.service.js:47-69, crawl.controller.js:24-36,52-53): results
  cached under key ``crawl:{urls}-{mode}`` with a TTL; site-wide crawls
  skip the cache.

Spark restatement: the envelope is a driver-side shape over a bounded
result (the one legitimate collect — it IS the API response). The cache
is a SnapshotTable keyed by the deterministic request hash: a hit reads
the stored parquet, a miss computes and appends. TTL becomes snapshot
expiry. jobId/crawledAt are deterministic (hash id + pinned run_ts) per
the X29/X30 determinism replacement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from web_crawler_spark.hashing import hash64
from web_crawler_spark.lake import SnapshotTable


def request_key(urls: list[str], mode: str) -> str:
    """crawl:{urls}-{mode}, hashed deterministically (cache.service.js:59).

    Each URL part is length-prefixed before hashing (hash64 '|'-joins
    parts), so lists whose elements contain '|' cannot collide either —
    ['a|b','c'] and ['a','b|c'] hash differently."""
    return f"req_{hash64('crawl', len(urls), *[f'{len(u)}:{u}' for u in urls], mode):015x}"


def json_response(
    df: DataFrame,
    job_urls: list[str],
    mode: str = "single",
    cached: bool = False,
    run_ts: str = "1970-01-01T00:00:00Z",
    limit: int = 100_000,
) -> dict:
    """S11: the API response envelope. ``limit`` bounds the collect — a
    serving response is a bounded result set, never a full-table dump."""
    rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
    return {
        "success": True,
        "data": rows,
        "totalRecords": len(rows),
        "cached": cached,
        "mode": mode,
        "jobId": f"job_{hash64('job', len(job_urls), *[f'{len(u)}:{u}' for u in job_urls], run_ts):015x}",
        "crawledAt": run_ts,
    }


class ResultCache:
    """S12: request-hash-keyed result store on SnapshotTables."""

    def __init__(self, root: str):
        self.root = root

    def _tbl(self, key: str) -> SnapshotTable:
        return SnapshotTable(os.path.join(self.root, key))

    def get(self, spark: SparkSession, urls: list[str], mode: str) -> DataFrame | None:
        if mode == "site":  # site-wide crawls skip the cache (:52-53)
            return None
        tbl = self._tbl(request_key(urls, mode))
        return tbl.read(spark) if tbl.exists() else None

    def put(self, df: DataFrame, urls: list[str], mode: str) -> None:
        if mode == "site":
            return
        self._tbl(request_key(urls, mode)).overwrite(
            df, summary={"urls": len(urls), "mode": mode}
        )

    def expire(self, keep_last: int = 1) -> None:
        """TTL analogue: retain only the latest snapshot per request."""
        if not os.path.isdir(self.root):
            return
        for key in os.listdir(self.root):
            self._tbl(key).expire_snapshots(keep_last)
