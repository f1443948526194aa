"""A7: progress counters — running totals without extra jobs.

Reference semantics (progress-tracker.service.js:14-55, restated): a job
carries ``{pagesProcessed, locationsFound, errors, progress%}`` updated as
the crawl advances and pushed to subscribers.

Spark restatement: ``DataFrame.observe`` with a ``pyspark.sql.Observation``
attaches named aggregate metrics to a plan; they are computed **during**
the action that materializes the plan — zero additional jobs, unlike a
separate ``count()``. The crawl driver's per-wave snapshot summaries
(plans/crawl.py) are the durable variant of the same counters; this is
the in-flight variant a progress API would poll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_progress(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach rowsProcessed / errors / locationsFound observations.

    Metrics are computed piggyback on whatever action later materializes
    the returned DataFrame; read them via ``obs.get`` afterwards."""
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("rowsProcessed")]
    if "fetch_ok" in df.columns:
        metrics.append(
            F.sum(F.when(~F.col("fetch_ok"), 1).otherwise(0)).alias("errors")
        )
    if "locationName" in df.columns:
        metrics.append(F.count(F.col("locationName")).alias("locationsFound"))
    return df.observe(obs, *metrics), obs


def progress_pct(processed: int, total: int) -> float:
    """progress = processed/total*100 (progress-tracker.service.js:52)."""
    return round(processed / total * 100.0, 1) if total else 0.0
