"""Batch fetch stage: the Spark analogue of S1-S3 (Puppeteer/axios/Playwright).

Reference semantics (crawler.service.js:296-302, professional-crawler
:162-176, playwright-renderer :45-173): fetch a URL → HTML body; for SPA
pages also capture XHR JSON. In this sandbox the network is replaced by the
deterministic SyntheticWeb page generator; the Spark plumbing — Arrow-batched
``mapInPandas`` over host-partitioned frontier slices, heavyweight client
initialized once per Python worker (module-level lazy init, the analogue of
the reference's browser-singleton reuse, playwright-renderer.service.js:16-27)
— is exactly what a real HTTP fetcher would use.

The fetch stage is the one genuinely side-effecting operator, so the driver
materializes its output (checkpoint) before reuse; everything downstream is
pure DataFrame logic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.synthetic.web import SyntheticWeb

FETCH_RESULT_FIELDS = (
    "url string, seed_host string, depth int, enqueue_seq long, "
    "wave int, visit_seq long, body string, xhr_json string, "
    "fetch_ok boolean, n_locations int"
)


def make_fetch_udf(web: SyntheticWeb):
    """mapInPandas function fetching a batch of frontier rows."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # module-level client init would go here (once per worker)
        for pdf in batches:
            bodies, xhrs, oks, nlocs = [], [], [], []
            for url in pdf["url"]:
                idx = web.page_index(url)
                if idx is None:
                    bodies.append(None)
                    xhrs.append(None)
                    oks.append(False)
                    nlocs.append(0)
                else:
                    h, p = idx
                    bodies.append(web.body(h, p))
                    xhrs.append(web.xhr_json(h, p))
                    oks.append(True)
                    # W5 early-exit input: location records this page yields
                    # (professional-crawler.service.js:79-82 counts them)
                    nlocs.append(web.n_locations(h, p))
            out = pdf[["url", "seed_host", "depth", "enqueue_seq", "wave", "visit_seq"]].copy()
            out["body"] = bodies
            out["xhr_json"] = xhrs
            out["fetch_ok"] = oks
            out["n_locations"] = pd.array(nlocs, dtype="int32")
            yield out

    return fetch_batches


def fetch_pages(
    take: DataFrame,
    web: SyntheticWeb,
    salt_partitions: int | None = None,
    host_salts: DataFrame | None = None,
) -> DataFrame:
    """Fetch the budgeted wave slice.

    Two skew modes (politeness is already enforced upstream by the budget
    rank, so fetch order within a wave is free to parallelize):

    - ``salt_partitions``: ``repartition(hash(url) % N)`` — uniform spread,
      maximal parallelism, no host locality.
    - ``host_salts`` (seed_host, n_salt — from sketch.hot_key_salts): the
      north_rule's salted repartition-by-host. Cold hosts stay whole in one
      shard (connection/ratelimit locality for a real fetcher); a hot host
      splits into n_salt shards so it cannot skew a partition. The salts
      table is one row per distinct host in the wave — broadcast.
    """
    cols = ["url", "seed_host", "depth", "enqueue_seq", "wave", "visit_seq"]
    sliced = take.select(*cols)
    if host_salts is not None:
        salts = host_salts.toDF("seed_host", "n_salt")
        sliced = (
            sliced.join(F.broadcast(salts), "seed_host", "left")
            .withColumn(
                "_shard",
                F.pmod(F.xxhash64("url"), F.coalesce(F.col("n_salt"), F.lit(1))),
            )
        )
        sliced = (
            sliced.repartition(salt_partitions, "seed_host", "_shard")
            if salt_partitions
            else sliced.repartition("seed_host", "_shard")
        ).select(*cols)
    elif salt_partitions:
        sliced = sliced.repartition(salt_partitions, F.pmod(F.xxhash64("url"), F.lit(salt_partitions)))
    return sliced.mapInPandas(make_fetch_udf(web), schema=FETCH_RESULT_FIELDS)
