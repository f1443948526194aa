"""web_crawler_spark — PySpark-native crawl-frontier + extraction analytics engine.

A from-scratch re-creation (NOT a port) of the query/data-processing
capabilities of the Arko-Puitandi/web-crawler reference (Node/Express +
Puppeteer), re-expressed Spark-first:

- URL frontier + seen-set as checkpointed lake tables, anti-join dedup with
  Bloom-filter pre-prune (reference: in-memory ``visited`` Set + FIFO array,
  site-crawler.service.js:134-136).
- Per-host politeness budgets + robots semantics as broadcast joins and
  window ranking (reference: robots.service.js, 1000ms sleep loops).
- Extraction kernels (addresses, phones, emails, JSON-LD, quality scores)
  as built-in column expressions and vectorized pandas UDFs.
- Dedup: exact canonical-key, fuzzy blocked greedy clustering, phash
  near-dup for the image payload, MinHash-LSH / SimHash for documents.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
