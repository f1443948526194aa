"""Partitioned Bloom filter for the URL-seen set.

north_rule: "a 10^10-URL frontier held in Iceberg tables with a partitioned
Bloom/cuckoo-filter URL-seen set". Spark 4.1 does not SQL-register
``bloom_filter_agg`` (it is an internal expression used only by runtime
join filters), so this module implements the sketch as library code:

- the URL space is partitioned into ``n_buckets`` by ``xxhash64(url)``;
  each bucket owns an ``m_bits`` bitmap → the whole filter is a small
  DataFrame ``(bucket int, bitmap binary)`` persisted as a side table
  (SnapshotTable) next to the frontier;
- bit positions use double hashing ``(h1 + i*h2) mod m`` for i in [0,k)
  — h1/h2 are computed JVM-side (``xxhash64``), the bit twiddling is
  vectorized numpy over Arrow batches (no per-row Python);
- the filter is mergeable: per-bucket bitwise OR → incremental per-wave
  maintenance instead of rebuilds;
- false positives only cost an extra exact anti-join probe; false
  negatives are impossible → exactness is preserved by construction
  (the anti-join downstream stays authoritative).

Reference analogue: the in-memory ``visited``/``allDiscoveredUrls`` Sets
(site-crawler.service.js:134-136) — which cannot exist at 10^10 URLs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
DEFAULT_M_BITS = 1 << 20  # 128 KiB per bucket
DEFAULT_K = 6


def _with_hashes(df: DataFrame, url_col: str, n_buckets: int) -> DataFrame:
    return (
        df.withColumn("_h1", F.xxhash64(F.col(url_col)))
        .withColumn("_h2", F.xxhash64(F.col(url_col), F.lit(0x9E3779B9)))
        .withColumn("_bucket", F.pmod(F.col("_h1"), F.lit(n_buckets)).cast("int"))
    )


def _bit_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) array of bit indices via double hashing; numpy-vectorized."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)  # odd step → full cycle
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1u[:, None] + i * h2u[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_bloom(
    df: DataFrame,
    url_col: str = "url",
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate a DataFrame of URLs into the partitioned bloom table."""

    def agg_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _bit_positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), m_bits, k)
        flat = pos.reshape(-1)
        np.bitwise_or.at(bitmap, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(pdf["_bucket"].iloc[0])], "bitmap": [bitmap.tobytes()]}
        )

    hashed = _with_hashes(df.select(url_col), url_col, n_buckets)
    return hashed.groupBy("_bucket").applyInPandas(
        agg_bucket, schema="bucket int, bitmap binary"
    )


def collapse_blooms(df: DataFrame) -> DataFrame:
    """Per-bucket bitwise OR over any number of bloom rows per bucket.

    This is the merge-on-read half of O(delta) bloom maintenance: wave
    deltas are appended as extra ``(bucket, bitmap)`` rows and collapsed
    to one row per bucket here (OR is associative/commutative/idempotent,
    so re-appended deltas from a replayed wave are harmless)."""

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        maps = [np.frombuffer(m, dtype=np.uint8) for m in pdf["bitmap"] if m is not None]
        out = maps[0].copy()
        for m in maps[1:]:
            out |= m
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bitmap": [out.tobytes()]})

    return (
        df.select("bucket", "bitmap")
        .groupBy("bucket")
        .applyInPandas(or_group, schema="bucket int, bitmap binary")
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-bucket bitwise OR of two bloom tables (either may miss buckets)."""
    return collapse_blooms(
        a.select("bucket", "bitmap").unionByName(b.select("bucket", "bitmap"))
    )


def prune(
    candidates: DataFrame,
    bloom: DataFrame,
    url_col: str = "url",
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Adds boolean ``maybe_seen``: False ⇒ definitely NOT in the seen set.

    The bloom table (n_buckets rows × m_bits/8 bytes) broadcast-joins onto
    the candidate stream; membership check is numpy over Arrow batches.
    """
    hashed = _with_hashes(candidates, url_col, n_buckets)
    joined = hashed.join(F.broadcast(bloom), hashed["_bucket"] == bloom["bucket"], "left")

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    )
    schema = out_fields + ", maybe_seen boolean"
    in_cols = [f.name for f in candidates.schema.fields]

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            res = np.zeros(n, dtype=bool)
            if n:
                valid = pdf["bitmap"].notna().to_numpy()
                if valid.any():
                    pos = _bit_positions(
                        pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), m_bits, k
                    )
                    hit = np.ones(n, dtype=bool)
                    # per-row bitmap differs by bucket; group by bucket
                    for bkt, idx in pdf.groupby("_bucket").indices.items():
                        bm_val = pdf["bitmap"].iloc[idx[0]]
                        if bm_val is None:
                            hit[idx] = False
                            continue
                        bitmap = np.frombuffer(bm_val, dtype=np.uint8)
                        p = pos[idx]
                        bits = (bitmap[p >> 3] >> (p & 7)) & 1
                        hit[idx] = bits.all(axis=1)
                    res = hit & valid
            out = pdf[in_cols].copy()
            out["maybe_seen"] = res
            yield out

    return joined.mapInPandas(check, schema=schema)
