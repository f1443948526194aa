"""Sketch operators: HyperLogLog cardinality and count-min frequency.

The reference tracks crawl-wide state with exact in-memory structures —
``const visited = new Set()`` / ``allDiscoveredUrls``
(site-crawler.service.js:134-136) and a ``seen`` Map for per-key counters
(crawler.service.js:207). Correct on one node at one site's scale; at a
10^10-URL frontier neither a distinct-URL count nor a per-host frequency
table fits anywhere, and both are needed every wave (progress reporting,
politeness skew control). These are the distributed restatements:

- **HyperLogLog** (``hll_registers`` / ``hll_estimate``): distinct-count in
  ``2^p`` registers. The register table is an ordinary DataFrame, mergeable
  across waves/partitions/days by ``max`` per register — a union of two
  sketches followed by ``hll_merge`` IS the sketch of the union of inputs,
  so incremental crawls never rescan history to re-estimate.
- **Count-min** (``cms_build`` / ``cms_lookup``): per-key frequency in a
  ``d x w`` counter grid, mergeable by ``+``, never undercounting. Feeds
  ``hot_key_salts`` so a hot host widens its salt range and cannot skew a
  fetch partition (the scale story behind plans/crawl.py's salted fetch).

Cross-engine determinism (the registry oracles these bit-for-bit):

- only ``hash64`` (hashing.py) — md5-based, identical in Spark/DuckDB.
- rho (HLL leading-zero rank) via integer-exact ``length(bin(x))`` — both
  engines render minimal-width binary strings, so no float log2.
- the register sum is kept integral: ``sum(2^(50 - rho))`` as BIGINT is
  order-independent, unlike a double harmonic sum; the single double
  division happens once, on identical operands, in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from web_crawler_spark.hashing import hash64_col

# 60-bit hash64 split: low P bits -> register index, high (60-P) bits -> rho.
HLL_P = 12
HLL_M = 1 << HLL_P
_HLL_W = 60 - HLL_P  # bits available for the rho rank
# Integral harmonic-sum scale: terms 2^(SC - rho), rho in [1, W+1] -> every
# term is a positive integer; max sum m * 2^(SC-1) = 2^61 fits signed int64.
_HLL_SC = 50


def hll_alpha(m: int = HLL_M) -> float:
    """Flajolet et al. bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str | Column,
    salt: str = "hll",
    by: str | list[str] | None = None,
) -> DataFrame:
    """Sketch a column into an HLL register table (register, rho) —
    optionally one independent sketch per ``by`` group (distinct URLs per
    host, distinct users per event type: the per-key cardinalities a
    frontier dashboard reads every wave; reduce side is O(groups * 2^p)).

    One row per *occupied* register (<= 2^p rows per group); absent
    registers mean rho=0. The only shuffle is the (group, 2^p)-key
    groupBy, with map-side partial max.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    c = F.col(col) if isinstance(col, str) else col
    h = hash64_col(F.lit(salt), c)
    # h is a 60-bit non-negative value in a signed long: >> is exact integer
    # division by 2^p (a double-based `/` would lose bits past 2^53).
    rest = F.shiftright(h, HLL_P)  # high 48 bits
    rho = F.when(rest == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *keys,
            (h % F.lit(HLL_M)).cast("long").alias("register"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    *sketches: DataFrame, by: str | list[str] | None = None
) -> DataFrame:
    """Union register tables into the sketch of the union of their inputs.
    Pass the same ``by`` the sketches were built with — per-group register
    tables merge per group; the default merges global sketches."""
    keys = [by] if isinstance(by, str) else list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, by: str | list[str] | None = None
) -> DataFrame:
    """Reduce a register table to one row (per ``by`` group, if given —
    pass the same ``by`` the registers were built with) of integer-exact
    components plus the raw HLL estimate.

    Returns (m, occupied, zero_registers, sum_scaled, est) where
    ``sum_scaled = sum(2^(50-rho)) + zeros * 2^50`` (BIGINT, addition order
    irrelevant) and ``est = alpha * m^2 * 2^50 / sum_scaled`` — the one
    double op, bit-identical across engines given the integral operands.
    Small/large-range corrections are a consumer choice (zero_registers is
    exposed for linear counting); the raw estimator is the portable core.
    """
    const = hll_alpha() * HLL_M * HLL_M * float(1 << _HLL_SC)
    # explicit, never inferred: a stray column on the register table must
    # not silently turn a global estimate into per-value group estimates
    keys = [by] if isinstance(by, str) else list(by or [])
    agg = registers.select(*keys, "register", "rho").groupBy(*keys).agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_SC} - rho AS INT))"))
        .cast("long")
        .alias("sum_occ"),
    )
    zeros = F.lit(HLL_M) - F.col("occupied")
    sum_scaled = (
        F.col("sum_occ") + zeros * F.shiftleft(F.lit(1).cast("long"), _HLL_SC)
    ).cast("long")
    return agg.select(
        *keys,
        F.lit(HLL_M).cast("long").alias("m"),
        F.col("occupied").cast("long").alias("occupied"),
        zeros.cast("long").alias("zero_registers"),
        sum_scaled.alias("sum_scaled"),
        (F.lit(const) / sum_scaled.cast("double")).alias("est"),
    )


def hll_estimate_sql(
    input_sql: str, expr: str, salt: str = "hll", by: str | None = None
) -> str:
    """DuckDB oracle for hll_registers |> hll_estimate over ``expr`` drawn
    from ``input_sql`` (a FROM-able fragment), optionally per ``by``
    group. Mirrors every step."""
    from web_crawler_spark.hashing import hash64_sql

    h = hash64_sql(f"concat_ws('|', '{salt}', CAST({expr} AS VARCHAR))")
    const = repr(hll_alpha() * HLL_M * HLL_M * float(1 << _HLL_SC))
    g = f"{by}, " if by else ""
    gsel = f"{by}," if by else ""
    return f"""
    WITH hr AS (
      SELECT {gsel} register, max(rho) AS rho FROM (
        SELECT {gsel} ({h}) % {HLL_M} AS register,
               CASE WHEN ({h}) >> {HLL_P} = 0 THEN {_HLL_W + 1}
                    ELSE {_HLL_W + 1} - length(bin(({h}) >> {HLL_P}))
               END::BIGINT AS rho
        FROM {input_sql})
      GROUP BY {g}register),
    ag AS (
      SELECT {gsel} count(*)::BIGINT AS occupied,
             sum(1::BIGINT << (({_HLL_SC} - rho)::INTEGER))::BIGINT AS sum_occ
      FROM hr {"GROUP BY " + by if by else ""})
    SELECT {gsel} {HLL_M}::BIGINT AS m, occupied,
           ({HLL_M} - occupied)::BIGINT AS zero_registers,
           (sum_occ + ({HLL_M} - occupied) * (1::BIGINT << {_HLL_SC}))::BIGINT
             AS sum_scaled,
           {const} / (sum_occ + ({HLL_M} - occupied)
                      * (1::BIGINT << {_HLL_SC}))::DOUBLE AS est
    FROM ag
    """


# --------------------------------------------------------------------------
# count-min
# --------------------------------------------------------------------------
CMS_D = 4
CMS_W = 512


def _cms_bucket(c: Column, row: int, w: int) -> Column:
    return (hash64_col(F.lit(f"cms{row}"), c) % F.lit(w)).cast("long")


def cms_build(
    df: DataFrame,
    col: str | Column,
    weight: Column | None = None,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Count-min sketch of a column: (row, bucket, cnt), d*w rows max.

    Built as one select + one groupBy on a (row, bucket) key space of d*w —
    map-side combine collapses each partition to <= d*w rows before the
    shuffle, so reduce-side cost is O(d*w) regardless of input size.
    Two sketches with the same (d, w) merge by summing cnt per cell.
    """
    c = F.col(col) if isinstance(col, str) else col
    wt = F.lit(1).cast("long") if weight is None else weight.cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row"),
                _cms_bucket(c, i, w).alias("bucket"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"), wt.alias("wt"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    col: str | Column,
    d: int = CMS_D,
    w: int = CMS_W,
    out: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: min over the d
    counters each key hashes to. The sketch (<= d*w rows) is broadcast, so
    the lookup is a map-side join — no shuffle on the key table."""
    c = F.col(col) if isinstance(col, str) else col
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row"),
                _cms_bucket(c, i, w).alias("bucket"),
            )
            for i in range(d)
        ]
    )
    probes = keys.select("*", F.posexplode(cells).alias("_i", "cell")).select(
        *keys.columns, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(*keys.columns).agg(F.min("cnt").alias(out))


def cms_cell_sql(expr: str, row: int, w: int = CMS_W) -> str:
    """DuckDB fragment for one CMS bucket index of a VARCHAR-castable expr."""
    from web_crawler_spark.hashing import hash64_sql

    h = hash64_sql(f"concat_ws('|', 'cms{row}', CAST({expr} AS VARCHAR))")
    return f"({h}) % {w}"


def cms_estimate_sql(
    input_sql: str, expr: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB oracle: per distinct key of ``expr``, the CMS estimate (min
    over d counter cells built from the same input). FROM-able fragment
    yielding (key, cms_est)."""
    probes = " UNION ALL ".join(
        f"SELECT {i} AS row, {cms_cell_sql(expr, i, w)} AS bucket,"
        f" CAST({expr} AS VARCHAR) AS key FROM {input_sql}"
        for i in range(d)
    )
    return f"""(
      WITH cells AS ({probes}),
      sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt
             FROM cells GROUP BY row, bucket),
      pk AS (SELECT DISTINCT row, bucket, key FROM cells)
      SELECT key, min(cnt)::BIGINT AS cms_est
      FROM pk JOIN sk USING (row, bucket) GROUP BY key
    )"""


def hot_key_salts(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    per_salt_budget: int,
    max_salt: int = 64,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Politeness-skew control from the sketch alone: for each key, the
    number of salt shards its rows should spread over so no shard exceeds
    ``per_salt_budget`` estimated rows. CMS never undercounts, so a hot
    host can never be under-salted — collisions only over-spread, which
    costs a few extra tiny shards, never a skewed partition.

    Returns (col, n_salt >= 1). Join (broadcast — one row per distinct key
    crossing the budget is all a caller need keep) onto the frontier and
    shard with ``pmod(hash64_col(url), n_salt)``.
    """
    est = cms_lookup(sketch, keys, col, d=d, w=w)
    n_salt = F.least(
        F.greatest(F.ceil(F.col("cms_est") / F.lit(per_salt_budget)), F.lit(1)),
        F.lit(max_salt),
    )
    return est.select(col, n_salt.cast("int").alias("n_salt"))


# --------------------------------------------------------------------------
# exact distributed quantiles (no global sort)
# --------------------------------------------------------------------------
def exact_quantiles(
    df: DataFrame,
    col: str | Column,
    probs: list[float],
    by: str | None = None,
) -> DataFrame:
    """EXACT quantiles of an integer-valued column, optionally per group —
    the corpus-datasheet statistics (token-length p50/p90/p99 per
    language) computed without the 100 TB trap of a global sort.

    Construction: value histogram first (one map-side-combinable groupBy;
    reduce side is O(distinct values), and a token/length/score column has
    a bounded value domain no matter how many rows feed it), then a
    running-count window OVER THE HISTOGRAM (parallelism = groups,
    window input = histogram rows, never corpus rows). Quantile rule is
    type-1 / lower: quantile p = the element at 0-based index
    floor(p * (n-1)) of the sorted multiset — the unique histogram bucket
    with cum_before <= idx < cum, one row per (group, p), deterministic
    and engine-exact (no interpolation doubles).

    Spark's own ``approx_percentile`` is the built-in alternative; it is
    neither exact nor cross-engine reproducible, which is what the
    correctness gate (and a datasheet) needs.

    NULLs in the target column are excluded before the histogram is
    built (quantiles of the non-null multiset, n counts non-null rows):
    engines disagree on where NULL sorts in a window (Spark first,
    DuckDB last), so letting NULL become a histogram bucket would
    silently skew the running counts differently per engine. Mirror the
    same ``WHERE col IS NOT NULL`` in any hand-written oracle.

    Returns (by?, p, value, n).
    """
    keys = [by] if by else []
    c = F.col(col) if isinstance(col, str) else col
    df = df.filter(c.isNotNull())
    hist = df.groupBy(*keys, c.alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    wcum = Window.partitionBy(*keys).orderBy("_v")
    wall = Window.partitionBy(*keys)
    cum = (
        hist.withColumn("_cum", F.sum("_c").over(wcum))
        .withColumn("_n", F.sum("_c").over(wall))
    )
    pcol = F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p")
    idx = F.floor(F.col("p") * (F.col("_n") - 1))
    return (
        cum.select(*keys, "_v", "_c", "_cum", "_n", pcol)
        .filter((idx >= F.col("_cum") - F.col("_c")) & (idx < F.col("_cum")))
        .select(
            *keys,
            F.col("p"),
            F.col("_v").alias("value"),
            F.col("_n").cast("long").alias("n"),
        )
    )
