"""HLL / count-min sketch operators (operators/sketch.py).

Covers the properties that matter at frontier scale: estimate accuracy in
both HLL regimes, mergeability (union-of-sketches == sketch-of-union, the
incremental-crawl invariant), CMS one-sided error, and hot-key salting
actually flattening a skewed host distribution.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_crawler_spark.hashing import hash64_col
from web_crawler_spark.operators import sketch as SK


def _ids(spark, lo, hi, prefix="u"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("k")
    )


def _estimate(spark, df, col="k"):
    row = SK.hll_estimate(SK.hll_registers(df, col)).collect()[0]
    if row.est <= 2.5 * row.m and row.zero_registers > 0:
        return row, row.m * math.log(row.m / row.zero_registers)
    return row, row.est


def test_hll_accuracy_large_range(spark):
    # 50k distinct >> m=4096 registers: the raw estimator regime.
    # Standard error ~ 1.04/sqrt(m) = 1.6%; assert within 5%.
    row, est = _estimate(spark, _ids(spark, 0, 50_000))
    assert abs(est - 50_000) / 50_000 < 0.05
    assert row.zero_registers == 0


def test_hll_accuracy_small_range_linear_counting(spark):
    # 300 distinct << m: raw estimate is biased, linear counting isn't.
    row, est = _estimate(spark, _ids(spark, 0, 300))
    assert abs(est - 300) / 300 < 0.10
    assert row.occupied <= 300


def test_hll_duplicates_do_not_move_the_sketch(spark):
    one = SK.hll_registers(_ids(spark, 0, 1000), "k")
    dup = SK.hll_registers(
        _ids(spark, 0, 1000).unionByName(_ids(spark, 0, 1000)), "k"
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, dup.collect()))


def test_hll_merge_equals_sketch_of_union(spark):
    # The incremental-crawl property: yesterday's register table + today's
    # delta sketch == the sketch of the full history. Overlap included.
    a = SK.hll_registers(_ids(spark, 0, 2000), "k")
    b = SK.hll_registers(_ids(spark, 1500, 4000), "k")
    merged = SK.hll_merge(a, b)
    direct = SK.hll_registers(_ids(spark, 0, 4000), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_never_undercounts_and_is_tight_here(spark):
    # Zipf-ish key frequencies: key u{i} appears (i % 37) + 1 times.
    df = spark.range(0, 2000).select(
        F.concat(F.lit("u"), F.col("id") % 200).alias("k")
    )
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    cms = SK.cms_build(df, "k")
    keys = df.select("k").distinct()
    est = {r.k: r.cms_est for r in SK.cms_lookup(cms, keys, "k").collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # 200 keys into 4x512 cells: the min-counter should be exact for >=95%.
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits >= 0.95 * len(exact)


def test_cms_sketch_size_is_bounded(spark):
    df = _ids(spark, 0, 20_000)
    cms = SK.cms_build(df, "k")
    assert cms.count() <= SK.CMS_D * SK.CMS_W


def test_cms_merge_by_sum(spark):
    a, b = _ids(spark, 0, 500), _ids(spark, 200, 900)
    merged = (
        SK.cms_build(a, "k")
        .unionByName(SK.cms_build(b, "k"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = SK.cms_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hot_key_salts_flatten_skew(spark):
    # One hot host (6000 urls) among 50 cold hosts (20 urls each): without
    # salting the host-keyed fetch partitioning puts 6000 rows in one
    # shard; with CMS-driven salts no shard exceeds the budget + CMS slack.
    hot = spark.range(0, 6000).select(
        F.lit("hot.example").alias("host"),
        F.concat(F.lit("https://hot.example/p"), F.col("id")).alias("url"),
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("cold"), F.col("id") % 50, F.lit(".example")).alias("host"),
        F.concat(F.lit("https://cold/p"), F.col("id")).alias("url"),
    )
    urls = hot.unionByName(cold)
    cms = SK.cms_build(urls, "host")
    salts = SK.hot_key_salts(cms, urls.select("host").distinct(), "host",
                             per_salt_budget=500)
    srow = {r.host: r.n_salt for r in salts.collect()}
    assert srow["hot.example"] >= 12  # ceil(6000/500) = 12, CMS may round up
    assert all(v == 1 for h, v in srow.items() if h != "hot.example")

    sharded = urls.join(F.broadcast(salts), "host").select(
        "host", (F.pmod(hash64_col("url"), F.col("n_salt"))).alias("shard")
    )
    sizes = [
        r.n
        for r in sharded.groupBy("host", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(sizes) <= 550  # budget 500 + 10% hash-split imbalance slack


# --------------------------------------------------- exact quantiles -------
def test_exact_quantiles_matches_sorted_list_reference(spark):
    import math
    import random

    from web_crawler_spark.operators.sketch import exact_quantiles

    random.seed(11)
    rows = [("en" if i % 3 else "de", random.randint(1, 300)) for i in range(2000)]
    df = spark.createDataFrame(rows, "lang string, v int")
    probs = [0.0, 0.5, 0.9, 0.99, 1.0]
    got = {
        (r["lang"], r["p"]): (r["value"], r["n"])
        for r in exact_quantiles(df, "v", probs, by="lang").collect()
    }
    by: dict = {}
    for lang, v in rows:
        by.setdefault(lang, []).append(v)
    for lang, vs in by.items():
        vs.sort()
        for p in probs:
            exp = vs[math.floor(p * (len(vs) - 1))]
            assert got[(lang, p)] == (exp, len(vs)), (lang, p)


def test_exact_quantiles_ungrouped_and_degenerate(spark):
    from web_crawler_spark.operators.sketch import exact_quantiles

    one = spark.createDataFrame([(42,)], "v int")
    got = {r["p"]: r["value"]
           for r in exact_quantiles(one, "v", [0.0, 0.5, 1.0]).collect()}
    assert got == {0.0: 42, 0.5: 42, 1.0: 42}
    same = spark.createDataFrame([(7,)] * 50, "v int")
    got2 = exact_quantiles(same, "v", [0.25, 0.75]).collect()
    assert {r["value"] for r in got2} == {7}
    assert all(r["n"] == 50 for r in got2)


def test_hll_per_group_estimates_and_merge(spark):
    from web_crawler_spark.operators import sketch as SK

    rows = [("h1", f"u{i}") for i in range(800)] + \
           [("h2", f"u{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "host string, uid string")
    est = {
        r["host"]: r
        for r in SK.hll_estimate(
            SK.hll_registers(df, "uid", by="host"), by="host"
        ).collect()
    }
    # both groups sit in the small-range regime at 2^12 registers (n <<
    # 2.5m), so accuracy comes from linear counting over zero_registers —
    # exactly the correction the crawl_stats query applies
    import math

    for host, n_true in (("h1", 800), ("h2", 40)):
        z = est[host]["zero_registers"]
        lin = SK.HLL_M * math.log(SK.HLL_M / z)
        assert abs(lin - n_true) / n_true < 0.05, (host, lin)
    # groups are independent: h2's registers never inflate h1
    solo = SK.hll_estimate(
        SK.hll_registers(df.filter("host = 'h1'"), "uid")
    ).collect()[0]
    assert solo["est"] == est["h1"]["est"]
    # per-group merge of two half-sketches == sketch of the union
    a = SK.hll_registers(df.filter("uid < 'u4'"), "uid", by="host")
    b = SK.hll_registers(df.filter("uid >= 'u4'"), "uid", by="host")
    merged = {
        r["host"]: r["est"]
        for r in SK.hll_estimate(
            SK.hll_merge(a, b, by="host"), by="host"
        ).collect()
    }
    assert merged == {h: est[h]["est"] for h in est}


def test_hll_estimate_ignores_stray_columns_without_by(spark):
    # a lineage column riding on the register table must NOT silently
    # turn the global estimate into per-value partials
    from web_crawler_spark.operators import sketch as SK

    df = spark.createDataFrame([(f"u{i}",) for i in range(300)], "uid string")
    regs = SK.hll_registers(df, "uid").withColumn("stray", F.lit("x"))
    out = SK.hll_estimate(regs).collect()
    assert len(out) == 1
    clean = SK.hll_estimate(SK.hll_registers(df, "uid")).collect()[0]
    assert out[0]["est"] == clean["est"]


def test_exact_quantiles_excludes_nulls(spark):
    """NULLs must be excluded before the histogram (engines disagree on
    NULL window sort position — Spark first, DuckDB last — so a NULL
    bucket would skew running counts differently per engine): quantiles
    and n are those of the non-null multiset exactly."""
    from web_crawler_spark.operators.sketch import exact_quantiles

    rows = [(None if i % 4 == 0 else (i % 7) + 1,) for i in range(100)]
    df = spark.createDataFrame(rows, "v int")
    vals = sorted(v for (v,) in rows if v is not None)
    got = {r["p"]: (r["value"], r["n"])
           for r in exact_quantiles(df, "v", [0.0, 0.5, 1.0]).collect()}
    import math

    for p in (0.0, 0.5, 1.0):
        exp = vals[math.floor(p * (len(vals) - 1))]
        assert got[p] == (exp, len(vals)), p
