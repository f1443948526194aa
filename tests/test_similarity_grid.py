"""ANN + analytics-grid operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.analytics import grid
from web_crawler_spark.operators import similarity as SIM


def _vecs(spark, n=40, dim=8):
    import math

    rows = []
    for i in range(n):
        v = [math.sin(i * 0.7 + j) for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_self_is_rank1(spark):
    df = _vecs(spark)
    q = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    top = SIM.brute_force_topk(df, q, k=3, query_id_col="query_id")
    r1 = {r["query_id"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()}
    assert r1 == {0: 0, 1: 1, 2: 2}


def test_lsh_topk_contains_self_and_subset_of_probed(spark):
    df = _vecs(spark)
    q = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    top = SIM.lsh_topk(df, q, k=3, n_bits=4, probe_hamming=1, query_id_col="query_id")
    rows = top.collect()
    assert rows
    r1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1, 2: 2}  # self bucket always probed → rank 1 = self


def test_ivf_topk_self_rank1_partition_and_recall(spark):
    df = _vecs(spark)
    q = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    top = SIM.ivf_topk(df, q, k=3, n_centroids=4, nprobe=2, query_id_col="query_id")
    rows = top.collect()
    # self is in the query's own (probed-first) list → rank 1 = self
    r1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1, 2: 2}
    # every query returns exactly k results (probed lists hold ≥ k rows here)
    from collections import Counter

    assert Counter(r["query_id"] for r in rows) == {0: 3, 1: 3, 2: 3}
    # nprobe = n_centroids degenerates to exact search: recall@3 == 1
    full = SIM.ivf_topk(df, q, k=3, n_centroids=4, nprobe=4, query_id_col="query_id")
    brute = SIM.brute_force_topk(df, q, k=3, query_id_col="query_id")
    got = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    want = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    assert got == want
    # deterministic: same input → same rows
    again = {(r["query_id"], r["vec_id"], r["rank"]) for r in
             SIM.ivf_topk(df, q, k=3, n_centroids=4, nprobe=2,
                          query_id_col="query_id").collect()}
    assert again == {(r["query_id"], r["vec_id"], r["rank"]) for r in rows}


def test_ivf_codebook_scales_to_1024_centroids(spark):
    """The codebook rides as DATA (one broadcast row), so the analyzed
    plan is O(1) in n_centroids — the old literal-array form inlined
    n_centroids × dim literals per scoring site and stopped compiling at
    realistic codebook sizes."""
    df = _vecs(spark, n=1200, dim=8)
    q = df.filter(F.col("vec_id") < 2).withColumnRenamed("vec_id", "query_id")
    top = SIM.ivf_topk(df, q, k=3, n_centroids=1024, nprobe=2, query_id_col="query_id")
    # the plan text must not grow with the codebook: no inlined centroid
    # literal arrays (a 1024×8 literal codebook would dwarf this bound)
    plan = top._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 50_000, len(plan)
    rows = top.collect()
    r1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1}  # self list probed first → rank 1 = self


def test_ivf_hash_seeding_balances_clustered_ids(spark):
    """Clustered fixture: ids 0..99 are one tight cluster, 100..399 are
    three other clusters. First-N seeding puts every centroid inside
    cluster 0, so the other 300 vectors funnel into whichever of those
    centroids is least-far — badly skewed inverted lists. Hash-spread
    seeding samples the whole corpus and must cut the max list size."""
    import math

    rows = []
    for i in range(400):
        cl = 0 if i < 100 else 1 + (i - 100) // 100  # ids 0-99 all cluster 0
        base = [math.sin(cl * 2.1 + j) for j in range(8)]
        rows.append((i, [b + 0.001 * math.sin(i + j) for j, b in enumerate(base)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def max_list(strategy):
        cb = SIM.ivf_codebook(df, n_centroids=8, seed_strategy=strategy)
        sizes = (
            SIM.ivf_assign(df, cb)
            .groupBy("list_id")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        return sizes

    first_max = max_list("first")
    hash_max = max_list("hash")
    # first-N: all 8 centroids in cluster 0 → ≥1 list absorbs ~a whole
    # foreign cluster (≥100 rows). hash spread: centroids land across
    # clusters → max list bounded by ~one cluster + slack.
    assert first_max >= 100, first_max
    assert hash_max < first_max, (hash_max, first_max)


def test_ivf_train_codebook_reduces_distortion(spark):
    """Lloyd refinement must not worsen the quantizer: mean (1 - cosine)
    to the assigned centroid decreases (or holds) after training, and the
    trained codebook drops into ivf_topk as data."""
    import math

    rows = []
    for i in range(300):
        cl = i % 3
        base = [math.cos(cl * 2.0 + j) for j in range(6)]
        rows.append((i, [b + 0.01 * math.sin(7 * i + j) for j, b in enumerate(base)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seeded = SIM.ivf_codebook(df, n_centroids=3)
    trained = SIM.ivf_train_codebook(df, n_centroids=3, iters=3)
    d0 = SIM.ivf_distortion(df, seeded)
    d1 = SIM.ivf_distortion(df, trained)
    assert d1 <= d0 + 1e-12, (d0, d1)

    q = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    top = SIM.ivf_topk(df, q, k=3, nprobe=1, codebook=trained, query_id_col="query_id")
    r1 = {r["query_id"]: r["vec_id"] for r in top.collect() if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1, 2: 2}  # self still rank 1 in its own list


def test_grid_pipeline(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i % 7) if i % 5 else None) for i in range(30)],
        "id long, name string, score double",
    )
    # contains filter
    f = grid.contains_filter(df, {"name": "AME1"})  # case-insensitive
    assert f.count() == 11  # name1, name10..name19
    # sort nulls last
    s = grid.sort_view(df, "score", ascending=True).collect()
    assert s[-1]["score"] is None
    # paginate
    p = grid.paginate(grid.sort_view(df, "id"), page=2, size=10).collect()
    assert [r["id"] for r in p] == list(range(10, 20))
    # keyset page equals offset page on unique key
    kp = grid.keyset_page(df, "id", after=9, size=10).collect()
    assert [r["id"] for r in kp] == list(range(10, 20))
    # range filter
    assert grid.range_filter(df, "score", "2-4").count() == sum(
        1 for i in range(30) if i % 5 and 2 <= i % 7 <= 4
    )


def test_autocomplete_suggestions(spark):
    """useAutocomplete.js:11-15 semantics: case-insensitive CONTAINS (not
    prefix) over distinct option values; blank input -> no suggestions."""
    df = spark.createDataFrame(
        [("BUILDING",), ("HOUSEHOLD",), ("MACHINERY",), ("AUTOMOBILE",),
         ("BUILDING",), ("FURNITURE",)],
        "seg string",
    )
    got = [r["suggestion"] for r in grid.autocomplete(df, "seg", "ld").collect()]
    assert got == ["BUILDING", "HOUSEHOLD"]  # mid-word match, deduped, sorted
    # input case is irrelevant both ways
    assert [r["suggestion"] for r in grid.autocomplete(df, "seg", "LD").collect()] == got
    # blank / whitespace input -> empty (the hook's trim() gate)
    assert grid.autocomplete(df, "seg", "").count() == 0
    assert grid.autocomplete(df, "seg", "   ").count() == 0
    # top-N cap
    assert grid.autocomplete(df, "seg", "U", limit=2).count() == 2


# -------------------------------------------------- J3 reverse geocode -----
def test_reverse_geocode_cascade_and_none(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.plans import enrich as EN

    pts = spark.createDataFrame(
        [(1, 12.3456, -70.1234), (2, 12.3456, -70.1234), (3, None, None)],
        "id long, latitude double, longitude double",
    )
    out = {r["id"]: r for r in EN.reverse_geocode(pts).collect()}
    # identical cells resolve identically (the dim IS the response cache)
    assert out[1]["formatted_address"] == out[2]["formatted_address"]
    assert out[1]["rgeo_provider"] == out[2]["rgeo_provider"]
    assert out[1]["rgeo_provider"] in ("google", "nominatim", "none")
    if out[1]["rgeo_provider"] == "google":
        assert out[1]["formatted_address"].endswith(", USA")
    # null coordinates -> provider 'none', null address (reference
    # returns null on total miss)
    assert out[3]["rgeo_provider"] == "none"
    assert out[3]["formatted_address"] is None


def test_reverse_geocode_plan_is_broadcast(spark):
    from web_crawler_spark.plans import enrich as EN

    pts = spark.range(100).selectExpr(
        "id", "cast(id % 90 as double) - 45.0 as latitude",
        "cast(id % 180 as double) - 90.0 as longitude",
    )
    plan = EN.reverse_geocode(pts)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_place_details_hit_and_miss_defaults(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.plans import enrich as EN

    places = spark.range(200).select(
        F.col("id"),
        F.concat(F.lit("plc"), F.col("id")).alias("place_id"),
    )
    rows = EN.place_details(places).collect()
    hits = [r for r in rows if r["pd_hit"]]
    misses = [r for r in rows if not r["pd_hit"]]
    # ~85% coverage, deterministic; misses keep the reference's
    # empty-string defaults (rating '' -> NULL)
    assert len(hits) > len(misses) > 0
    for r in misses:
        assert (r["pd_phone"], r["pd_website"], r["pd_hours"],
                r["pd_types"]) == ("", "", "", "")
        assert r["pd_rating"] is None
    h = hits[0]
    assert h["pd_phone"].startswith("(") and "555-" in h["pd_phone"]
    assert h["pd_website"].startswith("https://www.place")
    assert h["pd_hours"].endswith("Saturday: Closed")
    assert 2.5 <= h["pd_rating"] <= 4.5
    assert h["pd_types"].endswith(",establishment")


def test_pair_cosine_gate_semantics_and_plan(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from web_crawler_spark.operators import similarity as SIM

    # aligned pair (same direction), anti-aligned pair, orthogonal pair
    rows = [
        (1, [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]),   # cos 1.0
        (2, [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),  # cos -1.0
        (3, [1.0, 0.0, 0.0], [0.0, 5.0, 0.0]),   # cos 0.0
        (4, [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),   # cos ~0.7071
    ]
    left = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "pair_id long, embedding array<float>"
    )
    right = spark.createDataFrame(
        [(r[0], r[2]) for r in rows], "pair_id long, embedding array<float>"
    )
    kept = {r["pair_id"]: r["cosine"]
            for r in SIM.pair_cosine_gate(left, right, threshold=0.5).collect()}
    assert set(kept) == {1, 4}
    assert abs(kept[4] - 0.707107) < 1e-6

    flags = SIM.pair_cosine_gate(left, right, threshold=0.5, keep_all=True)
    assert flags.count() == 4
    assert flags.filter("pair_keep").count() == 2

    # scale shape: equi-join on the pair key, no broadcast of a big side,
    # no cartesian
    plan = SIM.pair_cosine_gate(left, right)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_lsh_probe_radius_widens_candidate_set(spark):
    """probe_hamming must actually widen the probe: recall against brute
    force is monotone in the radius, and at radius n_bits every bucket is
    probed so LSH equals brute force exactly."""
    df = _vecs(spark, n=60)
    q = df.filter(F.col("vec_id") % 7 == 0).withColumnRenamed("vec_id", "query_id")

    def ids(res):
        return {(r["query_id"], r["vec_id"]) for r in res.collect()}

    truth = ids(SIM.brute_force_topk(df, q, k=3, query_id_col="query_id"))
    got = {
        ph: ids(SIM.lsh_topk(df, q, k=3, n_bits=6, probe_hamming=ph))
        for ph in (1, 2, 6)
    }
    r = {ph: len(truth & g) / len(truth) for ph, g in got.items()}
    assert r[1] <= r[2] <= r[6]
    assert got[6] == truth  # full-radius probe degenerates to exact


def _py_bm25(docs, terms, k1=1.2, b=0.75, log_idf=False):
    """Single-threaded textbook reference of bm25_scores."""
    import math

    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    ls = sum(len(v) for v in toks.values())
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            idf = (n - df + 0.5) / (df + 0.5)
            if log_idf:
                idf = math.log(1.0 + idf)
            tf = float(tk.count(term))
            s += idf * ((tf * (k1 + 1.0))
                        / (tf + (k1 * (1.0 - b))
                           + ((k1 * b) * ((len(tk) * n) / ls))))
        out[i] = s
    return out


def test_bm25_matches_python_reference_bitwise(spark):
    docs = [
        (1, "spark merge table scan scan"),
        (2, "table table table join"),
        (3, "window stream batch merge"),
        (4, "completely unrelated words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in SIM.bm25_scores(df, ["table", "scan", "merge"]).collect()
    }
    want = _py_bm25(docs, ["table", "scan", "merge"])
    assert got == want  # bit-exact: IEEE +-*/ in identical order


def test_bm25_ranking_and_log_variant(spark):
    docs = [
        (1, "scan scan scan scan"),
        (2, "scan merge idle idle"),
        (3, "idle idle idle idle"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    raw = {r["doc_id"]: r["bm25"]
           for r in SIM.bm25_scores(df, ["scan"]).collect()}
    assert raw[1] > raw[2] > raw[3] == 0.0
    logd = {r["doc_id"]: r["bm25"]
            for r in SIM.bm25_scores(df, ["scan"], log_idf=True).collect()}
    want = _py_bm25(docs, ["scan"], log_idf=True)
    for k in want:  # libm-backed: close, and rank-preserving
        assert abs(logd[k] - want[k]) < 1e-12
    assert sorted(raw, key=raw.get) == sorted(logd, key=logd.get)


def test_inverted_index_postings_and_stats(spark):
    docs = [
        (1, "spark merge table scan scan"),
        (2, "table table table join"),
        (3, "window stream batch merge"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    postings, tstats, cstats = SIM.build_inverted_index(df)
    p = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in postings.collect()}
    assert p[("scan", 1)] == (2, 5)
    assert p[("table", 2)] == (3, 4)
    assert p[("merge", 3)] == (1, 4)
    assert ("scan", 2) not in p
    ts = {r["term"]: r["df"] for r in tstats.collect()}
    assert ts["table"] == 2 and ts["merge"] == 2 and ts["join"] == 1
    cs = cstats.collect()[0]
    assert (cs["n"], cs["total_len"]) == (3, 13)


def test_bm25_indexed_bitwise_equals_scan_on_matching_docs(spark):
    docs = [
        (1, "spark merge table scan scan"),
        (2, "table table table join"),
        (3, "window stream batch merge"),
        (4, "completely unrelated words here"),
    ]
    terms = ["table", "scan", "merge"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scan = {r["doc_id"]: r["bm25"] for r in SIM.bm25_scores(df, terms).collect()}
    postings, tstats, cstats = SIM.build_inverted_index(df)
    cs = cstats.collect()[0]
    idx = {
        r["doc_id"]: r["bm25"]
        for r in SIM.bm25_scores_indexed(
            postings, tstats, cs["n"], cs["total_len"], terms
        ).collect()
    }
    # candidates = docs containing >= 1 term; doc 4 is index-invisible
    assert set(idx) == {1, 2, 3}
    for k in idx:  # bit-exact, not approx: same literals, same op order
        assert idx[k] == scan[k]
    # a term absent from the corpus changes nothing (df=0 slot scores 0)
    idx2 = {
        r["doc_id"]: r["bm25"]
        for r in SIM.bm25_scores_indexed(
            postings, tstats, cs["n"], cs["total_len"], terms + ["zzz"]
        ).collect()
    }
    assert idx2 == idx


def test_inverted_index_partition_prune_on_term(spark, tmp_path):
    """The 100 TB serving shape: postings written partitioned by term,
    a query's term IN (...) filter becomes a partition prune — the scan
    reads only the query's posting lists."""
    docs = [(i, f"alpha w{i % 7} beta") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    postings, _, _ = SIM.build_inverted_index(df)
    path = str(tmp_path / "postings")
    postings.write.partitionBy("term").parquet(path)
    back = spark.read.parquet(path).filter(F.col("term").isin(["alpha", "w3"]))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "term" in plan.split(
        "PartitionFilters:"
    )[1][:200]
    assert back.count() == 40 + sum(1 for i in range(40) if i % 7 == 3)


def _pq_py_reference(rows, m=4, k=8):
    """Single-threaded reference of pq_codebooks + pq_encode: per-subspace
    hash-seeded codebooks, micro-unit L2^2, argmin with low-j ties."""
    import hashlib
    import math

    dim = len(next(iter(rows.values())))
    sub = dim // m

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def dm(a, b):
        t = 0.0
        for x, y in zip(a, b):
            t = t + (x - y) * (x - y)
        return math.floor(t * 1000000.0 + 0.5)

    books = []
    for s in range(m):
        ids = sorted(rows, key=lambda i: (md5(f"pq{s}|{i}"), i))[:k]
        books.append([rows[i][s * sub:(s + 1) * sub] for i in ids])

    def code(v):
        return [
            min((dm(v[s * sub:(s + 1) * sub], c), j)
                for j, c in enumerate(books[s]))[1]
            for s in range(m)
        ]

    def adc(qv, cv_code):
        return sum(
            dm(qv[s * sub:(s + 1) * sub], books[s][cv_code[s]])
            for s in range(m)
        )

    return books, code, adc


def test_pq_encode_matches_python_reference(spark):
    import random

    rnd = random.Random(7)
    rows = {i: [rnd.uniform(-1, 1) for _ in range(32)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in rows.items()], "vec_id long, embedding array<double>"
    )
    cb = SIM.pq_codebooks(df, m=4, k=8)
    got = {r["vec_id"]: list(r["pq_code"]) for r in SIM.pq_encode(df, cb).collect()}
    _, code, _ = _pq_py_reference(rows, m=4, k=8)
    assert got == {i: code(v) for i, v in rows.items()}
    assert all(len(c) == 4 and max(c) < 8 and min(c) >= 0 for c in got.values())


def test_pq_topk_adc_exact_and_self_retrieval(spark):
    import random

    rnd = random.Random(11)
    rows = {i: [rnd.uniform(-1, 1) for _ in range(32)] for i in range(80)}
    df = spark.createDataFrame(
        [(i, v) for i, v in rows.items()], "vec_id long, embedding array<double>"
    )
    q = df.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    got = SIM.pq_topk(df, q, k=3, m=4, n_centroids=8).collect()
    _, code, adc = _pq_py_reference(rows, m=4, k=8)
    codes = {i: code(v) for i, v in rows.items()}
    for r in got:  # score must be the exact negated micro-unit ADC sum
        want = -(adc(rows[r["query_id"]], codes[r["vec_id"]]) / 1000000.0)
        assert r["score"] == want
    # ADC(q, q) uses q's own code: q is always in its own cell, so the
    # self pair carries the minimal quantization distance — rank 1 unless
    # another vector shares the identical code at lower distance
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    top1 = {qid: min(v)[1] for qid, v in by_q.items()}
    assert sum(1 for qid in top1 if top1[qid] == qid) >= 4


def test_pq_codebooks_reject_indivisible_dim(spark):
    df = spark.createDataFrame([(1, [0.0] * 30)], "vec_id long, embedding array<double>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        SIM.pq_codebooks(df, m=4, k=2)


def test_pq_train_codebooks_reduces_distortion_and_plugs_in(spark):
    import random

    rnd = random.Random(3)
    # clustered corpus: 4 centers + small jitter — structure Lloyd can learn
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = [
        (i, [c + rnd.uniform(-0.05, 0.05) for c in centers[i % 4]])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seed_cb = SIM.pq_codebooks(df, m=2, k=4)
    trained = SIM.pq_train_codebooks(df, m=2, k=4, iters=3)
    d0 = SIM.pq_distortion(df, seed_cb)
    d3 = SIM.pq_distortion(df, trained)
    assert d3 <= d0  # Lloyd never increases the objective
    assert d3 < 0.9 * d0  # and on clustered data it clearly earns its keep
    # trained books drop into the serving path unchanged
    q = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    got = SIM.pq_topk(df, q, k=3, m=2, codebooks=trained).collect()
    assert len(got) == 9
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    # codebook shape survives training: every code index < k
    codes = SIM.pq_encode(df, trained).collect()
    assert all(len(r["pq_code"]) == 2 and max(r["pq_code"]) < 4 for r in codes)


def test_ivfadc_candidates_confined_to_probed_lists(spark):
    import random

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4).withColumnRenamed("vec_id", "query_id")

    cb = SIM.ivf_codebook(df, n_centroids=4)
    got = SIM.ivfadc_topk(df, q, k=50, n_centroids=4, nprobe=1, m=2, pq_k=4,
                          codebook=cb).collect()
    # every returned candidate must live in the query's single probed list
    assign = {r["vec_id"]: r["list_id"]
              for r in SIM.ivf_assign(df, cb).collect()}
    qlist = {r["vec_id"]: assign[r["vec_id"]]
             for r in df.filter(F.col("vec_id") < 4).collect()}
    # a query's own nearest list == its assignment list (it is a corpus row)
    for r in got:
        assert assign[r["vec_id"]] == qlist[r["query_id"]]
    # ranks are contiguous from 1 per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivfadc_full_probe_covers_corpus_and_trained_books_plug_in(spark):
    import random

    rnd = random.Random(12)
    centers = [[rnd.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = [(i, [c + rnd.uniform(-0.1, 0.1) for c in centers[i % 3]])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2).withColumnRenamed("vec_id", "query_id")

    # nprobe == n_centroids → candidate set is the whole corpus
    got = SIM.ivfadc_topk(df, q, k=60, n_centroids=3, nprobe=3, m=2, pq_k=4)
    counts = {r["query_id"]: 0 for r in got.collect()}
    for r in got.collect():
        counts[r["query_id"]] += 1
    assert all(c == 60 for c in counts.values())

    # Lloyd-trained coarse + residual PQ books drop in as data
    cb = SIM.ivf_train_codebook(df, n_centroids=3, iters=2)
    res = SIM.ivfadc_residuals(df, cb)
    pcb = SIM.pq_train_codebooks(res, m=2, k=4, iters=2, vec_col="_rv")
    trained = SIM.ivfadc_topk(df, q, k=5, n_centroids=3, nprobe=2, m=2,
                              pq_k=4, codebook=cb, codebooks=pcb).collect()
    assert len(trained) == 10
    assert all(r["rank"] <= 5 for r in trained)
