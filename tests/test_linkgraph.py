"""Link-graph operators: integer fixed-point host PageRank and the
bounded anchor-text rollup (operators/frontier.py).

PageRank's correctness contract is engine-exactness: the update is pure
integer multiply / integer-divide / sum, so a single-threaded Python
reference must reproduce Spark's result bit-for-bit on any graph and any
partitioning. The tests pin that, plus the qualitative authority
semantics (hubs outrank spokes) and mass accounting (leaky dangling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.operators import frontier as FR

SCALE = 10**12


def _py_pagerank(edges, iters=5, scale=SCALE, d=(85, 100)):
    """Single-threaded reference of host_pagerank's exact integer algebra."""
    d_num, d_den = d
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (d_den - d_num) * scale // (d_den * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for u, v in edges:
            nxt[v] += (d_num * r[u]) // (d_den * outdeg[u])
        r = nxt
    return r


def _edges_df(spark, edges, n_parts=1):
    df = spark.createDataFrame(edges, "src long, dst long")
    return df.repartition(n_parts) if n_parts > 1 else df


def test_pagerank_matches_integer_reference_exactly(spark):
    # ring + chords + a dangling sink: exercises in-degree skew, a
    # dangler (node 99 has no outlinks), and multi-edge-source nodes
    edges = [(i, (i + 1) % 10) for i in range(10)]
    edges += [(i, 7) for i in range(0, 10, 2)]
    edges += [(3, 99), (4, 99)]
    want = _py_pagerank(edges)
    got = {
        r["node"]: r["rank_int"]
        for r in FR.host_pagerank(_edges_df(spark, edges)).collect()
    }
    assert got == want  # bit-exact, including the dangler and hub


def test_pagerank_partitioning_invariant(spark):
    edges = [(i % 23, (i * 13 + 5) % 23) for i in range(300) if i % 23 != (i * 13 + 5) % 23]
    a = FR.host_pagerank(_edges_df(spark, edges, n_parts=1)).collect()
    b = FR.host_pagerank(_edges_df(spark, edges, n_parts=16)).collect()
    assert sorted((r["node"], r["rank_int"]) for r in a) == sorted(
        (r["node"], r["rank_int"]) for r in b
    )


def test_pagerank_star_hub_wins_and_dangler_leaks_mass(spark):
    # star: 20 spokes all point at hub 0, which has no outlinks — the
    # hub is simultaneously the authority and a dangler
    edges = [(i, 0) for i in range(1, 21)]
    df = FR.host_pagerank(_edges_df(spark, edges), iters=8)
    rows = {r["node"]: r["rank_int"] for r in df.collect()}
    assert max(rows, key=rows.get) == 0  # the hub is the authority
    assert rows[0] > 10 * max(v for k, v in rows.items() if k != 0)
    # leaky-dangling accounting: the hub's mass evaporates each
    # iteration, so total mass strictly shrinks below SCALE
    assert sum(rows.values()) < SCALE


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert FR.host_pagerank(empty).count() == 0


def test_anchor_text_normalizes_caps_and_counts_raw_links(spark):
    links = spark.createDataFrame(
        [
            ("https://a/", "Contact Us"),
            ("https://a/", " contact us "),  # same after trim+lower
            ("https://a/", "Visit"),
            ("https://a/", "About"),
            ("https://a/", "Our Offices"),
            ("https://a/", "More Info"),
            ("https://b/", "Visit"),
        ],
        "url string, anchor string",
    )
    out = {
        r["url"]: r
        for r in FR.aggregate_anchor_text(links, max_anchors=3).collect()
    }
    # n_links counts RAW inbound links; anchors are the 3 lexicographically
    # first of the 5 distinct normalized texts
    assert out["https://a/"]["n_links"] == 6
    assert out["https://a/"]["anchors"] == "about|contact us|more info"
    assert out["https://b/"]["n_links"] == 1
    assert out["https://b/"]["anchors"] == "visit"


def test_anchor_text_cap_bounds_hot_target_state(spark):
    # a hot target with 1000 distinct anchors never materializes more
    # than max_anchors of them
    links = spark.range(1000).select(
        F.lit("https://hot/").alias("url"),
        F.format_string("anchor-%04d", F.col("id").cast("int")).alias("anchor"),
    )
    row = FR.aggregate_anchor_text(links, max_anchors=16).collect()[0]
    assert row["n_links"] == 1000
    assert row["anchors"].split("|") == [f"anchor-{i:04d}" for i in range(16)]


def test_recrawl_priority_change_rate_and_due(spark):
    M = 1_000_000  # seconds → micros
    visits = spark.createDataFrame(
        [
            # hot URL: changes on both revisits
            ("https://hot/", 0 * M, "v1"),
            ("https://hot/", 100 * M, "v2"),
            ("https://hot/", 200 * M, "v3"),
            # warm URL: one change in two revisits
            ("https://warm/", 0 * M, "a"),
            ("https://warm/", 100 * M, "b"),
            ("https://warm/", 200 * M, "b"),
            # frozen URL: never changes
            ("https://cold/", 0 * M, "same"),
            ("https://cold/", 200 * M, "same"),
            # seen once
            ("https://new/", 200 * M, "x"),
        ],
        "url string, ts long, fp string",
    )
    now = 500 * M
    out = {r["url"]: r for r in FR.recrawl_priority(visits, now=now).collect()}

    hot, warm, cold, new = (out[f"https://{k}/"] for k in ("hot", "warm", "cold", "new"))
    assert (hot["n_visits"], hot["n_changes"]) == (3, 2)
    assert hot["next_due"] == 200 * M + (200 * M) // 2  # last + span/changes
    assert hot["priority"] == (300 * M * 3) // 201      # stale_s*scale*(c+1) // (span_s+1)
    assert hot["due"]  # 500s >= 300s

    assert (warm["n_visits"], warm["n_changes"]) == (3, 1)
    assert warm["next_due"] == 400 * M and warm["due"]

    assert cold["n_changes"] == 0
    assert cold["next_due"] == 400 * M  # changes floor to 1: last + span
    assert new["n_visits"] == 1 and new["next_due"] == 200 * M and new["due"]

    # the change-rate ordering: more observed changes at equal staleness
    # means strictly higher priority
    assert hot["priority"] > warm["priority"] > cold["priority"]


def test_recrawl_priority_ignores_visit_row_order(spark):
    rows = [(f"https://u{i % 7}/", (i * 37 % 50) * 1_000_000, f"f{i % 3}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "url string, ts long, fp string")
    a = FR.recrawl_priority(df, now=10**8).collect()
    b = FR.recrawl_priority(df.repartition(16).orderBy(F.rand(7)), now=10**8).collect()
    key = lambda r: tuple(r)
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_detect_url_traps_flags_template_explosion(spark):
    rows = (
        # trap host: 60 distinct calendar URLs, one template
        [(f"https://trap.example.com/cal/2024/{i}?sid={i}",) for i in range(60)]
        # healthy host: 30 URLs over 30 letter-pair templates
        + [(f"https://ok.example.com/{chr(97 + i % 26)}{chr(97 + i // 26)}",)
           for i in range(30)]
        # small host: few URLs, below min_urls even though one template
        + [(f"https://tiny.example.com/p/{i}",) for i in range(5)]
    )
    urls = spark.createDataFrame(rows, "url string")
    out = {r["host"]: r for r in FR.detect_url_traps(urls, min_urls=20).collect()}
    trap = out["trap.example.com"]
    assert trap["is_trap"]
    assert (trap["n_urls"], trap["n_templates"]) == (60, 1)
    assert trap["top_template"] == "trap.example.com/cal/N/N?sid=V"
    assert trap["top_template_urls"] == 60
    assert not out["ok.example.com"]["is_trap"]
    assert not out["tiny.example.com"]["is_trap"]  # min_urls gate


def test_detect_url_traps_dedups_urls_and_normalizes_queries(spark):
    # the same URL repeated 100x is ONE distinct URL, and multi-param
    # query values all collapse to =V
    rows = [("https://h.example.com/a/1?x=9&y=zz",)] * 100 + [
        (f"https://h.example.com/a/{i}?x={i}&y=k{i}",) for i in range(2, 30)
    ]
    urls = spark.createDataFrame(rows, "url string")
    row = FR.detect_url_traps(urls, min_urls=20).collect()[0]
    assert row["n_urls"] == 29 and row["n_templates"] == 1
    assert row["top_template"] == "h.example.com/a/N?x=V&y=V"
    assert row["is_trap"]


def _py_hits(edges, iters=3, scale=10**6):
    """Single-threaded reference of host_hits' exact integer algebra."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {v: scale for v in nodes}

    def half(scores, flip):
        raw = {v: 0 for v in nodes}
        for u, v in edges:
            if flip:
                raw[u] += scores[v]
            else:
                raw[v] += scores[u]
        t = max(sum(raw.values()), 1)
        return {v: (raw[v] * scale) // t for v in nodes}

    a = None
    for _ in range(iters):
        a = half(h, flip=False)
        h = half(a, flip=True)
    return h, a


def test_hits_matches_integer_reference_exactly(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)]
    edges += [(i, 7) for i in range(0, 10, 2)]
    edges += [(3, 99), (4, 99)]
    want_h, want_a = _py_hits(edges)
    rows = FR.host_hits(_edges_df(spark, edges)).collect()
    assert {r["node"]: r["hub_int"] for r in rows} == want_h
    assert {r["node"]: r["auth_int"] for r in rows} == want_a


def test_hits_star_separates_hubs_from_authorities(spark):
    # spokes 1..20 all point at node 0: node 0 is the pure authority,
    # every spoke a pure hub — the role separation PageRank cannot express
    edges = [(i, 0) for i in range(1, 21)]
    rows = {r["node"]: r for r in FR.host_hits(_edges_df(spark, edges)).collect()}
    assert rows[0]["auth_int"] > 0 and rows[0]["hub_int"] == 0
    for i in range(1, 21):
        assert rows[i]["auth_int"] == 0 and rows[i]["hub_int"] > 0


# ---------------------------------------------------------------------------
# resolve_redirects
# ---------------------------------------------------------------------------


def _resolve(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges or [(None, None)], "src long, dst long")
    if not edges:
        edf = edf.filter(F.lit(False))
    out = FR.resolve_redirects(ndf, edf, **kw).collect()
    return {r["node"]: (r["final"], r["n_hops"], r["is_loop"]) for r in out}


def test_resolve_redirects_chain_terminal_and_hops(spark):
    # 1 → 2 → 3 → 4 (terminal); 9 never redirects
    got = _resolve(spark, [1, 2, 3, 4, 9], [(1, 2), (2, 3), (3, 4)])
    assert got[1] == (4, 3, False)
    assert got[2] == (4, 2, False)
    assert got[3] == (4, 1, False)
    assert got[4] == (4, 0, False)
    assert got[9] == (9, 0, False)


def test_resolve_redirects_flags_cycles_and_feeders(spark):
    # 5 ↔ 6 two-cycle; 7 → 5 feeds it; 8 → 9 resolves normally
    got = _resolve(spark, [5, 6, 7, 8, 9], [(5, 6), (6, 5), (7, 5), (8, 9)])
    assert got[5] == (None, None, True)
    assert got[6] == (None, None, True)
    assert got[7] == (None, None, True)
    assert got[8] == (9, 1, False)


def test_resolve_redirects_self_loop_and_long_chain_cap(spark):
    # 0 → 0 self-redirect; a 12-hop chain exceeds max_hops=8 → loop-flagged
    chain = [(i, i + 1) for i in range(10, 22)]
    got = _resolve(spark, [0, 10, 15, 22], [(0, 0)] + chain, max_hops=8)
    assert got[0] == (None, None, True)
    assert got[10] == (None, None, True)       # 12 hops > max_hops
    assert got[15] == (22, 7, False)           # within the cap
    assert got[22] == (22, 0, False)
    # widening the cap resolves the long chain with the true hop count
    wide = _resolve(spark, [10], chain, max_hops=16)
    assert wide[10] == (22, 12, False)


def test_resolve_redirects_resolves_target_outside_node_universe(spark):
    # edge target 99 is not in `nodes`: still a valid terminal
    got = _resolve(spark, [1], [(1, 99)])
    assert got[1] == (99, 1, False)


def test_detect_mirror_hosts_pairs_and_jaccard(spark):
    from web_crawler_spark.operators.frontier import detect_mirror_hosts

    rows = []
    # A and B serve identical 4-page sets; C serves half of A's pages
    for f in ["f1", "f2", "f3", "f4"]:
        rows += [("hostA", f), ("hostB", f)]
    rows += [("hostC", "f1"), ("hostC", "f2")]
    # D overlaps A on a single page only -> below min_shared
    rows += [("hostD", "f1"), ("hostD", "x1"), ("hostD", "x2")]
    # duplicate (host, fp) observations must not inflate shared counts
    rows += [("hostA", "f1"), ("hostB", "f2")]
    df = spark.createDataFrame(rows, "host string, fp string")
    got = {
        (r["host_a"], r["host_b"]): r
        for r in detect_mirror_hosts(df, min_shared=2).collect()
    }
    assert set(got) == {("hostA", "hostB"), ("hostA", "hostC"),
                        ("hostB", "hostC")}
    ab = got[("hostA", "hostB")]
    assert (ab["shared"], ab["jaccard_micro"], ab["is_mirror"]) == (
        4, 1_000_000, True)
    ac = got[("hostA", "hostC")]
    # 2 / (4 + 2 - 2) = 0.5 exactly, at the default decision threshold
    assert (ac["shared"], ac["jaccard_micro"], ac["is_mirror"]) == (
        2, 500_000, True)


def test_detect_mirror_hosts_caps_boilerplate_fingerprints(spark):
    from web_crawler_spark.operators.frontier import detect_mirror_hosts

    # 40 hosts all serving the same parking page + one real mirror pair
    rows = [(f"h{i:02d}", "parking") for i in range(40)]
    rows += [("h00", "p1"), ("h00", "p2"), ("h01", "p1"), ("h01", "p2")]
    df = spark.createDataFrame(rows, "host string, fp string")
    got = detect_mirror_hosts(df, max_fp_hosts=10, min_shared=2).collect()
    # the parking fp (df=40 > 10) is dropped pre-join: exactly one pair,
    # whose sizes still count the parking page (3 and 3, shared 2)
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"], r["shared"]) == ("h00", "h01", 2)
    assert r["jaccard_micro"] == 2 * 1_000_000 // (3 + 3 - 2)


def _dust_pages(spark):
    # session / ref are content-irrelevant on site-a; page is load-bearing.
    rows = []
    for i in range(4):
        base = f"https://site-a.example.com/p{i}"
        fp = f"fp{i}"
        rows += [
            (base, fp),
            (f"{base}?session=s{i}", fp),
            (f"{base}?ref=mail&session=s{i}", fp),
            (f"{base}?ref=mail", fp),
        ]
    # page changes the content -> counterexample for (site-a, page)
    rows += [("https://site-a.example.com/p0?page=2", "fp0-page2")]
    # a different host must learn its own rules
    rows += [("https://site-b.example.com/q?session=z", "bq"),
             ("https://site-b.example.com/q", "bq")]
    return spark.createDataFrame(rows, "url string, fp string")


def test_mine_param_rules_supports_and_counterexamples(spark):
    from web_crawler_spark.operators.frontier import mine_param_rules

    got = {
        (r["host"], r["param"]): r
        for r in mine_param_rules(_dust_pages(spark), min_support=3).collect()
    }
    sa = got[("site-a.example.com", "session")]
    # ?session=si -> base (4 hits) and ?ref&session -> ?ref (4 hits)
    assert (sa["support"], sa["counterexamples"], sa["is_rule"]) == (8, 0, True)
    ra = got[("site-a.example.com", "ref")]
    assert (ra["support"], ra["counterexamples"], ra["is_rule"]) == (8, 0, True)
    pg = got[("site-a.example.com", "page")]
    assert (pg["counterexamples"], pg["is_rule"]) == (1, False)
    sb = got[("site-b.example.com", "session")]
    # only one alias pair on site-b: below min_support even with 0 counters
    assert (sb["support"], sb["is_rule"]) == (1, False)


def test_apply_param_rules_rewrites_and_preserves(spark):
    from web_crawler_spark.operators.frontier import (
        apply_param_rules, mine_param_rules)

    pages = _dust_pages(spark)
    rules = mine_param_rules(pages, min_support=3)
    urls = spark.createDataFrame(
        [("https://site-a.example.com/p9?session=zz",),
         ("https://site-a.example.com/p9?ref=x&page=3&session=y",),
         ("https://site-a.example.com/p9?page=3",),
         ("https://site-a.example.com/p9",),
         # site-b learned no valid rule: untouched
         ("https://site-b.example.com/q?session=z",)],
        "url string")
    got = {r["url"]: r["canonical_url"]
           for r in apply_param_rules(urls, rules).collect()}
    assert got["https://site-a.example.com/p9?session=zz"] == \
        "https://site-a.example.com/p9"
    # load-bearing param survives, order preserved, rule params gone
    assert got["https://site-a.example.com/p9?ref=x&page=3&session=y"] == \
        "https://site-a.example.com/p9?page=3"
    assert got["https://site-a.example.com/p9?page=3"] == \
        "https://site-a.example.com/p9?page=3"
    assert got["https://site-a.example.com/p9"] == \
        "https://site-a.example.com/p9"
    assert got["https://site-b.example.com/q?session=z"] == \
        "https://site-b.example.com/q?session=z"


def _py_trustrank(edges, seeds, iters=5, scale=SCALE, d=(85, 100)):
    """Single-threaded reference of host_pagerank(trusted=...)."""
    d_num, d_den = d
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = sorted(set(seeds) & set(nodes))
    n = len(seeds)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (d_den - d_num) * scale // (d_den * n)
    r = {v: (scale // n if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        nxt = {v: (base if v in seeds else 0) for v in nodes}
        for u, v in edges:
            nxt[v] += (d_num * r[u]) // (d_den * outdeg[u])
        r = nxt
    return r


def test_trustrank_matches_reference_and_zeroes_unreachable(spark):
    # trusted chain 0->1->2 plus an island 10<->11 the seeds never reach
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10), (2, 3)]
    seeds = [0]
    want = _py_trustrank(edges, seeds)
    trusted = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["rank_int"]
        for r in FR.host_pagerank(_edges_df(spark, edges),
                                  trusted=trusted).collect()
    }
    assert got == want
    # spam island: no teleport mass, no trusted in-links -> exactly zero
    assert got[10] == 0 and got[11] == 0
    # trust flows along the chain
    assert got[0] > 0 and got[1] > 0 and got[2] > 0 and got[3] > 0


def test_trustrank_uniform_seed_set_equals_pagerank(spark):
    edges = [(i % 9, (i * 7 + 2) % 9) for i in range(40)
             if i % 9 != (i * 7 + 2) % 9]
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    trusted = spark.createDataFrame([(v,) for v in nodes], "node long")
    pr = FR.host_pagerank(_edges_df(spark, edges)).collect()
    tr = FR.host_pagerank(_edges_df(spark, edges), trusted=trusted).collect()
    assert sorted((r["node"], r["rank_int"]) for r in pr) == sorted(
        (r["node"], r["rank_int"]) for r in tr
    )


def _py_opic(edges, iters=5, scale=SCALE):
    """Single-threaded reference of host_opic's exact integer algebra
    (synchronized OPIC with virtual-page dangling recycling)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    cash = {v: scale // n for v in nodes}
    hist = {v: 0 for v in nodes}
    vc = 0
    for _ in range(iters):
        recv = {v: 0 for v in nodes}
        for u, v in edges:
            recv[v] += cash[u] // outdeg[u]
        nvc = sum(cash[u] for u in nodes if u not in outdeg)
        for u in nodes:
            hist[u] += cash[u]
            cash[u] = recv[u] + vc // n
        vc = nvc
    out = {v: (cash[v], hist[v]) for v in nodes}
    out[-1] = (vc, 0)  # the virtual page rides the state as node -1
    return out


def test_opic_matches_integer_reference_exactly(spark):
    # a cycle, a chord, and two dangling sinks (99, 7 has out-edges)
    edges = [(i, (i + 1) % 6) for i in range(6)]
    edges += [(0, 99), (3, 98), (2, 0), (98, 1)]  # 99 dangling, 98 not
    want = _py_opic(edges)
    for parts in (1, 7):
        got = {
            r["node"]: (r["cash_int"], r["hist_int"])
            for r in FR.host_opic(_edges_df(spark, edges, parts)).collect()
        }
        assert got == want


def test_opic_virtual_page_recycles_dangling_cash(spark):
    # star into a dangling sink: with a leaky scheme the sink's cash
    # would vanish; OPIC's virtual page must return it to circulation,
    # so total (cash + recycled vcash) stays within integer-div dust
    edges = [(i, 0) for i in range(1, 9)]
    rows = FR.host_opic(_edges_df(spark, edges), iters=6).collect()
    got = {r["node"]: (r["cash_int"], r["hist_int"]) for r in rows}
    assert got == _py_opic(edges, iters=6)
    # the spokes have no in-edges: after round 1 their only income is the
    # virtual page's uniform share — nonzero exactly because recycling works
    assert all(got[i][0] > 0 for i in range(1, 9))
    # history keeps the running importance: the hub banks every round
    assert got[0][1] > max(got[i][1] for i in range(1, 9))


def test_opic_importance_orders_like_pagerank_on_strong_graphs(spark):
    # on a strongly-connected, in-degree-skewed graph with no dangling
    # mass the two priors must agree on who the top authority is
    edges = [(i, (i + 1) % 6) for i in range(6)]
    edges += [(1, 0), (2, 0), (3, 0), (4, 0)]
    pr = {r["node"]: r["rank_int"]
          for r in FR.host_pagerank(_edges_df(spark, edges)).collect()}
    op = {r["node"]: r["cash_int"] + r["hist_int"]
          for r in FR.host_opic(_edges_df(spark, edges), iters=8).collect()}
    assert max(pr, key=pr.get) == max(op, key=op.get) == 0


def test_opic_state_resume_bitwise_equals_straight_run(spark):
    """On-line accumulation: iters=a then resume for iters=b must equal
    iters=a+b bit-for-bit — the virtual page's in-flight cash round-trips
    through the node -1 state row."""
    edges = [(i, (i + 1) % 6) for i in range(6)]
    edges += [(0, 99), (3, 98), (2, 0), (98, 1)]
    e = _edges_df(spark, edges)
    straight = {
        r["node"]: (r["cash_int"], r["hist_int"])
        for r in FR.host_opic(e, iters=5).collect()
    }
    resumed = {
        r["node"]: (r["cash_int"], r["hist_int"])
        for r in FR.host_opic(
            e, iters=2, state=FR.host_opic(e, iters=3)
        ).collect()
    }
    assert resumed == straight == _py_opic(edges, iters=5)
    # a node unknown to the state (newly discovered page) starts at zero
    # cash and is funded by in-edges + the virtual share
    grown = edges + [(1, 500)]
    out = {
        r["node"]: r
        for r in FR.host_opic(
            _edges_df(spark, grown), iters=1, state=FR.host_opic(e, iters=3)
        ).collect()
    }
    assert out[500]["hist_int"] == 0  # banked nothing before this round
    assert out[500]["cash_int"] > 0   # funded by 1's forwarded cash


def test_wat_edges_feed_host_pagerank(spark):
    """Composition: WAT outlink extraction → host-level edge list →
    integer-fixed-point PageRank. The public-archive bootstrap path for
    the frontier's authority prior, end-to-end: absolute links resolve
    to their host, relative links resolve against the source page's
    host, and the hub host every page links to outranks the leaves."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators import frontier as FR
    from web_crawler_spark.sources import warc as W

    def wat(page, links):
        body = (
            '{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": '
            '{"HTML-Metadata": {"Links": ['
            + ", ".join(f'{{"path": "A@/href", "url": "{u}"}}' for u in links)
            + "]}}}}}"
        )
        return (page, body)

    rows = [
        wat("https://a.example/1", ["https://hub.example/x", "/local"]),
        wat("https://b.example/1", ["https://hub.example/y"]),
        wat("https://c.example/1", ["https://hub.example/z",
                                    "https://a.example/2"]),
        wat("https://hub.example/1", ["https://a.example/3"]),
    ]
    df = spark.createDataFrame(rows, "target_uri string, body string")
    edges = W.wat_outlinks(df)
    host_of = lambda c: F.regexp_extract(c, r"https?://([^/]+)", 1)  # noqa: E731
    src_host = host_of(F.col("src"))
    dst_host = F.when(
        F.col("url").startswith("/"), src_host
    ).otherwise(host_of(F.col("url")))
    hedges = (
        edges.select(src_host.alias("src"), dst_host.alias("dst"))
        .filter(F.col("dst") != "")
        .filter(F.col("src") != F.col("dst"))  # /local self-edge drops
        .distinct()
    )
    # host_pagerank's contract is numeric node ids — hash the host dim
    # to ids and map back (what a production caller does with its host
    # dimension table)
    ids = (
        hedges.select(F.col("src").alias("host"))
        .union(hedges.select("dst"))
        .distinct()
        .select("host", F.xxhash64("host").alias("nid"))
    )
    idedges = (
        hedges.join(ids.withColumnRenamed("host", "src")
                    .withColumnRenamed("nid", "snid"), "src")
        .join(ids.withColumnRenamed("host", "dst")
              .withColumnRenamed("nid", "dnid"), "dst")
        .select(F.col("snid").alias("src"), F.col("dnid").alias("dst"))
    )
    ranks = FR.host_pagerank(idedges)
    pr = {
        r["host"]: r["rank_int"]
        for r in ranks.join(ids, ranks.node == ids.nid).collect()
    }
    assert pr["hub.example"] == max(pr.values())
    assert pr["hub.example"] > pr["b.example"]
