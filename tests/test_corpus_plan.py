"""The composed training-corpus build: all training-data operators
chained in release order (plans/corpus.py). Each operator has its own
oracled query; this suite checks they COMPOSE — schema in/out, drop
monotonicity, determinism, and the no-driver-loop shape."""
from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.plans import corpus as C

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_text_corpus_end_to_end(spark):
    docs = _docs(spark)
    evals = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)
    out = C.build_text_corpus(
        train, eval_docs=evals,
        mix_rates={"en": 0.8}, default_mix_rate=0.5,
    )
    rows = out.collect()
    assert rows, "pipeline kept nothing"
    assert out.columns == [
        "doc_id", "lang", "text_redacted", "n_tokens", "split",
        "pack_bucket", "pack_bin", "pack_offset",
    ]
    # gates really dropped something, and nothing leaked past them
    assert len(rows) < train.count()
    for r in rows[:50]:
        assert r["split"] in ("train", "val", "test")
        assert r["n_tokens"] > 0 and r["pack_offset"] < 512
    # decontamination: no kept doc shares a 4-token span with evals
    from web_crawler_spark.operators.dedup import decontaminate
    leaked = decontaminate(
        out.select("doc_id", F.col("text_redacted")),
        evals.select("doc_id", F.col("text").alias("text_redacted")),
        "doc_id", "text_redacted", window=4,
    )
    assert leaked.count() == 0

    # deterministic end to end
    again = C.build_text_corpus(
        train, eval_docs=evals,
        mix_rates={"en": 0.8}, default_mix_rate=0.5,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_text_corpus_line_clean_and_dsir_stages(spark):
    """The two front/back selection stages: line cleaning rewrites text
    before the gates (nav/boiler lines never reach dedup), and DSIR keeps
    only docs scoring >= 0 against the target-domain contrast."""
    docs = _docs(spark)
    # bolt a boilerplate line onto every doc: with line_clean it must not
    # survive into text_redacted; without it, it must
    noisy = docs.withColumn(
        "text", F.concat_ws("\n", "text", F.lit("We use cookie consent banners today."))
    )
    cleaned = C.build_text_corpus(noisy, line_clean=True)
    dirty = C.build_text_corpus(noisy, line_clean=False)
    assert cleaned.filter(F.col("text_redacted").contains("cookie")).count() == 0
    assert dirty.filter(F.col("text_redacted").contains("cookie")).count() > 0

    # DSIR stage: output is a strict subset of the no-DSIR output
    base = C.build_text_corpus(docs, allowed_langs=("en", "unknown"))
    sel = C.build_text_corpus(
        docs, allowed_langs=("en", "unknown"), dsir_target=F.col("lang") == "en"
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    sel_ids = {r["doc_id"] for r in sel.select("doc_id").collect()}
    assert sel_ids < base_ids and len(sel_ids) > 0


def test_text_corpus_paragraph_dedup_stage(spark):
    """para_min_df runs cross-document paragraph dedup before every other
    gate: a boilerplate paragraph bolted onto every doc never reaches the
    output, and docs that were ONLY boilerplate drop out entirely."""
    docs = _docs(spark)
    noisy = docs.withColumn(
        "text",
        F.concat_ws("\n", F.lit("shared boilerplate header paragraph"), "text"),
    )
    out = C.build_text_corpus(noisy, para_min_df=2, line_clean=False)
    assert out.count() > 0
    assert (
        out.filter(F.col("text_redacted").contains("shared boilerplate")).count()
        == 0
    )
    # an all-boilerplate doc is dropped at the paragraph stage, and the
    # metadata columns survive the join-back for everyone else
    only_boiler = noisy.limit(0).union(
        docs.limit(1).select(
            F.lit(999_999_999).alias("doc_id"),
            F.lit("shared boilerplate header paragraph").alias("text"),
            F.lit("en").alias("lang"), F.lit("synthetic").alias("source"),
            F.lit(36).cast("long").alias("n_chars"),
        )
    )
    out2 = C.build_text_corpus(
        noisy.unionByName(only_boiler), para_min_df=2, line_clean=False
    )
    assert out2.filter(F.col("doc_id") == 999_999_999).count() == 0
    assert out2.filter(F.col("lang").isNull()).count() == 0


def test_pair_corpus_end_to_end(spark):
    from web_crawler_spark.images import synthesize_images

    pairs = synthesize_images(spark, 80)
    out = C.build_pair_corpus(pairs)
    kept = out.collect()
    assert kept and len(kept) < pairs.count()

    # every survivor carries the training layout: an aspect bucket with a
    # batch index, and a WebDataset shard address with in-shard offsets
    # that are consistent per (writer, shard)
    for r in kept:
        assert r["bucket_w"] > 0 and r["bucket_h"] > 0 and r["batch_idx"] >= 0
        assert r["shard_key"] == f"w{r['writer']}-s{r['shard_idx']:05d}"
        assert 0 <= r["shard_offset"] < 4 * 1024 * 1024
    # batches fill to at most batch_size, and all but the last batch of
    # each bucket are exactly full
    from collections import Counter

    per_batch = Counter((r["bucket_key"], r["batch_idx"]) for r in kept)
    assert all(n <= 8 for n in per_batch.values())
    last = {}
    for (bk, bi), _n in per_batch.items():
        last[bk] = max(last.get(bk, -1), bi)
    for (bk, bi), n in per_batch.items():
        if bi < last[bk]:
            assert n == 8
    # survivors pass the metadata gates and near-dup collapse kept the
    # min-id representative: no planted _dup sibling survives with its
    # original present
    ids = {r["image_id"] for r in kept}
    for i in ids:
        if i.endswith("_dup"):
            assert i[: -len("_dup")] not in ids

    # exact caption dedup: stamp one survivor's caption onto another
    # surviving image — only the min-id copy may remain
    two = sorted(ids)[:2]
    stamped = pairs.withColumn(
        "caption",
        F.when(F.col("image_id") == two[1],
               F.lit(f"synthetic scene {int(two[0].split('_')[1])}"))
        .otherwise(F.col("caption")),
    )
    after = {r["image_id"] for r in C.build_pair_corpus(stamped).collect()}
    assert two[0] in after and two[1] not in after
    assert after == ids - {two[1]}

    # image-side decontamination: an eval set whose one image shares a
    # survivor's phash (different id) must knock that survivor out
    vic = sorted(ids)[0]
    ev = pairs.filter(F.col("image_id") == vic).select(
        F.concat(F.lit("eval_"), "image_id").alias("image_id"), "phash"
    )
    decon = {
        r["image_id"]
        for r in C.build_pair_corpus(pairs, eval_pairs=ev).collect()
    }
    assert vic not in decon and decon == ids - {vic}

    # alignment gate plugs in when embeddings exist for both sides
    emb = pairs.select(
        "image_id",
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: F.crc32(F.concat(F.col("image_id"), i))
                    .cast("double") / 2**32 - 0.5).alias("embedding"),
    )
    gated = C.build_pair_corpus(pairs, caption_emb=emb, image_emb=emb,
                                align_threshold=0.99)
    # identical embeddings → cosine 1.0 ≥ 0.99 → same survivors
    assert {r["image_id"] for r in gated.collect()} == ids


def test_text_corpus_lm_unimax_and_bpe_stages(spark):
    """Round-4 session-5 stages: CCNet LM tertile gate (tail dropped),
    UniMax mixing (copy counts ride along), and BPE tokenized lengths."""
    docs = _docs(spark)
    base = C.build_text_corpus(docs)
    out = C.build_text_corpus(
        docs,
        lm_target=F.col("lang") == "en",
        unimax_budget=200, unimax_epochs=2,
        learn_bpe=4,
    )
    rows = out.collect()
    assert rows, "pipeline kept nothing"
    assert out.columns == [
        "doc_id", "lang", "text_redacted", "n_tokens", "split",
        "pack_bucket", "pack_bin", "pack_offset",
        "unimax_copies", "n_bpe_tokens",
    ]
    # the LM tier gate is a real filter: strictly fewer docs than baseline
    assert len(rows) < base.count()
    for r in rows:
        assert r["unimax_copies"] >= 1
        # every merge can only shrink a doc's token count, and BPE tokens
        # are at most the character count
        assert 0 < r["n_bpe_tokens"] <= len(r["text_redacted"])
    # deterministic
    again = C.build_text_corpus(
        docs,
        lm_target=F.col("lang") == "en",
        unimax_budget=200, unimax_epochs=2,
        learn_bpe=4,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_text_corpus_blocklist_stage(spark):
    """The C4 blocklist gate drops a planted spam doc that passes every
    statistical gate, and leaves the rest of the pipeline untouched."""
    docs = _docs(spark)
    kept_before = {r["doc_id"] for r in
                   C.build_text_corpus(docs).select("doc_id").collect()}
    assert kept_before, "baseline corpus kept nothing"
    # a victim with no dedup relations, so removing it upstream cannot
    # promote a twin or resurrect a substring-pair partner downstream
    from web_crawler_spark.functions.text import fingerprint
    from web_crawler_spark.operators import dedup as D

    pairs = D.substring_dup_pairs(docs, "doc_id", "text",
                                  window=8, min_shared=2)
    involved = {r["i"] for r in
                pairs.select(F.col("a").alias("i")).unionAll(
                    pairs.select(F.col("b").alias("i"))).collect()}
    from pyspark.sql import Window

    fp_twins = {
        r["doc_id"]
        for r in docs.select("doc_id", fingerprint("text").alias("f"))
        .withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("f")))
        .filter(F.col("c") > 1).collect()
    }
    victim = min(kept_before - involved - fp_twins)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim,
               # a single appended blocklist word; length/stopword/punct
               # profiles barely move, so only the blocklist can drop it
               F.concat(F.col("text"), F.lit(" casino")))
        .otherwise(F.col("text")),
    )
    kept_after = {r["doc_id"] for r in
                  C.build_text_corpus(planted).select("doc_id").collect()}
    assert victim not in kept_after
    # the gate is surgical: nothing else changed
    assert kept_before.symmetric_difference(kept_after) == {victim}


def test_text_corpus_gopher_stage(spark):
    """gopher_min_words turns on the full A1.1 battery: the survivor set
    is exactly the baseline survivors that pass the gate (the stage
    composes as a pure filter — with no dedup/decontamination stages
    enabled downstream, it cannot resurrect or promote anything)."""
    from web_crawler_spark.functions.text import gopher_quality

    docs = _docs(spark)
    base = C.build_text_corpus(docs)
    # min_stop=1: the synthetic vocabulary contains exactly one of the
    # paper's 8 stop words ("the") — the documented domain-adaptation knob
    with_g = C.build_text_corpus(docs, gopher_min_words=40, gopher_min_stop=1)
    kept_base = {r["doc_id"] for r in base.select("doc_id").collect()}
    kept_g = {r["doc_id"] for r in with_g.select("doc_id").collect()}
    passes = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            gopher_quality("text", min_words=40, min_stop=1)["keep"].alias("k"),
        ).filter("k").collect()
    }
    assert kept_g, "gopher gate dropped everything"
    assert kept_g < kept_base, "gate dropped nothing at min_words=40"
    # every gopher survivor is a baseline survivor that passes the battery;
    # dedup survivor election among passers can only shrink further, so
    # containment (not equality) is the composable invariant
    assert kept_g <= (kept_base & passes)


def test_text_corpus_c4_span_stage(spark):
    """c4_span_window rewrites docs before the gates: a 3-sentence
    passage planted across many docs survives only in the globally first
    doc's text; every other carrier is rewritten without it (and still
    subject to the downstream gates)."""
    docs = _docs(spark)
    P = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.lit(P + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    base = C.build_text_corpus(planted, c4_span_window=None)
    spanned = C.build_text_corpus(planted, c4_span_window=3)
    first_carrier = min(
        r["doc_id"]
        for r in planted.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id").collect()
    )
    kept = {
        r["doc_id"]: r["text_redacted"]
        for r in spanned.select("doc_id", "text_redacted").collect()
    }
    assert kept, "span stage dropped everything"
    carriers = [i for i in kept if i % 5 == 0]
    assert carriers, "no planted carrier survived the downstream gates"
    for i in carriers:
        if i == first_carrier:
            assert "alpha beta gamma" in kept[i]
        else:
            assert "alpha beta gamma" not in kept[i]
    # without the stage the passage rides through on every carrier
    base_kept = {
        r["doc_id"]: r["text_redacted"]
        for r in base.select("doc_id", "text_redacted").collect()
    }
    assert all("alpha beta gamma" in base_kept[i]
               for i in base_kept if i % 5 == 0)


def test_pair_corpus_model_score_and_lang_gates(spark):
    """The two new optional gates: (1) model_scores drops NSFW /
    low-aesthetic / unscored pairs before any dedup; (2) caption_lang
    keeps only captions language-IDed to the target. Both gates only
    ever SHRINK the baseline survivor set."""
    from web_crawler_spark.images import synthesize_images

    pairs = synthesize_images(spark, 60)
    base = {r["image_id"] for r in C.build_pair_corpus(pairs).collect()}

    # score every image cleanly except: _dup rows unscored, one specific
    # survivor marked nsfw
    ids = [r["image_id"] for r in pairs.select("image_id").collect()]
    victim = sorted(base)[0]
    scores = spark.createDataFrame(
        [
            (i, 0.9 if i == victim else 0.0, 6.0, 0.0)
            for i in ids if not i.endswith("_dup")
        ],
        "image_id string, nsfw_p double, aesthetic double, watermark_p double",
    )
    got = {
        r["image_id"]
        for r in C.build_pair_corpus(pairs, model_scores=scores).collect()
    }
    assert victim not in got
    assert not any(i.endswith("_dup") for i in got)  # unscored never pass
    assert got <= base

    # caption lang gate: synthesized captions are English-ish; a wrong
    # target empties the corpus, the detected target keeps a subset
    from web_crawler_spark.functions.text import lang_id

    det = (
        pairs.select(lang_id(F.col("caption")).alias("lg"))
        .groupBy("lg").count().orderBy(F.desc("count")).first()["lg"]
    )
    same = {
        r["image_id"]
        for r in C.build_pair_corpus(pairs, caption_lang=det).collect()
    }
    assert same and same <= base
    none = C.build_pair_corpus(pairs, caption_lang="xx").count()
    assert none == 0


def test_pair_corpus_caption_election_same_survivors_better_captions(spark):
    """elect_caption=True keeps the EXACT survivor set of the default
    collapse but upgrades each survivor's caption to the cluster's best:
    the planted _dup siblings carry strictly longer alt-text, so every
    clustered survivor must come out wearing the dup's caption."""
    from web_crawler_spark.images import synthesize_images
    from web_crawler_spark.plans.corpus import build_pair_corpus

    base = synthesize_images(spark, 400)
    pairs = base.withColumn(
        "caption",
        F.when(
            F.col("image_id").endswith("_dup"),
            F.concat(F.col("caption"),
                     F.lit(" with a much longer descriptive alt text")),
        ).otherwise(F.col("caption")),
    )
    plain = build_pair_corpus(pairs).select("image_id", "caption").collect()
    elected = build_pair_corpus(pairs, elect_caption=True).select(
        "image_id", "caption", "n_cluster_captions"
    ).collect()

    assert sorted(r["image_id"] for r in plain) == sorted(
        r["image_id"] for r in elected
    )
    pl = {r["image_id"]: r["caption"] for r in plain}
    el = {r["image_id"]: r for r in elected}
    upgraded = 0
    for iid, r in el.items():
        if r["n_cluster_captions"] > 1:
            # contested cluster: election must pick the longer alt-text
            assert r["caption"].endswith("descriptive alt text")
            assert len(r["caption"]) > len(pl[iid])
            upgraded += 1
        else:
            assert r["caption"] == pl[iid]
    assert upgraded >= 3  # the planted every-10th _dup siblings survived


def test_text_corpus_chunking_stage(spark):
    docs = _docs(spark)
    base = C.build_text_corpus(docs)
    out = C.build_text_corpus(docs, chunk_max=16, chunk_stride=4)
    assert out.columns == base.columns + ["chunk_idx"]
    rows = out.collect()
    assert rows
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    base_by = {r["doc_id"]: r for r in base.collect()}
    # same survivor documents — chunking only changes row granularity
    assert set(by) == set(base_by)
    n_multi = 0
    for doc_id, rs in by.items():
        rs = sorted(rs, key=lambda r: r["chunk_idx"])
        # contiguous chunk indices and bounded window sizes
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        assert all(r["n_tokens"] <= 16 for r in rs)
        # every chunk of a doc inherits the DOC's split: overlapping
        # windows can never straddle train/val/test
        assert len({r["split"] for r in rs}) == 1
        assert rs[0]["split"] == base_by[doc_id]["split"]
        # verbatim mode: chunk 0 is a prefix of the redacted text
        assert base_by[doc_id]["text_redacted"].startswith(
            rs[0]["text_redacted"].split(" ")[0]
        )
        if len(rs) > 1:
            n_multi += 1
            # stride overlap: each successor repeats the last 4 tokens
            for a, b in zip(rs, rs[1:]):
                ta = a["text_redacted"].split(" ")
                tb = b["text_redacted"].split(" ")
                if len(ta) == 16:
                    assert ta[-4:] == tb[:4]
    assert n_multi > 0, "fixture has no doc longer than chunk_max"


def test_text_corpus_chunking_short_docs_pass_through_verbatim(spark):
    docs = _docs(spark)
    base = {r["doc_id"]: r for r in C.build_text_corpus(docs).collect()}
    out = C.build_text_corpus(docs, chunk_max=10_000, chunk_stride=64)
    rows = out.collect()
    # nothing in the fixture exceeds 10k tokens: every doc is one chunk 0
    # with BYTE-IDENTICAL release text and identical pack addressing to
    # the unchunked build (the default path's numeric pack order held)
    assert all(r["chunk_idx"] == 0 for r in rows)
    for r in rows:
        b = base[r["doc_id"]]
        assert r["text_redacted"] == b["text_redacted"]
        assert (r["split"], r["n_tokens"]) == (b["split"], b["n_tokens"])


def test_pair_corpus_language_mixing(spark):
    """lang_mix_budget: caption lang-ID strata + temperature sampling
    inside the pair build — head language flattened toward the budget,
    deterministic across reruns, provenance columns present."""
    import pyspark.sql.functions as F

    from web_crawler_spark.plans.corpus import build_pair_corpus

    rows = []
    for i in range(300):
        en = i % 4 != 0  # 225 english-ish, 75 junk-lang
        cap = (
            f"the house and the tree are near the water {i}"
            if en else f"zzz{i} qqq xxx"
        )
        # spread phash bits (sequential ints are pairwise hamming-close
        # and would all collapse as near-dups)
        ph = (i * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
        rows.append((f"img{i:04d}", None, 64, 64, "png", cap, ph))
    pairs = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    out = build_pair_corpus(pairs, lang_mix_budget=120).cache()
    try:
        assert {"cap_lang", "temp_copies"} <= set(out.columns)
        by = {r["cap_lang"]: r["n"] for r in
              out.groupBy("cap_lang").agg(F.count("*").alias("n")).collect()}
        # both strata survive and the head stratum is flattened: its
        # share of survivors is well under its input share
        assert set(by) == {"en", "unknown"}
        assert by["en"] < 225
        assert by["unknown"] >= 1
        # deterministic rerun
        again = build_pair_corpus(pairs, lang_mix_budget=120)
        assert sorted(r["image_id"] for r in out.select("image_id").collect()) \
            == sorted(r["image_id"] for r in again.select("image_id").collect())
    finally:
        out.unpersist()
