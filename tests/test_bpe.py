"""Distributed BPE training (operators/bpe.py): the learned merge table
must match a single-threaded textbook reference bit-for-bit (same greedy
argmax, same (count desc, pair bytewise) tie-break), application must be
the standard greedy left-to-right segmentation, and everything must be
invariant to partitioning."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from web_crawler_spark.operators import bpe as B


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Textbook single-threaded BPE on the word-frequency table, with the
    engine's tie-break (wrapped pair string = (left, right) bytewise)."""
    import re

    words = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", t.lower())).strip()
        for w in norm.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        out = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + c
        vocab = out
    return merges


TEXTS = [
    "low lower lowest low low newer newest new",
    "low lower newer newer wider wide wide",
    "the newest lower low wide river the the",
]


def test_bpe_learn_matches_textbook_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert B.bpe_learn(docs, n_merges=8) == _py_bpe(TEXTS, 8)


def test_bpe_learn_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, TEXTS[i % 3]) for i in range(30)], "doc_id long, text string"
    )
    a = B.bpe_learn(docs, n_merges=5)
    b = B.bpe_learn(docs.repartition(16), n_merges=5)
    assert a == b == _py_bpe([TEXTS[i % 3] for i in range(30)], 5)


def test_bpe_apply_greedy_overlap_and_roundtrip(spark):
    docs = spark.createDataFrame([(1, "aaa aaaa banana")], "i long, text string")
    # merge (a, a) applied greedily left-to-right: aaa -> [aa, a]
    toks = docs.select(
        B.bpe_apply("text", [(1, "a", "a", 0)]).alias("t")
    ).collect()[0]["t"]
    assert toks == ["aa", "a", "aa", "aa", "b", "a", "n", "a", "n", "a"]
    # tokens always reassemble the normalized text exactly
    merges = B.bpe_learn(docs, n_merges=4)
    joined = docs.select(
        F.concat_ws("", B.bpe_apply("text", merges)).alias("j")
    ).collect()[0]["j"]
    assert joined == "aaaaaaabanana"


def test_bpe_learn_exhausts_gracefully(spark):
    # single 2-char word: only one merge exists; asking for 5 yields 1
    docs = spark.createDataFrame([(1, "ab ab")], "i long, text string")
    m = B.bpe_learn(docs, n_merges=5)
    assert m == [(1, "a", "b", 2)]


def test_local_strategy_bit_identical_to_distributed(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    dist = B.bpe_learn(df, "text", n_merges=12, strategy="distributed")
    loc = B.bpe_learn(df, "text", n_merges=12, strategy="local")
    auto = B.bpe_learn(df, "text", n_merges=12)  # small vocab → local
    assert loc == dist
    assert auto == dist


def test_local_trainer_thousand_merges_single_collect(spark):
    """The scale contract: a 1,000-merge train is ONE corpus fold + zero
    per-merge Spark jobs (bpe_learn_local runs in-memory), completes in
    seconds, and stays bit-identical to the textbook reference."""
    import time

    texts = [
        f"doc {i} the quick brown fox jumps over the lazy dog "
        f"pack my box with five dozen liquor jugs {i % 97} "
        f"sphinx of black quartz judge my vow {i % 13}"
        for i in range(400)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t0 = time.time()
    merges = B.bpe_learn(df, "text", n_merges=1000, strategy="local")
    elapsed = time.time() - t0
    assert elapsed < 60, f"local 1000-merge train took {elapsed:.1f}s"
    # merge ranks are dense from 1 and the table is exhausted or full
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
    assert 50 < len(merges) <= 1000
    # bit-identity with the textbook reference on the same corpus
    want = _py_bpe(texts, len(merges))
    assert merges == want
    # counts are non-increasing only per no guarantee — but every count >= 1
    assert all(m[3] >= 1 for m in merges)
    # application with the learned table still segments losslessly
    toks = (
        spark.createDataFrame([(texts[0],)], "text string")
        .select(F.concat_ws("", B.bpe_apply("text", merges[:40])).alias("j"))
        .collect()[0]["j"]
    )
    import re

    norm = re.sub(r"\s+", " ",
                  re.sub(r"[^a-z0-9\s]", " ", texts[0].lower())).strip()
    assert toks == norm.replace(" ", "")
