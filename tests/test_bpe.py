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
