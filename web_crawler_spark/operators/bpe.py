"""Distributed BPE tokenizer training (Sennrich et al. 2016) as DataFrame
ops — the vocabulary-learning step of a training-data pipeline, run on the
corpus the engine just cleaned and deduped.

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus: one
aggregate folds 10^11 corpus tokens into a vocabulary-sized (word, count)
table, and every merge round after that touches only the vocabulary —
the cost profile that makes tokenizer training feasible at 100 TB.

Engine-exactness trick (mirrored verbatim in the DuckDB oracle): a word's
symbol sequence is encoded as a STRING with every symbol individually
wrapped in \\x1f sentinels — ``cat`` → ``\\x1fc\\x1f\\x1fa\\x1f\\x1ft\\x1f``.
A merge of the pair (a, b) is then a PLAIN LITERAL ``replace()`` of
``\\x1fa\\x1f\\x1fb\\x1f`` with ``\\x1fab\\x1f``:

- no false matches: every symbol is fully delimited, so ``a|b`` can never
  match inside a longer symbol (the lookbehind/lookahead this would
  otherwise need doesn't exist in RE2, which DuckDB uses);
- correct overlap semantics for free: literal replace-all scans left to
  right and never rescans replaced output, which is exactly BPE's greedy
  single-pass application (``aaa`` under the merge (a,a) becomes
  ``[aa, a]``, not ``[a, aa]`` or ``[aa, aa]``);
- both engines' ``replace`` are bytewise-identical, so the learned merge
  table is bit-reproducible anywhere.

Reference seam: the crawler reference has no tokenizer; this extends the
corpus-build plan (plans/corpus.py) the same way dedup/DSIR/UniMax do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_crawler_spark.functions import text as TX

SEP = "\x1f"


def encode_symbols(word: Column | str) -> Column:
    """Wrap every character of ``word`` in \\x1f sentinels (the initial
    character-level symbol sequence)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.regexp_replace(w, "(.)", f"{SEP}$1{SEP}")


def _symbols(enc: Column) -> Column:
    """Split an encoded word back into its symbol array (strip the outer
    sentinels, split on the inter-symbol double separator)."""
    return F.split(F.substr(enc, F.lit(2), F.length(enc) - 2), SEP + SEP)


def _wrapped_pairs(enc: Column) -> Column:
    """Adjacent symbol pairs of an encoded word, each in wrapped form
    ``\\x1fa\\x1f\\x1fb\\x1f`` (the exact replace target of that merge)."""
    syms = _symbols(enc)
    idx = F.when(F.size(syms) > 1, F.sequence(F.lit(1), F.size(syms) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat(
            F.lit(SEP), F.element_at(syms, i),
            F.lit(SEP + SEP), F.element_at(syms, i + 1), F.lit(SEP),
        ),
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy single-pass application of merge (a, b) to one symbol
    sequence — left to right, never rescanning replaced output (``aaa``
    under (a, a) → ``[aa, a]``), exactly the literal-replace semantics
    of the distributed loop."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _wrapped(a: str, b: str) -> str:
    return f"{SEP}{a}{SEP}{SEP}{b}{SEP}"


def bpe_learn_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Exact sequential BPE over an in-memory word-frequency table — the
    single-node trainer every production tokenizer runs AFTER the
    distributed corpus→(word, count) fold (the corpus aggregate is the
    100 TB part; the vocab table it produces is single-machine-sized).

    Bit-identical to the distributed loop by construction: the argmax key
    is (count DESC, wrapped-pair-string ASC) — the same tie-break — and
    merge application mirrors the literal-replace overlap semantics via
    :func:`_merge_word`. Incremental pair-count maintenance with a
    lazy-invalidation heap: each merge costs O(affected words × word
    length + log #pairs), so a 50k-merge vocabulary is minutes, not 50k
    Spark jobs."""
    import heapq
    from collections import defaultdict

    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts:
        if w:
            words.append(list(w))
            counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        c = counts[wi]
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            pair_counts[p] += c
            pair_words[p].add(wi)

    heap: list[tuple[int, str, tuple[str, str]]] = [
        (-c, _wrapped(*p), p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = None
        while heap:
            negc, pw, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc and -negc > 0:
                best = (p, -negc)
                break
        if best is None:
            break
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get((a, b), ())):
            syms = words[wi]
            has = any(
                syms[j] == a and syms[j + 1] == b for j in range(len(syms) - 1)
            )
            if not has:  # stale index entry
                pair_words[(a, b)].discard(wi)
                continue
            c = counts[wi]
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pair_counts[p] -= c
                touched.add(p)
            new = _merge_word(syms, a, b)
            words[wi] = new
            for j in range(len(new) - 1):
                p = (new[j], new[j + 1])
                pair_counts[p] += c
                pair_words[p].add(wi)
                touched.add(p)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, _wrapped(*p), p))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges


# word tables at or under this row count collect to the driver for the
# exact local trainer; bigger ones run the per-merge distributed loop
LOCAL_VOCAB_MAX = 2_000_000


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    strategy: str = "auto",
    local_vocab_max: int = LOCAL_VOCAB_MAX,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge table ``[(rank, left, right, pair_count), ...]`` — ties broken
    by the wrapped pair string (bytewise), so the table is deterministic
    under any partitioning and bit-identical across engines AND across
    strategies.

    ``strategy``:

    - ``'auto'`` (default): ONE distributed corpus→(word, count) fold,
      then — when the vocab table is at or under ``local_vocab_max``
      rows — the exact in-memory trainer (:func:`bpe_learn_local`)
      finishes every merge in zero further Spark jobs. This is the
      production tokenizer-training shape (the corpus pass is the
      100 TB part; the vocabulary is single-machine-sized), and it makes
      a 50k-merge vocabulary O(1) jobs instead of 50k driver round
      trips. Vocabularies too big for the driver fall back to the
      distributed loop.
    - ``'local'`` / ``'distributed'``: force the respective path.

    Distributed plan shape per round: one map-side-combinable SUM over
    the vocabulary's adjacent-pair explosion (vocab-sized, not
    corpus-sized) + a 1-row argmax collect; the winning merge returns to
    the plan as a literal ``replace`` stacked onto the encoding column.
    The word table is persisted for the duration of the loop and
    unpersisted before returning (scoped lifecycle — nothing
    corpus-scale is ever cached).
    """
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    words = (
        df.select(
            F.explode(F.split(TX.normalize_text(text_col), " ")).alias("_w")
        )
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(F.col("_w"), encode_symbols("_w").alias("_e"), "_cnt")
        .persist()
    )
    try:
        if strategy != "distributed":
            # forced-local skips the sizing job entirely; auto pays one
            # count against the already-persisted vocab table
            if strategy == "local" or words.count() <= local_vocab_max:
                wc = [
                    (r["_w"], int(r["_cnt"]))
                    for r in words.select("_w", "_cnt").collect()
                ]
                return bpe_learn_local(wc, n_merges)
        merges: list[tuple[int, str, str, int]] = []
        enc: Column = F.col("_e")
        for r in range(1, n_merges + 1):
            pairs = (
                words.select(enc.alias("_e"), "_cnt")
                .select(F.explode(_wrapped_pairs(F.col("_e"))).alias("_pw"), "_cnt")
                .groupBy("_pw")
                .agg(F.sum("_cnt").alias("_c"))
            )
            best = pairs.orderBy(F.col("_c").desc(), "_pw").limit(1).collect()
            if not best:
                break
            pw, cnt = best[0]["_pw"], int(best[0]["_c"])
            left, right = pw[1:-1].split(SEP + SEP)
            merges.append((r, left, right, cnt))
            enc = F.replace(enc, F.lit(pw), F.lit(pw.replace(SEP + SEP, "")))
        return merges
    finally:
        words.unpersist()


def bpe_apply(
    text: Column | str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Segment ``text`` with a learned merge table: per word, start from
    characters and apply every merge in rank order (the standard greedy
    application). Returns the array of BPE tokens for the whole text —
    pure codegen column algebra (one transform + ``n_merges`` stacked
    literal replaces), no UDF."""
    words = F.split(TX.normalize_text(text), " ")

    def seg(w: Column) -> Column:
        enc = F.regexp_replace(w, "(.)", f"{SEP}$1{SEP}")
        for _, left, right, _ in sorted(merges):
            pw = f"{SEP}{left}{SEP}{SEP}{right}{SEP}"
            enc = F.replace(enc, F.lit(pw), F.lit(f"{SEP}{left}{right}{SEP}"))
        return _symbols(enc)

    return F.flatten(
        F.transform(F.filter(words, lambda w: w != ""), seg)
    )
