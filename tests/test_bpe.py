"""BPE vocabulary induction (operators/bpe.py).

The registry oracle (d36) value-checks the distributed implementation
against DuckDB's unrolled rounds; these tests pin the SEMANTICS against
an independent in-Python greedy-BPE model and exercise the edge shapes
(same-symbol runs, single-char words, train/apply consistency)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators.bpe import (
    bpe_merge_table,
    bpe_segment,
    word_freq_table,
)


def _model_bpe(texts: list[str], n_merges: int):
    """Reference model: classic greedy BPE (overlapping pair counts,
    (count DESC, pair ASC) tie-break, leftmost non-overlapping merge)."""
    words = Counter(w for t in texts for w in re.findall("[a-z]+", t.lower()))
    seqs = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


TEXTS = [
    "the cat sat on the mat",
    "the cats sat and sat",
    "aaaa aaaa baaa",  # same-symbol runs: greedy pairing must hold
    "a b c d e",  # single-char words contribute no pairs
    "banana bandana cabana",
]


def test_bpe_merge_table_matches_python_model(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merge_table(df, n_merges=8).orderBy("merge_rank").collect()
    ]
    want, _ = _model_bpe(TEXTS, 8)
    assert got == want


def test_bpe_same_symbol_run_merges_greedy_leftmost(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — and the merged
    table's counts use OVERLAPPING pair counting ('aaaa' counts (a,a)
    three times), matching the model exactly."""
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    m = bpe_merge_table(df, n_merges=2).orderBy("merge_rank").collect()
    assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "a")
    assert m[0]["pair_count"] == 9  # 3 words x 3 overlapping (a,a) pairs
    assert (m[1]["lhs"], m[1]["rhs"]) == ("aa", "aa")
    seg = bpe_segment(df, [("a", "a"), ("aa", "aa")]).select("tokens").first()
    assert seg["tokens"] == ["aaaa", "aaaa", "aaaa"]


def test_bpe_segment_agrees_with_training_final_state(spark):
    """Applying the learned merge list to the corpus must reproduce the
    training loop's final symbol state word-for-word (train/apply
    consistency — the tokenizer artifact round-trips)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_merge_table(df, n_merges=6).orderBy("merge_rank").collect()
    ]
    _, model_seqs = _model_bpe(TEXTS, 6)
    seg = bpe_segment(
        spark.createDataFrame([(w,) for w in model_seqs], "text string"), merges
    )
    got = {r["text"]: r["tokens"] for r in seg.collect()}
    assert got == model_seqs


def test_bpe_word_freq_is_the_only_corpus_sized_pass(spark):
    """Scale contract: the per-round relations are vocab-sized — the
    word table collapses duplicates before any merge round."""
    df = spark.createDataFrame(
        [("the the the the",), ("the cat",)], "text string"
    )
    wf = {r["word"]: r["freq"] for r in word_freq_table(df).collect()}
    assert wf == {"the": 5, "cat": 1}


def test_bpe_degenerate_corpus_returns_partial_table(spark):
    """A corpus with no mergeable pairs (all single-char words) yields
    an empty merge table rather than erroring."""
    df = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_merge_table(df, n_merges=4).count() == 0


def test_bpe_plan_stays_jvm_side(spark):
    """The per-round rewrite is a narrow JVM fold: no Python workers in
    the segmenter's plan (BatchEvalPython/ArrowEvalPython absent)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    plan = (
        bpe_segment(df, [("a", "a"), ("t", "h")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # and the pair-count side is one hash aggregate over an explode
    from real_time_data_engineering_spark.operators.bpe import _pair_counts

    syms = df.select(
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("w")
    ).select(F.explode("w").alias("word"), F.lit(1).alias("freq"))
    syms = syms.select(F.expr("regexp_extract_all(word, '.', 0)").alias("syms"), "freq")
    pplan = _pair_counts(syms)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in pplan


def test_bpe_driver_crossover_is_bit_identical_to_distributed(spark):
    """driver_vocab_limit is a pure execution-strategy knob (the
    k-means sample_n precedent): the collected-vocab incremental
    trainer and the distributed per-round loop must emit the exact
    same merge table — counts, tie-breaks and ranks."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    via_driver = [
        tuple(r) for r in bpe_merge_table(df, n_merges=10).orderBy("merge_rank").collect()
    ]
    via_engine = [
        tuple(r)
        for r in bpe_merge_table(df, n_merges=10, driver_vocab_limit=None)
        .orderBy("merge_rank")
        .collect()
    ]
    assert via_driver == via_engine and via_driver
    # a vocab larger than the limit falls back to the distributed loop
    via_fallback = [
        tuple(r)
        for r in bpe_merge_table(df, n_merges=10, driver_vocab_limit=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert via_fallback == via_engine


def test_bpe_realistic_merge_count_trains_in_seconds(spark):
    """The r5 finding: at ~30k merges the distributed loop's ~0.5 s
    per-round scheduling floor is a multi-hour driver-latency wall.
    The crossover must make a 200-merge-class training interactive
    (seconds) AND still match the independent Python model exactly."""
    import time

    texts = TEXTS * 4 + [
        "pretokenization keeps symbols lowercase alphabetic runs only",
        "mergeable summaries keep the guarantee through the decrement",
        "the quick brown fox jumps over the lazy dog repeatedly",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    t0 = time.time()
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merge_table(df, n_merges=200).orderBy("merge_rank").collect()
    ]
    took = time.time() - t0
    want, _ = _model_bpe(texts, 200)
    assert got == want
    assert took < 30, f"200-merge training took {took:.1f}s — crossover not engaged?"
