"""Frequent-items (heavy-hitter) operators — the token-frequency
census an LLM-corpus pipeline runs to find boilerplate, stop tokens
and vocabulary heads.

Two paths, same contract as the rest of the sketch surface (q21's
HLL precedent: exact form oracle-checked, sketch form bounded by a
mathematical guarantee):

* `exact_heavy_hitters` — two passes (total count, then per-token
  count with the threshold applied). Deterministic, value-checked
  against DuckDB (d38). The threshold compare is integer cross-
  multiplication (`cnt * k > n`), so no float enters the decision.
* `mg_heavy_hitters` — ONE pass: per-partition Misra-Gries(k)
  summaries (Misra & Gries 1982) via Arrow-batched `mapInPandas`
  (vectorized: pandas `explode().value_counts()` per batch, then the
  mergeable-summaries decrement — per-batch Python cost is
  O(distinct tokens), never O(tokens)), merged on the driver.
  Mergeable-summaries property (Agarwal et al. 2013): summing
  counters and decrementing by the (k+1)-th largest keeps the
  guarantee, so the merged sketch still (a) contains EVERY token with
  true frequency > n/(k+1), and (b) underestimates any token's count
  by at most n/(k+1). Driver traffic is O(partitions·k) counters —
  never the vocabulary.

  Honest single-node throughput note (measured, 10× replica + a
  400 k-doc/9 M-distinct synthetic vocab): the EXACT path stays
  slightly faster at local scale — Tungsten's map-side partial
  hash-agg beats the Arrow+pandas transfer even at millions of
  distinct tokens. The sketch's claim is bounded STATE: at 100 TB the
  exact form's vocabulary-sized exchange is what spills, while MG's
  shuffle+driver state stays O(partitions·k) regardless of vocabulary.

The sketch's surviving-counter SET is deterministic for a fixed
partitioning but not across partitionings (MG is order-sensitive), so
it is property-tested against the exact form's guarantees rather than
oracle-hashed — the same reasoning that keeps q21 rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+"


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("token")
    )


def exact_heavy_hitters(df: DataFrame, k: int = 200, text_col: str = "text") -> DataFrame:
    """Tokens with frequency STRICTLY above n/k (the classic heavy-
    hitter threshold): (token, freq, share). ONE corpus pass: the
    per-token counts are checkpointed (vocab-sized), the scalar total
    is summed from THEM — an O(vocab) job, not a second corpus scan —
    and fetched driver-side (d24 pattern: a join against a 1-row
    aggregate would plan a BroadcastNestedLoopJoin). The threshold is
    integer cross-multiplied so the cut is exact."""
    counts = (
        _tokens(df, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .localCheckpoint(eager=True)
    )
    n = int(counts.agg(F.sum("freq")).first()[0] or 0)
    return counts.filter(F.col("freq") * F.lit(k) > F.lit(n)).select(
        "token",
        "freq",
        (F.col("freq").cast("double") / F.lit(float(n))).alias("share"),
    )


def mg_heavy_hitters(df: DataFrame, k: int = 200, text_col: str = "text") -> DataFrame:
    """One-pass Misra-Gries(k) heavy hitters: (token, est_freq).

    est_freq underestimates the true count by at most n/(k+1), and
    every token with true count > n/(k+1) survives — both properties
    hold THROUGH the merge (mergeable-summaries decrement). The final
    table carries at most k rows; callers confirm exact counts for the
    survivors with one targeted semi-join pass if they need them
    (still never a full-vocabulary shuffle)."""

    def mg_partial(it):
        import pandas as _pd

        # Vectorized partial (r5 verdict: the per-token Python loop was
        # the one row-at-a-time interpreter path left in an operator
        # module). Each Arrow batch's counts come from pandas
        # explode().value_counts() (C-speed), which is itself an EXACT
        # summary — i.e. an MG(k') sketch with zero error — so folding
        # it into the running counters with the mergeable-summaries
        # decrement (sum, then subtract the (k+1)-th largest and keep
        # positives; Agarwal et al. 2013) preserves both MG guarantees
        # exactly as the token-at-a-time decrement did. Per-batch
        # Python work is O(distinct tokens), not O(tokens).
        counters: dict[str, int] = {}
        for pdf in it:
            batch = pdf["token_arr"].explode().dropna().value_counts()
            for t, c in batch.items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        if counters:
            yield _pd.DataFrame(
                {"token": list(counters), "c": list(counters.values())}
            )

    arr = df.select(
        F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)").alias(
            "token_arr"
        )
    )
    partials = arr.mapInPandas(mg_partial, "token string, c bigint").collect()
    # driver-side mergeable-summaries merge: sum counters, then if more
    # than k survive, subtract the (k+1)-th largest and drop <= 0
    merged: dict[str, int] = {}
    for r in partials:
        merged[r["token"]] = merged.get(r["token"], 0) + r["c"]
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {t: c - cut for t, c in merged.items() if c - cut > 0}
    spark = df.sparkSession
    rows = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(rows or [], "token string, est_freq bigint")
