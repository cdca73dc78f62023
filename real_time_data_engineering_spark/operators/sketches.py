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
  summaries (Misra & Gries 1982) via Arrow-batched `mapInPandas`,
  merged on the driver. Mergeable-summaries property (Agarwal et al.
  2013): summing counters and decrementing by the (k+1)-th largest
  keeps the guarantee, so the merged sketch still (a) contains EVERY
  token with true frequency > n/(k+1), and (b) underestimates any
  token's count by at most n/(k+1). Driver traffic is O(partitions·k)
  counters — never the vocabulary; at 100 TB this is the path, since
  the exact form's full token groupBy shuffles the corpus vocabulary.

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

        counters: dict[str, int] = {}
        for pdf in it:
            for toks in pdf["token_arr"]:
                for t in toks:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < k:
                        counters[t] = 1
                    else:
                        dead = [key for key in counters if counters[key] == 1]
                        for key in dead:
                            del counters[key]
                        for key in counters:
                            counters[key] -= 1
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
