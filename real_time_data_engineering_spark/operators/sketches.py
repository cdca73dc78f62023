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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) as a PERSISTED,
# MERGEABLE artifact. The d×w counter grid is a table of plain SUMS,
# so the sketch union is element-wise addition — store per-shard/epoch
# sketches as append-only delta rows in a `ManifestTable` and any read
# re-aggregates them: point estimates then serve WITHOUT touching the
# corpus, shard loaders append concurrently through the manifest CAS
# (the `_centroid_deltas` / lexical-`_stats` pattern), and
# union(base, appends) ≡ the all-at-once sketch by associativity
# (equivalence-tested). State is ≤ d·w rows per delta — metadata-sized
# at any corpus scale.
# ---------------------------------------------------------------------------
_CM_TABLE = "counters"


def cm_bucket(col, i: int, w: int):
    """Row-``i`` bucket of a value: u16 of md5('cm{i}:' || value) mod w
    — the repo's md5-nibble idiom (d25/d33), engine-identical by
    construction (the d41 oracle spells the same arithmetic)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"cm{i}:"), col)), 1, 4), 16, 10).cast(
            "long"
        )
        % w
    )


def cm_sketch(values: DataFrame, d: int = 4, w: int = 1024, value_col: str = "term") -> DataFrame:
    """Build the (i, bucket, c) counter table over a value stream —
    counter-keyed: each occurrence explodes into d cells and the one
    shuffle carries at most d·w groups (map-side combine collapses
    every partition to that), never the value domain."""
    cells = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cm_bucket(F.col(value_col), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("x")
    ).select("x.i", "x.bucket")
    return cells.groupBy("i", "bucket").agg(F.count("*").cast("long").alias("c"))


def write_cm_sketch(counters: DataFrame, path: str) -> None:
    """Persist a sketch (overwrite): one ManifestTable of counter rows."""
    import os

    from .manifest import ManifestTable

    ManifestTable(os.path.join(path, _CM_TABLE)).write(
        counters.coalesce(1), mode="overwrite"
    )


def append_cm_sketch(counters: DataFrame, path: str, max_attempts: int = 5) -> None:
    """Union another shard/epoch's sketch in: CAS-append its counter
    rows as a delta. Element-wise addition happens at read time, so
    concurrent appenders can never lose each other's cells."""
    import os

    from .manifest import ManifestTable

    ManifestTable(os.path.join(path, _CM_TABLE)).append_with_retry(
        counters.coalesce(1), max_attempts=max_attempts
    )


def read_cm_sketch(spark, path: str) -> DataFrame:
    """The merged sketch: all delta rows element-wise summed back to
    one (i, bucket, c) grid — ≤ d·w · #deltas input rows, metadata-
    sized at any corpus scale."""
    import os

    from .manifest import ManifestTable

    return (
        ManifestTable(os.path.join(path, _CM_TABLE))
        .read(spark)
        .groupBy("i", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cm_point_estimates(
    counters: DataFrame, terms: DataFrame, d: int = 4, w: int = 1024, value_col: str = "term"
) -> DataFrame:
    """Canonical CM point estimates for a bounded query set: per value,
    MIN over its d cells with empty cells counting 0 (LEFT join +
    coalesce — the Cormode-Muthukrishnan min over ALL rows, so a value
    the corpus never hashed anywhere estimates 0). One-sided guarantee:
    estimate ≥ true count, overestimate ≤ εN with prob 1-δ for
    w=⌈e/ε⌉, d=⌈ln 1/δ⌉."""
    qb = terms.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cm_bucket(F.col(value_col), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("x"),
    ).select(value_col, "x.i", "x.bucket")
    return (
        qb.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_est"))
    )
