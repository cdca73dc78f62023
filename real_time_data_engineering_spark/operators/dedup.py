"""Deduplication operators — exact through fuzzy, designed for 100 TB.

Strategy ladder (cheapest first):

1. **Exact** — fingerprint (md5 of the normal form) + hash-groupBy.
   One shuffle on the fingerprint; AQE handles skew. O(N).
2. **MinHash + LSH** — k min-hashes per document from word shingles,
   banded into buckets; only documents sharing a band bucket are
   candidate pairs. Shuffles scale with N·k, never N².
3. **SimHash** — 64-bit (xxhash64 bit votes) locality hash; near-dups
   differ in few bits. Grouping by signature (or banded sub-keys) finds
   clusters without pairwise work.
4. **N-gram Jaccard verify** — exact similarity, used to confirm the
   candidates produced by 2/3 (the classic candidate→verify split: the
   quadratic step only ever runs on the candidate set).

The md5-based hashing used in the parity-checked paths is deliberately
engine-agnostic (DuckDB mirrors it string-for-string); the xxhash64
variants are the faster production path where cross-engine parity is
not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, word_ngrams


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: fingerprint → keeper (min id) + copy count.

    Reference analogue: the W1 keep-one-per-natural-key dedup
    (flink/sql/06-silver.sql:42-58) generalized to content hashing.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the surviving rows (smallest id per fingerprint)."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingle_exploded(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) pairs — the input relation for Jaccard/MinHash."""
    return df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing ≥1 shingle.

    The shingle equi-join means cost scales with shingle collisions, not
    N² — and Catalyst shuffles both sides on `shingle`, so at scale this
    is one co-partitioned join plus one pair-keyed aggregation.
    """
    sh = shingle_exploded(df, n, text_col, id_col).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_shingles").alias("s1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_shingles").alias("s2"))
    return (
        common.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("s1") + F.col("s2") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def minhash_signatures_wide(
    df: DataFrame, n: int = 3, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash over word shingles, engine-agnostic.

    Each "permutation" is md5(seed || '|' || shingle); the signature
    element is the lexicographic MIN of the 32-hex-char digests — order
    on fixed-width hex strings equals order on the underlying 128-bit
    integers, so this is a true min-hash and DuckDB can mirror it
    exactly.

    All k mins are computed in ONE aggregation over the exploded
    shingles (k agg columns, not k× exploded rows): a single shuffle
    keyed by document with map-side partial mins — the shape that holds
    at 100 TB, where k× row inflation would k× the shuffle.
    Output: wide (doc_id, sig_0..sig_{k-1}).
    """
    sh = shingle_exploded(df, n, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, n: int = 3, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Long-form (doc_id, seed, sig) view of the wide signatures."""
    wide = minhash_signatures_wide(df, n, k, text_col, id_col)
    stack_args = ", ".join(f"{i}, sig_{i}" for i in range(k))
    return wide.select(
        F.col(id_col), F.expr(f"stack({k}, {stack_args}) AS (seed, sig)")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: k sigs → `bands` band-hashes; pairs sharing ≥1 band.

    Estimated Jaccard = fraction of equal signature positions. The band
    bucket join is the scale path: candidate generation is linear in
    documents × bands, and the verify step (exact Jaccard) only runs on
    survivors.
    """
    rows = k // bands
    wide = minhash_signatures_wide(df, n, k, text_col, id_col).cache()
    # band_hash per band straight from the wide columns (no extra shuffle);
    # band index = floor(seed / rows) on both engines.
    stack_args = ", ".join(
        "{b}, md5(concat_ws('|', {cols}))".format(
            b=b, cols=", ".join(f"sig_{i}" for i in range(b * rows, (b + 1) * rows))
        )
        for b in range(bands)
    )
    banded = wide.select(
        F.col(id_col), F.expr(f"stack({bands}, {stack_args}) AS (band, band_hash)")
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )
    # estimated Jaccard = fraction of equal signature positions — one
    # 16-term expression over the two wide rows, no per-seed join.
    s1 = wide.select(F.col(id_col).alias("d1"), *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(k)])
    s2 = wide.select(F.col(id_col).alias("d2"), *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(k)])
    matches = None
    for i in range(k):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", (matches.cast("double") / F.lit(float(k))).alias("est_jaccard"))
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash via xxhash64 bit votes (fast production path).

    Per token: xxhash64 → 64 bit votes (+1/-1); signature bit j is the
    sign of the vote sum. Implemented as explode + groupBy — one shuffle
    keyed by doc, partial aggregation map-side. No cross-engine oracle
    (DuckDB lacks xxhash64); checked by property tests instead.
    """
    toks = df.select(F.col(id_col), F.explode(F.expr(f"split(lower(trim({text_col})), '\\\\s+')")).alias("tok"))
    h = toks.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    # shiftleft, not a Python 1<<j literal: bit 63 overflows a signed
    # LongType literal but shiftleft wraps correctly in the JVM.
    bit_terms = [
        F.when(F.col(f"b{j}") >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        for j in range(64)
    ]
    expr = bit_terms[0]
    for t in bit_terms[1:]:
        expr = expr + t
    return agg.select(F.col(id_col), expr.alias("simhash"))


def simhash16_hex(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit engine-agnostic SimHash: one vote per md5 hex position.

    Dimension j's vote is +1 when hex digit j of md5(token) is ≥ '8'
    (i.e. the high bit of that nibble), -1 otherwise; the signature is a
    16-char '0'/'1' string. DuckDB mirrors this with substr(md5(..)).
    """
    toks = df.select(F.col(id_col), F.explode(F.expr(f"split(lower(trim({text_col})), '\\\\s+')")).alias("tok"))
    h = toks.withColumn("h", F.md5("tok"))
    hi = tuple("89abcdef")
    votes = [
        F.sum(F.when(F.substring("h", j + 1, 1).isin(*hi), 1).otherwise(-1)).alias(f"b{j}")
        for j in range(16)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    return agg.select(
        F.col(id_col),
        F.concat(
            *[F.when(F.col(f"b{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(16)]
        ).alias("simhash_bits"),
    )
