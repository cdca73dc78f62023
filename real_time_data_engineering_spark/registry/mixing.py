"""Training-data mixing / curation queries (LLM-pipeline surface).

The last mile of a 100 TB pretraining pipeline: deterministic
hash-based sampling (reproducible across runs and engines — no RNG
state), per-source token budgeting, and shard assignment for training
export. Everything is a narrow projection or a windowed cumsum — one
shuffle per stratum boundary, no Python.

Determinism contract shared with the DuckDB oracles: the sampling
coin is md5(doc_id) — hex chars compare identically in both engines —
and tie-breaks are unique keys, never floating-point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import char_count, est_bpe_tokens
from ..sources.readers import load_table
from . import register

# ---------------------------------------------------------------------------
# d9 — stratified deterministic sampling: per-source rates via the first
# md5 nibble ('0'..'f' sort identically in ASCII on both engines), so a
# rate of n/16 is "nibble <= the (n-1)th hex char". Rates rotate by
# source index mod 4 → {2,4,8,12}/16.
# ---------------------------------------------------------------------------
_RATE_NIBBLE = {0: "1", 1: "3", 2: "7", 3: "b"}

_D9_ORACLE = """
WITH t AS (
  SELECT doc_id, source, lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS coin,
         CAST(substr(source, 4) AS INT) % 4 AS rate_class
  FROM documents
)
SELECT doc_id, source, lang, rate_class
FROM t
WHERE coin <= CASE rate_class WHEN 0 THEN '1' WHEN 1 THEN '3'
                              WHEN 2 THEN '7' ELSE 'b' END
"""


@register("d9_stratified_sample", _D9_ORACLE)
def d9_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic hash sampling at {2,4,8,12}/16 rates.

    No RNG: the sampling coin is a content-independent hash of the key,
    so the sample is stable under reruns, retries, and repartitioning —
    the property that matters for reproducible training mixes.
    Pure narrow projection + filter: no shuffle at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    coin = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    rate_class = F.pmod(F.substring("source", 4, 10).cast("int"), F.lit(4))
    thr = F.when(rate_class == 0, "1").when(rate_class == 1, "3").when(rate_class == 2, "7").otherwise("b")
    return (
        docs.select("doc_id", "source", "lang", rate_class.alias("rate_class"), coin.alias("_coin"), thr.alias("_thr"))
        .filter(F.col("_coin") <= F.col("_thr"))
        .select("doc_id", "source", "lang", "rate_class")
    )


# ---------------------------------------------------------------------------
# d10 — token-budget mix: each source contributes documents (in
# deterministic md5 order) until its 2000-token budget is exhausted.
# One windowed cumsum per source partition.
# ---------------------------------------------------------------------------
_D10_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT) AS est_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ord
  FROM documents
), c AS (
  SELECT doc_id, source, est_tokens,
         CAST(SUM(est_tokens) OVER (PARTITION BY source ORDER BY ord
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, est_tokens, cum_tokens FROM c WHERE cum_tokens <= 2000
"""


@register("d10_token_budget_mix", _D10_ORACLE)
def d10_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget selection (2000 BPE-estimate tokens).

    The mixing primitive behind "x% web, y% books, capped at N tokens
    each": a cumsum window per source over a deterministic hash order.
    One shuffle keyed by source; skewed mega-sources would be ranged
    into sub-strata first at 100 TB (same window, finer key).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        est_bpe_tokens("text").alias("est_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("_ord"),
    )
    w = Window.partitionBy("source").orderBy("_ord").rowsBetween(Window.unboundedPreceding, 0)
    return (
        t.withColumn("cum_tokens", F.sum("est_tokens").over(w))
        .filter(F.col("cum_tokens") <= 2000)
        .select("doc_id", "source", "est_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# d11 — shard assignment for training export: hash-uniform shard id per
# document + per-shard accounting. ascii() of md5 nibbles is the
# cross-engine hex→int bridge.
# ---------------------------------------------------------------------------
_N_SHARDS = 8

_D11_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % {_N_SHARDS} AS shard,
         CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT) AS est_tokens
  FROM documents
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(est_tokens) AS BIGINT) AS total_tokens
FROM t GROUP BY shard
"""


@register("d11_shard_assignment", _D11_ORACLE)
def d11_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard id (md5-derived, {_N_SHARDS} shards) + per-shard
    doc/token accounting — the pre-flight stats for a sharded training
    export (`df.repartition(n, shard).write`). Hash sharding keeps
    shards size-uniform regardless of source skew."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)), F.lit(_N_SHARDS))
    return (
        docs.select(shard.alias("shard"), est_bpe_tokens("text").alias("est_tokens"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("est_tokens").alias("total_tokens"))
    )


# ---------------------------------------------------------------------------
# d18 — sequence packing (concat-and-chunk): the step between "mixed
# corpus" and "training batches". Documents are concatenated in
# deterministic md5 order within their shard and chunked into
# fixed-capacity token sequences; each document reports the sequence
# span [start_seq, end_seq] it lands in. One windowed cumsum per shard
# (same shuffle shape as d10); the /2048 is a power-of-two double
# divide, exact in IEEE on both engines, so floor() never straddles.
# ---------------------------------------------------------------------------
_PACK_CAP = 2048

_D18_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % {_N_SHARDS} AS shard,
         CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT) AS est_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ord
  FROM documents
), c AS (
  SELECT doc_id, shard, est_tokens,
         CAST(SUM(est_tokens) OVER (PARTITION BY shard ORDER BY ord
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t WHERE est_tokens > 0
)
SELECT doc_id, shard, est_tokens,
       CAST(floor((cum - est_tokens) / {_PACK_CAP}.0) AS BIGINT) AS start_seq,
       CAST(floor((cum - 1) / {_PACK_CAP}.0) AS BIGINT) AS end_seq
FROM c
"""


@register("d18_sequence_packing", _D18_ORACLE)
def d18_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into {_PACK_CAP}-token training
    sequences, per shard, in deterministic md5 order.

    A doc spanning a chunk boundary is split across sequences (standard
    pretraining packing — no padding waste), hence the [start_seq,
    end_seq] span. Zero-token docs pack nowhere and are excluded.
    At 100 TB this is one cumsum window per shard; skewed shards would
    sub-stratify on a second hash char, same as d10's note.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)), F.lit(_N_SHARDS)
    )
    t = docs.select(
        "doc_id",
        shard.alias("shard"),
        est_bpe_tokens("text").alias("est_tokens"),
        h.alias("_ord"),
    ).filter(F.col("est_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("_ord").rowsBetween(Window.unboundedPreceding, 0)
    cap = float(_PACK_CAP)
    return (
        t.withColumn("cum", F.sum("est_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "est_tokens",
            F.floor((F.col("cum") - F.col("est_tokens")) / F.lit(cap)).cast("long").alias("start_seq"),
            F.floor((F.col("cum") - 1) / F.lit(cap)).cast("long").alias("end_seq"),
        )
    )


# ---------------------------------------------------------------------------
# d25 — temperature sampling (alpha = 0.5): per-source acceptance rate
# sqrt(T_min / T_s), the multilingual/low-resource upweighting scheme
# (rates proportional to T_s^alpha; anchoring at the smallest source
# keeps every quantity a ratio of two exact BIGINTs under one
# correctly-rounded sqrt — bit-identical across engines, no
# order-sensitive double summation). The accept coin is the first 16
# bits of md5(doc_id) as a [0,1) uniform.
# ---------------------------------------------------------------------------
_D25_ORACLE = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT) AS est_tokens,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
  FROM documents
), tot AS (
  SELECT source, CAST(SUM(est_tokens) AS BIGINT) AS src_tokens FROM t GROUP BY 1
), mn AS (
  SELECT MIN(src_tokens) AS t_min FROM tot
), rates AS (
  SELECT source, src_tokens,
         least(1.0, sqrt(CAST((SELECT t_min FROM mn) AS DOUBLE) / CAST(src_tokens AS DOUBLE))) AS accept_rate
  FROM tot
)
SELECT d.doc_id, d.source, d.est_tokens, r.src_tokens AS source_tokens, r.accept_rate
FROM t d JOIN rates r USING (source)
WHERE CAST(d.u16 AS DOUBLE) / 65536.0 < r.accept_rate
"""


@register(
    "d25_temperature_sampling",
    _D25_ORACLE,
    doc="alpha=0.5 temperature sampling across sources: acceptance rate "
    "sqrt(T_min/T_s) per source, md5-coin Bernoulli per document — the "
    "standard low-resource upweighting mix (vs d10's hard token budget). "
    "Per-source totals broadcast; the corpus pass is a narrow filter.",
)
def d25_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled training subset with per-source accept rates.

    Scale shape: the per-source totals relation is |sources| rows (a
    broadcast), the T_min anchor is one scalar fetch (same bounded
    class as d24's cutoff), and the selection itself is a narrow
    projection+filter over the corpus — one small shuffle for the
    totals, zero for the decision pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        est_bpe_tokens("text").alias("est_tokens"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("_u16"),
    )
    tot = t.groupBy("source").agg(F.sum("est_tokens").alias("source_tokens"))
    t_min = int(tot.agg(F.min("source_tokens")).first()[0])
    rates = tot.withColumn(
        "accept_rate",
        F.least(
            F.lit(1.0),
            F.sqrt(F.lit(float(t_min)) / F.col("source_tokens").cast("double")),
        ),
    )
    return (
        t.join(F.broadcast(rates), "source")
        .filter(F.col("_u16").cast("double") / F.lit(65536.0) < F.col("accept_rate"))
        .select("doc_id", "source", "est_tokens", "source_tokens", "accept_rate")
    )


# ---------------------------------------------------------------------------
# d33 — weighted sampling without replacement (Efraimidis–Spirakis
# A-Res): pick k=50 docs per source with inclusion probability
# proportional to token weight — the "sample big docs more often"
# selection d9's uniform Bernoulli and d25's per-source temperature
# can't express. Key insight of A-Res: assigning each item the key
# u^(1/w) (equivalently ordering by -ln(u)/w ascending) and keeping
# the top-k IS a weighted sample without replacement — one pass, no
# sequential reservoir state, perfect for a distributed top-k.
# Determinism: u = (u16+1)/65536 from the md5 coin (power-of-two
# division → bit-identical doubles), -ln(u) quantized DECIMAL(18,9) at
# the source, then INTEGER fixed-point division by the weight
# (truncating div on non-negatives — identical in both engines), so
# the priority key is an exact BIGINT. Per-source top-50 is a ranked
# window over the (source)-keyed aggregate — the T1 top-k shape.
# ---------------------------------------------------------------------------
_D33_ORACLE = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT) AS weight_tokens,
         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS u16
  FROM documents
), keyed AS (
  SELECT doc_id, source, weight_tokens,
         (CAST(CAST(round(-ln((u16 + 1) / 65536.0), 9) AS DECIMAL(28,9))
               * 1000000000 AS BIGINT) * 1000000) // greatest(weight_tokens, 1) AS priority_fp
  FROM t
), ranked AS (
  SELECT doc_id, source, weight_tokens, priority_fp,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY priority_fp ASC, doc_id ASC) AS pick_rank
  FROM keyed
)
SELECT doc_id, source, weight_tokens, priority_fp, CAST(pick_rank AS BIGINT) AS pick_rank
FROM ranked WHERE pick_rank <= 50
"""


@register(
    "d33_weighted_reservoir",
    _D33_ORACLE,
    doc="Efraimidis-Spirakis weighted sampling without replacement "
    "(k=50 per source, weight = est tokens): priority -ln(u)/w as an "
    "exact integer fixed-point key from the md5 coin — one pass, "
    "distributed top-k, no reservoir state.",
)
def d33_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted 50-doc sample per source (A-Res one-pass form)."""
    docs = load_table(spark, sf_dir, "documents")
    u16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    neg_lnu = F.round(
        -F.log((u16 + F.lit(1)).cast("double") / F.lit(65536.0)), 9
    ).cast("decimal(18,9)")
    keyed = docs.select(
        "doc_id",
        "source",
        est_bpe_tokens("text").alias("weight_tokens"),
        (neg_lnu * F.lit(1_000_000_000)).cast("long").alias("_nl_fp"),
    ).select(
        "doc_id",
        "source",
        "weight_tokens",
        # greatest(..., 1): an empty doc has weight 0 — floor it so the
        # priority key stays defined (and engine NULL-ordering
        # differences never enter the ranking)
        F.expr("(_nl_fp * 1000000) div greatest(weight_tokens, 1)").alias("priority_fp"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority_fp").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= 50)
    )


# ---------------------------------------------------------------------------
# d39 — deterministic per-epoch shuffle order: the resumable data-
# loader permutation a trainer actually consumes. Per epoch, every doc
# gets a position within its shard from an md5(doc_id:epoch) sort key
# — a different, reproducible permutation each epoch, resumable from
# any (epoch, shard, position) checkpoint with no RNG state to
# persist. The ranking window is PARTITIONED by (epoch, shard), so at
# 100 TB each sort is one shard's worth — shard count is the
# parallelism knob, never a global sort (q43's lesson). Tie-break on
# doc_id keeps the order total even under md5-collision paranoia.
# ---------------------------------------------------------------------------
_N_EPOCHS = 2

_D39_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % {_N_SHARDS} AS shard
  FROM documents
), e AS (
  SELECT epoch, doc_id, shard,
         md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS ord
  FROM t, (SELECT unnest([0, 1]) AS epoch)
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(shard AS BIGINT) AS shard,
       doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY ord, doc_id)
            AS BIGINT) AS position
FROM e
"""


@register(
    "d39_epoch_shuffle",
    _D39_ORACLE,
    doc="Deterministic per-epoch data-loader order: md5(doc_id:epoch) "
    "permutation ranked WITHIN (epoch, shard) — reproducible, resumable "
    "from any checkpoint without RNG state, shard-parallel (no global "
    "sort) at any scale.",
)
def d39_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(epoch, shard, doc_id, position) for the first two epochs."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)),
        F.lit(_N_SHARDS),
    )
    e = docs.select(
        "doc_id",
        shard.cast("long").alias("shard"),
        F.explode(F.array(*[F.lit(i) for i in range(_N_EPOCHS)])).alias("epoch"),
    )
    ord_key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("epoch").cast("string"))
    )
    w = Window.partitionBy("epoch", "shard").orderBy(ord_key, F.col("doc_id"))
    return e.select(
        F.col("epoch").cast("long").alias("epoch"),
        "shard",
        "doc_id",
        F.row_number().over(w).cast("long").alias("position"),
    )


# ---------------------------------------------------------------------------
# d49 — epoch / repetition budget accounting (Muennighoff et al. 2023,
# "Scaling Data-Constrained Language Models"): given a total training
# token budget split evenly across sources, how many EPOCHS must each
# source repeat to fill its share, and which sources cross the ~4-epoch
# knee past which repeated data stops helping? The planning table every
# data-constrained run consults before mixing. Pure integer arithmetic
# end to end: per-source token sums (exact BIGINT), an integer-division
# budget split, epochs in basis points via cross-multiplied `div`, and
# an integer threshold flag — no float anywhere, so the whole report is
# bit-identical on both engines.
# ---------------------------------------------------------------------------
_D49_BUDGET = 2_000_000  # total training-token budget (pinned constant)
_D49_KNEE_X100 = 400  # the ~4-epoch diminishing-returns knee

_D49_ORACLE = f"""
WITH t AS (
  SELECT source,
         CAST(SUM(CAST(ceil(CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS BIGINT) / 4.0)
              AS BIGINT)) AS BIGINT) AS source_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM t
)
SELECT t.source, t.n_docs, t.source_tokens,
       CAST({_D49_BUDGET} AS BIGINT) // n.n_sources AS budget_tokens,
       (CAST({_D49_BUDGET} AS BIGINT) // n.n_sources) * 100 // greatest(t.source_tokens, 1) AS epochs_x100,
       ((CAST({_D49_BUDGET} AS BIGINT) // n.n_sources) * 100 // greatest(t.source_tokens, 1)) > {_D49_KNEE_X100}
           AS over_repeat
FROM t CROSS JOIN n
"""


@register(
    "d49_epoch_budget",
    _D49_ORACLE,
    doc="Data-constrained scaling accounting (Muennighoff et al. 2023): "
    "per source, the exact token inventory, its even share of the "
    "pinned 2M-token training budget, the repeat factor in basis "
    "points (epochs x100, integer cross-multiplied div), and the "
    "over-the-4-epoch-knee flag — the planning table a repeated-data "
    "run consults before mixing. Pure integer arithmetic both engines.",
)
def d49_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, source_tokens, budget_tokens, epochs_x100,
    over_repeat) under an even split of the pinned 2M-token budget."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(est_bpe_tokens("text")).cast("long").alias("source_tokens"),
    )
    # |sources| is a tiny O(1) driver scalar (the d24/d25 precedent);
    # a 1-row count join would plan the banned BNLJ
    n_sources = t.count()
    budget = _D49_BUDGET // n_sources  # python // == SQL div for positives
    return t.select(
        "source",
        "n_docs",
        "source_tokens",
        F.lit(budget).cast("long").alias("budget_tokens"),
        # greatest(,1): an all-empty source has source_tokens=0 — Spark's
        # non-ANSI div would yield NULL while DuckDB's // raises; clamp so
        # both engines report a finite (huge) repeat factor instead.
        F.expr(f"(cast({budget} as bigint) * 100) div greatest(source_tokens, 1)").alias("epochs_x100"),
        (
            F.expr(f"(cast({budget} as bigint) * 100) div greatest(source_tokens, 1)")
            > F.lit(_D49_KNEE_X100)
        ).alias("over_repeat"),
    )
