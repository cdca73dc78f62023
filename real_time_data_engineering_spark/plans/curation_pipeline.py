"""End-to-end LLM-corpus curation pipeline: the ladder composed.

The taxi medallion DAG (`plans/taxi_pipeline.py`) is the reference's
pipeline surface; this is its training-data twin — one callable that
takes a raw document corpus through the full verified curation ladder:

    raw → exact dedup → near-dup keeper selection → quality gates
        → benchmark decontamination → temperature sampling
        → shard assignment

Every stage reuses the SAME operator kernels the registry value-checks
one by one (d1/d5/d15/d16-class dedup, d20/d12 gates, d14 decontam,
d25 sampling, d11 sharding), so the composition inherits their oracle
evidence; the composition itself is gated by determinism, stage-
monotonicity, and cross-check tests (`tests/test_curation_pipeline.py`)
rather than one giant SQL mirror.

Scale shape: the stages are the individually documented ones — the
expensive rungs (MinHash banding, component resolution) run AFTER
exact dedup has collapsed identical copies, which is the ordering the
100× replica stress in the README quantifies (cliques make pairwise
rungs candidate-quadratic; exact dedup first returns them to the
unique-corpus cost).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import est_bpe_tokens
from ..operators import dedup as D
from ..operators.quality import contamination_stats, gopher_quality_rules, repetition_stats
from ..sources.readers import ensure_min_partitions, load_table

#: d14's eval-set convention: every 19th doc id plays the benchmark.
EVAL_MOD = 19


@dataclass(frozen=True)
class CurationRun:
    """Stage outputs of one curation pass. The multi-consumer stages
    (exact_unique, neardup_keep, quality_pass) are eagerly
    localCheckpoint-ed at construction so the funnel's branches never
    recompute them; the rest stay lazy."""

    raw: DataFrame
    exact_unique: DataFrame
    neardup_keep: DataFrame
    semantic_keep: DataFrame  # == neardup_keep when the stage is off
    quality_pass: DataFrame
    probe_keep: DataFrame  # == quality_pass when the probe gate is off
    decontaminated: DataFrame
    sampled: DataFrame
    sharded: DataFrame  # final: doc_id, source, est_tokens, shard
    shard_accounting: DataFrame  # shard, n_docs, total_tokens

    def audit_counts(self) -> dict[str, int]:
        """Materialize the funnel: stage → surviving docs."""
        return {
            "raw": self.raw.count(),
            "exact_unique": self.exact_unique.count(),
            "neardup_keep": self.neardup_keep.count(),
            "semantic_keep": self.semantic_keep.count(),
            "quality_pass": self.quality_pass.count(),
            "probe_keep": self.probe_keep.count(),
            "decontaminated": self.decontaminated.count(),
            "sampled": self.sampled.count(),
            "sharded": self.sharded.count(),
        }


def _quality_score(df: DataFrame) -> DataFrame:
    """d4's composite score (token volume, stopword evidence, punct
    restraint) — the keeper-selection metric."""
    from ..functions.text import STOPWORDS, char_count, marker_hits, punct_count, token_count

    m = df.select(
        "doc_id",
        token_count("text").alias("_nt"),
        char_count("text").alias("_nc"),
        punct_count("text").alias("_np"),
        marker_hits("text", STOPWORDS).alias("_ns"),
    )
    return m.select(
        "doc_id",
        (
            F.lit(0.4) * (F.least(F.col("_nt"), F.lit(100)).cast("double") / F.lit(100.0))
            + F.lit(0.3) * (F.col("_ns").cast("double") / F.col("_nt").cast("double"))
            + F.lit(0.3)
            * (F.lit(1.0) - F.col("_np").cast("double") / F.col("_nc").cast("double"))
        ).alias("quality_score"),
    )


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_shards: int = 8,
    eval_mod: int = EVAL_MOD,
    contamination_threshold: float = 0.5,
    semantic_dedup: bool = False,
    semantic_threshold: float = 0.35,
    semantic_target_cell_rows: int = 100,
    semantic_centroids=None,
    probe_gate: bool = False,
    probe_iters: int = 20,
    probe_weights: list[int] | None = None,
    decontam_phrases: tuple[tuple[int, str], ...] | None = None,
) -> CurationRun:
    """Run the full curation ladder over ``sf_dir``'s documents table.

    ``semantic_dedup=True`` inserts the SemDeDup stage (s9's kernel,
    `operators/similarity.semdedup`) between near-dup keeper selection
    and the quality gates — the pipeline position the SemDeDup paper
    uses (lexical near-dups are gone, so the embedding pass catches
    only the semantic rewrites the n-gram rungs cannot). The cluster
    count auto-scales (k = ceil(N/``semantic_target_cell_rows``), the
    paper's k∝N convention) so the stage's pair work stays linear in
    the surviving corpus. Docs without an embedding (or with a
    zero-norm one) pass through unjudged — absence of evidence keeps a
    doc. OFF by default: the stage requires the embeddings table and
    the registered d35 pins the 6-stage composition.
    ``semantic_centroids`` (implies nothing about the flag — pass
    ``semantic_dedup=True`` with it) replaces the stage's Lloyd
    training with FROZEN-quantizer assignment: the alignment knob for
    the incremental-ingest equivalence contract, exactly like
    ``probe_weights`` — both sides must bucket with the same persisted
    coarse quantizer for the within-cell pair verdicts to be pure
    per-pair functions of the union corpus.

    ``probe_gate=True`` inserts the TRAINED-classifier filter (d48's
    kernel, `operators/quality.probe_scored_sampling`) after the
    heuristic quality gates — FineWeb-Edu's pipeline position: the
    cheap rules run first, the learned score then keeps/drops/lotteries
    the survivors. The probe trains on the gate's own input corpus
    (distilling the teacher rule over exactly the docs it will judge,
    ``probe_iters`` fixed-point GD rounds). Benchmark-side docs
    (doc_id % eval_mod == 0) BYPASS the gate: they exist to feed the
    decontamination reference and are dropped from the training output
    downstream anyway — a training-side filter must never shrink the
    contamination evidence. OFF by default (d35 pins the composition
    without it).

    ``probe_weights`` (implies the probe gate) skips training and
    scores with the given FROZEN nano-weights (`score_with_probe` +
    the shared d48 banding) — the model-registry serving path, and the
    alignment knob for the incremental-ingest equivalence test (both
    sides must judge with the same persisted model, the FineWeb-Edu
    train-once/apply-to-the-whole-crawl shape).

    ``decontam_phrases`` replaces stage 4's eval-overlap kernel with
    fixed-benchmark-phrase containment (`phrase_containment_expr`, the
    d44 verify): a doc is contaminated iff it contains ANY phrase
    token-aligned. Per-doc and reference-free, which is what makes the
    stage ORDER-INDEPENDENT and therefore incrementally maintainable;
    the %eval_mod train-only exclusion is unchanged."""
    raw = ensure_min_partitions(load_table(spark, sf_dir, "documents"))

    # 1. exact dedup FIRST (collapses identical copies before any
    #    pairwise rung — see the module note on the 100× asymmetry).
    #    The deduped corpus feeds FOUR downstream branches of one lazy
    #    plan (MinHash banding, quality scoring, the singleton anti-join
    #    and the final keeper join); without a cut, a single action
    #    recomputes the dedup shuffle per branch — localCheckpoint once
    #    (the d15/d32 policy) so every consumer reads the materialized
    #    result. Measured: d35 warm p50 15.0s → ~6s at sf0.1.
    exact = D.dedup_keep_first(raw).localCheckpoint(eager=True)

    # 2. near-dup keeper selection: MinHash banding → components →
    #    highest-quality doc per cluster; singletons pass through
    pairs = D.minhash_candidate_pairs(exact, n=3, k=16, bands=4).select("d1", "d2")
    comp = D.connected_components(pairs, src="d1", dst="d2")
    quality = _quality_score(exact)
    clustered = comp.select(F.col("node").alias("doc_id"), "cluster_id").join(
        quality, "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    keepers = (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    singletons = exact.select("doc_id").join(
        comp.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    )
    # three consumers (both quality gates + the surviving-column select)
    neardup_keep = exact.join(keepers.unionByName(singletons), "doc_id").localCheckpoint(
        eager=True
    )

    # 2b. OPT-IN semantic dedup (SemDeDup's pipeline position: after
    #     lexical near-dup, before quality gates): drop docs whose
    #     embedding has a LOWER-id semantic twin among the survivors;
    #     docs the embeddings table can't judge pass through
    if semantic_dedup:
        from ..operators.similarity import semdedup

        emb = load_table(spark, sf_dir, "embeddings")
        survivors_emb = emb.join(
            neardup_keep.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        sem = semdedup(
            survivors_emb,
            threshold=semantic_threshold,
            target_cell_rows=semantic_target_cell_rows,
            centroids=semantic_centroids,
        )
        sem_dups = sem.filter(F.col("is_dup")).select(
            F.col("vec_id").alias("doc_id")
        )
        semantic_keep = neardup_keep.join(
            sem_dups, "doc_id", "left_anti"
        ).localCheckpoint(eager=True)  # two gate consumers, like neardup_keep
    else:
        semantic_keep = neardup_keep

    # 3. quality gates: Gopher rule set + repetition flag
    gopher = gopher_quality_rules(semantic_keep).select("doc_id", "passes_gopher")
    rep = repetition_stats(semantic_keep).select("doc_id", "is_repetitive")
    # two consumers (contamination probe + the train-only filter)
    quality_pass = (
        semantic_keep.join(gopher, "doc_id")
        .join(rep, "doc_id", "left")
        .filter(F.col("passes_gopher") & ~F.coalesce("is_repetitive", F.lit(False)))
        .select(*semantic_keep.columns)
        .localCheckpoint(eager=True)
    )

    # 3b. OPT-IN trained-classifier gate (FineWeb-Edu's position:
    #     heuristic rules first, the learned score on the survivors).
    #     Benchmark docs bypass the gate (see docstring) — the decontam
    #     reference must not shrink because a training-side filter fired.
    if probe_gate or probe_weights is not None:
        from ..operators.quality import (
            probe_banded_decision,
            probe_scored_sampling,
            score_with_probe,
        )

        if probe_weights is not None:
            decided = probe_banded_decision(
                score_with_probe(quality_pass, probe_weights, keep_cols=("source",))
            )
        else:
            decided = probe_scored_sampling(quality_pass, iters=probe_iters, lr_den=1)
        accepted = decided.filter(F.col("accepted")).select("doc_id")
        eval_ids = quality_pass.filter(F.col("doc_id") % eval_mod == 0).select("doc_id")
        probe_keep = quality_pass.join(
            accepted.unionByName(eval_ids).distinct(), "doc_id"
        ).localCheckpoint(eager=True)  # two consumers, like quality_pass
    else:
        probe_keep = quality_pass

    # 4. benchmark decontamination (d14's eval convention by default;
    #    fixed-phrase containment when ``decontam_phrases`` is given);
    #    eval docs themselves never enter the training output
    train_only = probe_keep.filter(F.col("doc_id") % eval_mod != 0)
    if decontam_phrases is not None:
        from ..operators.retrieval import phrase_containment_expr

        contaminated = None
        for _pid, phrase in sorted(decontam_phrases):
            hit = phrase_containment_expr("text", F.lit(phrase))
            contaminated = hit if contaminated is None else (contaminated | hit)
        decontaminated = train_only.filter(
            ~F.coalesce(contaminated, F.lit(False))
        ).select(*train_only.columns)
    else:
        contam = contamination_stats(
            probe_keep,
            F.col("doc_id") % eval_mod == 0,
            n=5,
            threshold=contamination_threshold,
        ).select("doc_id", "is_contaminated")
        decontaminated = (
            train_only.join(contam, "doc_id", "left")
            .filter(~F.coalesce("is_contaminated", F.lit(False)))
            .select(*train_only.columns)
        )

    # 5. temperature sampling (alpha=0.5, d25's md5-coin form)
    t = decontaminated.select(
        "doc_id",
        "source",
        est_bpe_tokens("text").alias("est_tokens"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("_u16"),
    ).localCheckpoint(eager=True)  # consumed by the t_min scalar action AND the sample
    sampled, sharded, accounting = temperature_sample_and_shard(t, n_shards)

    return CurationRun(
        raw=raw,
        exact_unique=exact,
        neardup_keep=neardup_keep,
        semantic_keep=semantic_keep,
        quality_pass=quality_pass,
        probe_keep=probe_keep,
        decontaminated=decontaminated,
        sampled=sampled,
        sharded=sharded,
        shard_accounting=accounting,
    )


def temperature_sample_and_shard(
    t: DataFrame, n_shards: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stages 5+6 of the ladder over a (doc_id, source, est_tokens,
    _u16) relation: temperature sampling (alpha=0.5, d25's md5-coin
    form) then d11's md5 uniform shard assignment + accounting. Shared
    by the batch ladder and the incremental ingest plan's read-time
    view so both derive the final corpus from identical expressions.
    ``t`` should be checkpointed by the caller (the t_min scalar action
    and the sample both consume it)."""
    tot = t.groupBy("source").agg(F.sum("est_tokens").alias("_src_tokens"))
    t_min = int(tot.agg(F.min("_src_tokens")).first()[0] or 0)
    rates = tot.withColumn(
        "_rate",
        F.least(
            F.lit(1.0),
            F.sqrt(
                F.lit(float(t_min))
                / F.greatest(F.col("_src_tokens"), F.lit(1)).cast("double")
            ),
        ),
    )
    sampled = (
        t.join(F.broadcast(rates), "source")
        .filter(F.col("_u16").cast("double") / F.lit(65536.0) < F.col("_rate"))
        .select("doc_id", "source", "est_tokens")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)),
        F.lit(n_shards),
    )
    sharded = sampled.withColumn("shard", shard.cast("long"))
    accounting = sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("est_tokens").alias("total_tokens")
    )
    return sampled, sharded, accounting
