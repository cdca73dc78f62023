"""Corpus-quality operators: repetition stats and PII redaction.

The two quality gates every pretraining-data pipeline runs between
dedup and mixing (Gopher-style repetition rules; regex scrubbing of
contact/identifier strings). Both are pure built-in-function plans —
no Python in the hot path:

* ``repetition_stats`` — tokenize → explode word 2-grams → two
  doc-keyed aggregations. Per-doc grouping is embarrassingly parallel
  and map-side combinable, so the shuffles stay proportional to the
  number of documents, never to corpus bytes.
* ``redact_pii`` — a narrow projection of ``regexp_count`` /
  ``regexp_replace`` chains: zero shuffles at any scale.

Regex dialect note: the patterns use only features with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
``\\d``, bounded repetition; no backrefs, no lookaround — so the same
pattern string drives both engines in the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Shared with the DuckDB oracles character-for-character.
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"

# Gopher-style cutoff: a doc whose single most frequent word 2-gram
# occupies > 20% of all its 2-grams is flagged repetitive — but only
# past a minimum length; for tiny docs a single 2-gram trivially
# exceeds any fraction cutoff (Gopher gates short docs separately).
TOP_GRAM_FRAC_CUTOFF = 0.2
MIN_GRAMS_FOR_FLAG = 20


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher rule-set quality gate (Rae et al. 2021 §A1.1 class of
    heuristics, as used by every open pretraining pipeline since):
    token-count window, mean-word-length window, fraction of words
    containing an alphabetic character, and minimum distinct-stopword
    evidence. One narrow projection + per-doc aggregates of the token
    array — pure Column expressions, no shuffle beyond the scan.

    All fractions are single float64 divides of exact integer counts,
    so the verdict column reproduces bit-for-bit on any engine.
    """
    from ..functions.text import STOPWORDS

    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("long")
    mean_len = sum_len.cast("double") / n_tok.cast("double")
    alpha_frac = n_alpha.cast("double") / n_tok.cast("double")
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_len, 9).alias("mean_word_len"),
        F.round(alpha_frac, 9).alias("alpha_word_frac"),
        n_stop.alias("stopword_hits"),
        (
            n_tok.between(min_tokens, max_tokens)
            & mean_len.between(min_mean_word_len, max_mean_word_len)
            & (alpha_frac >= min_alpha_word_frac)
            & (n_stop >= min_stopword_hits)
        ).alias("passes_gopher"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-2-gram repetition statistics + repetitive flag.

    Emits ``n_grams``, ``distinct_grams``, ``max_gram_count``,
    ``top_gram_frac`` (most frequent 2-gram's share), ``dup_gram_frac``
    (share of 2-gram instances whose gram occurs more than once) and
    ``is_repetitive``. Documents with fewer than two tokens have no
    2-grams and are excluded, like an empty GROUP BY partition.

    The fractions are single double divisions of exact BIGINT counts —
    the one cross-engine-stable way to produce them.
    """
    # Materialize the token array ONCE: expressions referenced inside
    # HOF lambdas are inlined and re-evaluated per element otherwise.
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    # Every gram of a document lives in ONE input row, so the per-gram
    # frequencies never needed a shuffle: sort the gram array and fold
    # run-length statistics in a single JVM-codegen aggregate — grouping
    # by equality (groupBy) and adjacency after a total-order sort count
    # the same multiset. Replaces the explode → groupBy(id, gram) →
    # groupBy(id) double exchange with a narrow projection: d12 is now
    # shuffle-free end-to-end like d13 (r11; guide §2.4). Per run of
    # length L: distinct += 1 at run start, maxrun tracks the longest,
    # dup accumulates L for L ≥ 2 (+2 when the run reaches 2 — counting
    # the first instance retroactively — then +1 per further repeat).
    gram = F.zip_with(
        F.slice("_toks", 1, F.size("_toks") - 1),
        F.slice("_toks", 2, F.size("_toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = toked.select(F.col(id_col), gram.alias("_grams")).filter(F.size("_grams") > 0)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("maxrun"),
        zero.alias("dup"),
        zero.alias("distinct"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1)).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            (
                acc["dup"]
                + F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dup"),
            (acc["distinct"] + F.when(run == 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("distinct"),
        )

    agg = base.select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_grams"),
        F.aggregate(F.array_sort("_grams"), init, _step).alias("_st"),
    ).select(
        id_col,
        "n_grams",
        F.col("_st.distinct").alias("distinct_grams"),
        F.col("_st.maxrun").alias("max_gram_count"),
        F.col("_st.dup").alias("dup_grams"),
    )
    top_frac = F.col("max_gram_count").cast("double") / F.col("n_grams").cast("double")
    dup_frac = F.col("dup_grams").cast("double") / F.col("n_grams").cast("double")
    return agg.select(
        id_col,
        "n_grams",
        "distinct_grams",
        "max_gram_count",
        top_frac.alias("top_gram_frac"),
        dup_frac.alias("dup_gram_frac"),
        (
            (F.col("n_grams") >= F.lit(MIN_GRAMS_FOR_FLAG))
            & (top_frac > F.lit(TOP_GRAM_FRAC_CUTOFF))
        ).alias("is_repetitive"),
    )


def contamination_stats(
    df: DataFrame,
    is_eval: Column,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-decontamination check: per TRAIN doc, the fraction of
    its distinct word ``n``-grams that also occur anywhere in the EVAL
    split (``is_eval`` marks eval membership).

    The eval n-gram universe is tiny relative to the corpus (eval sets
    are benchmarks), so the overlap probe is an explicitly broadcast
    left join — at 100 TB the train side streams through map tasks with
    no shuffle for the probe; the only shuffles are the doc-keyed
    distinct + aggregate, both map-side combinable. Train docs with
    fewer than ``n`` tokens have no n-grams and are excluded.
    """
    from .dedup import shingle_exploded

    # shingle_exploded is per-doc-distinct BY CONSTRUCTION
    # (word_ngrams_tokens wraps the gram array in array_distinct), and
    # doc_id disambiguates across docs — so (doc_id, shingle) is
    # already globally distinct and a .distinct() here would be a
    # semantic no-op costing a full corpus-keyed exchange (removed in
    # r11; guide §2.4). The train side is now SHUFFLE-FREE up to the
    # final doc-keyed aggregation.
    grams = shingle_exploded(df, n, text_col, id_col).withColumn("_is_eval", is_eval)
    eval_grams = grams.filter(F.col("_is_eval")).select("shingle").distinct()
    train_grams = grams.filter(~F.col("_is_eval"))
    hits = train_grams.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    agg = hits.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"),
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_grams").cast("double")
    return agg.select(
        id_col,
        "n_grams",
        "n_overlap",
        frac.alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("is_contaminated"),
    )


def redact_pii(text: Column | str) -> dict[str, Column]:
    """Regex PII scrub of a text column.

    Returns the redacted column plus per-kind match counts. Redaction
    order is fixed (email → ip → phone) and the patterns don't overlap
    each other's replacements, so counting before replacing is exact.
    """
    c = F.col(text) if isinstance(text, str) else text
    redacted = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"),
        PHONE_RE,
        "<PHONE>",
    )
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        "n_ips": F.regexp_count(c, F.lit(IP_RE)).cast("long"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
        "redacted": redacted,
    }


# ---------------------------------------------------------------------------
# Distribution drift: exact two-sample Kolmogorov–Smirnov over
# pre-aggregated value counts. Shared by the batch drift query (q46)
# and the streaming drift monitor (streaming/ingest.drift_monitor) so
# the in-stream verdict is definitionally the batch verdict.
# ---------------------------------------------------------------------------


def exact_ks_counts(a_counts: DataFrame, b_counts: DataFrame) -> DataFrame:
    """Exact KS statistic from two (v, cnt) count relations.

    D = max |F_a - F_b| computed entirely in integers via the common-
    denominator form |cum_a*n_b - cum_b*n_a| — no per-row division, so
    the result hashes identically across engines and partitionings.
    The CDF window is ordered over the union of DISTINCT values:
    bounded by the value domain, not by either sample's row count.
    Returns one row: (n_a, n_b, d_num, ks_d, ks_crit, drift) with the
    5% two-sample critical value 1.36*sqrt((n_a+n_b)/(n_a*n_b)).
    """
    from pyspark.sql import Window

    a = a_counts.select(F.col("v"), F.col("cnt").alias("a_at"))
    b = b_counts.select(F.col("v"), F.col("cnt").alias("b_at"))
    byval = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("a_at", F.lit(0)).alias("a_at"),
            F.coalesce("b_at", F.lit(0)).alias("b_at"),
        )
    )
    w_cdf = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = byval.select(
        F.sum("a_at").over(w_cdf).alias("cum_a"),
        F.sum("b_at").over(w_cdf).alias("cum_b"),
        F.sum("a_at").over(w_all).alias("n_a"),
        F.sum("b_at").over(w_all).alias("n_b"),
    )
    agg = cum.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).alias("d_num"),
    )
    # an empty sample makes the test undefined (0/0): NULL out rather
    # than diverge between engines' 0/0 renderings
    den = F.nullif((F.col("n_a") * F.col("n_b")).cast("double"), F.lit(0.0))
    ks_d = F.col("d_num").cast("double") / den
    ks_crit = F.lit(1.36) * F.sqrt((F.col("n_a") + F.col("n_b")).cast("double") / den)
    return agg.select(
        "n_a",
        "n_b",
        "d_num",
        ks_d.alias("ks_d"),
        ks_crit.alias("ks_crit"),
        (ks_d > ks_crit).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Model-in-the-loop quality scoring (the FineWeb-Edu / DCLM pattern):
# distill a cheap heuristic teacher into a trained linear probe whose
# smooth score ranks documents for curation. The training itself is the
# operator — distributed, bit-deterministic fixed-point gradient
# descent, value-oracle-checkable by unrolling the iterations in SQL
# (the `kmeans_assign` precedent for iterative algorithms).
# ---------------------------------------------------------------------------
_PROBE_MICRO = 1_000_000  # fixed-point scale: 1e6 == 1.0


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the semantics BOTH SQL
    engines share (Spark `div`, DuckDB `//` on integers). Python's
    `//` floors instead, which disagrees for negative numerators, so
    the driver-side weight update must use this helper to stay
    bit-identical to the unrolled-SQL oracle."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def quality_probe_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document training row for the quality probe: five exact
    integer features in micro units (1e6 = 1.0) + the heuristic
    teacher label, all built from the oracle-proven d4 stat
    expressions with `div` arithmetic only — no float anywhere, so
    every engine computes byte-identical rows.

    Features: x0 bias; x1 length (tokens capped at 200, /200);
    x2 stopword ratio; x3 type-token ratio (distinct/total tokens —
    the repetition signal Gopher gates on); x4 mean token length
    (capped at 20, /20). Teacher label y (micro): the gopher-flavored
    gate n_tokens >= 40 AND stopword_ratio >= 0.05 — the rule the
    probe distills into a smooth ranking score.

    One narrow projection over the document scan: no shuffle, no UDF;
    at 100 TB this pipelines inside the scan stage."""
    from ..functions.text import STOPWORDS, char_count, marker_hits, token_count

    t = F.col(text_col)
    stats = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars"),
        marker_hits(t, STOPWORDS).alias("n_stop"),
        F.size(F.array_distinct(tokens(t))).cast("long").alias("n_distinct"),
    )
    return stats.selectExpr(
        id_col,
        *keep_cols,
        f"cast({_PROBE_MICRO} as bigint) as x0",
        "least(n_tokens, 200) * cast(5000 as bigint) as x1",
        f"(n_stop * {_PROBE_MICRO}) div greatest(n_tokens, 1) as x2",
        f"(n_distinct * {_PROBE_MICRO}) div greatest(n_tokens, 1) as x3",
        f"least((n_chars * {_PROBE_MICRO}) div greatest(n_tokens, 1), 20 * {_PROBE_MICRO}) div 20 as x4",
        f"cast(case when n_tokens >= 40 and (n_stop * {_PROBE_MICRO}) div greatest(n_tokens, 1) >= 50000"
        f" then {_PROBE_MICRO} else 0 end as bigint) as y",
    )


def train_quality_probe(
    docs: DataFrame,
    iters: int = 5,
    lr_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    train_n: int | None = None,
) -> tuple[list[int], DataFrame]:
    """Train a linear quality probe on the heuristic teacher label by
    full-batch gradient descent on squared loss, entirely in exact
    fixed-point integers, and return (weights_nano, scored corpus).

    Determinism contract (the value-oracle requirement): weights live
    in nano units (1e-9), features/labels in micro units (1e-6); the
    per-row score is z_micro = (Σ w_nano_j · x_micro_j) div 1e9, the
    residual r = z_micro − y_micro, the gradient Σ_rows r·x_j is
    accumulated in DECIMAL(38,0) (exact, partition-order independent),
    and the update w −= g div (lr_den·1000·N) uses truncate-toward-
    zero division — every step reproduces bit-for-bit on any engine
    and any partitioning, so the whole T-round training unrolls into
    plain SQL (registry d47's oracle).

    Scale shape: each round is ONE narrow aggregation over the
    persisted feature relation — map-side partial sums, O(features)
    bytes to the driver per round (the `kmeans_assign` O(k·dim)
    precedent); the final scoring pass is a shuffle-free projection.
    The driver never sees corpus-sized data, and Python-int updates
    cannot overflow at any corpus size (Spark-side sums are decimal-
    exact; only the oracle's BIGINT cast is test-scale-bounded).

    lr = 1/lr_den (default 0.5); squared loss keeps the whole chain
    free of transcendentals — a logistic head would force per-row
    exp() whose engine-specific last-ulp rounding breaks exact value
    parity (the documented d34 trade, avoided here entirely).

    ``train_n``: the 100 TB knob (the `kmeans_assign(sample_n=...)`
    precedent). Full-batch GD costs ``iters`` corpus scans; a probe
    does not need them — train on the ``train_n`` smallest-id
    documents (deterministic: TakeOrderedAndProject, no RNG,
    reproducible on any engine), then score the WHOLE corpus in the
    one final pass. ``train_n=None`` (the default, and the
    oracle-checked config) trains on everything; ``train_n >= N`` is
    exactly equivalent to None by construction (equivalence-tested)."""
    from pyspark import StorageLevel

    feats = quality_probe_features(docs, text_col, id_col, keep_cols).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    train = feats if train_n is None else (
        feats.orderBy(id_col).limit(train_n).persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = train.count()  # sanctioned O(1) driver scalar
    w = [0] * 5
    for _ in range(iters):
        z = " + ".join(f"cast({w[j]} as bigint) * x{j}" for j in range(5))
        r = f"(({z}) div 1000000000) - y"
        g_row = train.selectExpr(
            *[
                f"sum(cast(({r}) * x{j} as decimal(38,0))) as g{j}"
                for j in range(5)
            ]
        ).first()
        w = [
            w[j] - _tdiv(int(g_row[f"g{j}"]), lr_den * 1000 * n)
            for j in range(5)
        ]
    score = _probe_z_expr(w)
    out = feats.selectExpr(
        id_col,
        *keep_cols,
        f"{score} as score_micro",
        f"({score}) >= 500000 as predicted",
        f"(y = {_PROBE_MICRO}) as label",
    )
    if train is not feats:
        train.unpersist(blocking=False)
    feats.unpersist(blocking=False)
    return w, out


def probe_scored_sampling(
    docs: DataFrame,
    lo_cut: int = 350_000,
    hi_cut: int = 600_000,
    iters: int = 20,
    lr_den: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classifier-gated curation sampling — the step FineWeb-Edu runs
    after training its quality classifier: documents the trained probe
    scores above ``hi_cut`` are kept outright, below ``lo_cut`` dropped
    outright, and the band between enters a DETERMINISTIC lottery whose
    acceptance probability rises linearly with the score —
    accept ⇔ u16·(hi−lo) < (score−lo)·65536, the d25 md5-u16 coin in a
    pure integer cross-multiplication (no division, no float, so the
    decision is bit-identical on every engine).

    Soft-banding beats a hard threshold at the boundary: near-cut
    documents keep a proportional survival rate instead of a cliff,
    which preserves distributional smoothness in the curated corpus
    (the reason FineWeb publishes score-bucketed ablations).

    Scale shape: training is `train_quality_probe` (O(features) driver
    state per round); the decision pass is one narrow projection —
    no shuffle, no join (source rides through the feature relation).

    Returns (doc_id, source, score_micro, band, accepted)."""
    _w, scored = train_quality_probe(
        docs, iters=iters, lr_den=lr_den, text_col=text_col, id_col=id_col,
        keep_cols=("source",),
    )
    return probe_banded_decision(scored, lo_cut, hi_cut, id_col)


def probe_banded_decision(
    scored: DataFrame,
    lo_cut: int = 350_000,
    hi_cut: int = 600_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """The d48 keep/lottery/drop banding over ANY probe-scored relation
    (the trainer's own tail or `score_with_probe` with frozen weights) —
    shared so the batch ladder and the incremental ingest plan decide
    bit-identically from the same score."""
    u16 = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
    )
    s = F.col("score_micro")
    span = hi_cut - lo_cut
    band = (
        F.when(s >= hi_cut, F.lit("keep"))
        .when(s < lo_cut, F.lit("drop"))
        .otherwise(F.lit("lottery"))
    )
    accepted = (
        F.when(s >= hi_cut, F.lit(True))
        .when(s < lo_cut, F.lit(False))
        .otherwise(u16 * F.lit(span) < (s - F.lit(lo_cut)) * F.lit(65536))
    )
    return scored.select(
        id_col,
        "source",
        "score_micro",
        band.alias("band"),
        accepted.alias("accepted"),
    )


def _probe_z_expr(weights: list[int]) -> str:
    """The probe's score expression over feature columns x0..x4 —
    shared by training, batch scoring and streaming scoring so all
    three produce bit-identical z_micro for the same weights."""
    terms = " + ".join(f"cast({int(weights[j])} as bigint) * x{j}" for j in range(5))
    return f"(({terms}) div 1000000000)"


def save_probe(spark, path: str, weights: list[int], meta: dict | None = None) -> None:
    """Persist trained probe weights as a tiny ManifestTable — the
    model-registry half of train-once/serve-many: `train_quality_probe`
    runs once over the training corpus, every later batch or STREAM
    scores with the stored weights and never touches the training
    corpus again. Rows are (feature, w_nano) + a params tag; the write
    is an atomic manifest commit (overwrite = new snapshot), so a
    reader never observes a half-updated weight vector."""
    import json

    from .manifest import ManifestTable

    rows = [(j, int(w), json.dumps(meta or {}, sort_keys=True)) for j, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "feature int, w_nano bigint, params string")
    ManifestTable(path).write(df.coalesce(1), mode="overwrite")


def load_probe(spark, path: str) -> list[int]:
    """Read the stored weight vector back (ordered by feature id)."""
    from .manifest import ManifestTable

    rows = ManifestTable(path).read(spark).orderBy("feature").collect()
    return [int(r.w_nano) for r in rows]


def score_with_probe(
    df: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score documents with a TRAINED probe — a stateless narrow
    projection (features + one fixed-point dot product), so the same
    call works identically on a batch DataFrame and a STREAMING one
    (no shuffle, no state, no watermark needed): the streaming quality
    gate that scores documents as they land, serving the weights the
    batch trainer persisted (`save_probe`). Bit-identical to the
    trainer's own scoring tail by construction (shared `_probe_z_expr`
    over the shared feature builder).

    Returns (id, *keep_cols, score_micro, predicted)."""
    feats = quality_probe_features(df, text_col, id_col, keep_cols)
    z = _probe_z_expr(weights)
    return feats.selectExpr(
        id_col,
        *keep_cols,
        f"{z} as score_micro",
        f"({z}) >= 500000 as predicted",
    )
