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
    grams = toked.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("_toks", 1, F.size("_toks") - 1),
                F.slice("_toks", 2, F.size("_toks") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    agg = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("distinct_grams"),
        F.max("c").alias("max_gram_count"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_grams"),
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

    grams = (
        shingle_exploded(df, n, text_col, id_col)
        .distinct()
        .withColumn("_is_eval", is_eval)
    )
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
