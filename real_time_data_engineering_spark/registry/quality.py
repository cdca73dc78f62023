"""Corpus-quality queries: repetition filtering and PII scrubbing.

Extensions beyond the reference (BASELINE.json north star): the quality
gates a pretraining pipeline runs between dedup and mixing. Both are
oracle-checked — the repetition fractions are single double divisions
of exact counts, and the PII regexes use only Java-regex/RE2-common
syntax so the identical pattern string drives both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    EMAIL_RE,
    IP_RE,
    MIN_GRAMS_FOR_FLAG,
    PHONE_RE,
    TOP_GRAM_FRAC_CUTOFF,
    contamination_stats,
    redact_pii,
    repetition_stats,
)
from ..sources.readers import ensure_min_partitions, load_table
from . import register

# ---------------------------------------------------------------------------
# d12 — Gopher-style repetition statistics over word 2-grams: the most
# frequent 2-gram's share of all 2-grams (top_gram_frac) and the share
# of 2-gram instances occurring more than once (dup_gram_frac); a doc
# is flagged repetitive when top_gram_frac > 0.2 AND it has at least
# 20 2-grams (tiny docs trivially exceed any fraction cutoff).
# ---------------------------------------------------------------------------
_D12_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
), bi AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS gram
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
), cnt AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM bi GROUP BY 1, 2
), agg AS (
  SELECT doc_id,
         SUM(c) AS n_grams,
         COUNT(*) AS distinct_grams,
         MAX(c) AS max_gram_count,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_grams
  FROM cnt GROUP BY 1
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, distinct_grams, max_gram_count,
       CAST(max_gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_gram_frac,
       CAST(dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_gram_frac,
       n_grams >= {MIN_GRAMS_FOR_FLAG}
           AND CAST(max_gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE)
           > {TOP_GRAM_FRAC_CUTOFF} AS is_repetitive
FROM agg
"""


@register("d12_repetition_stats", _D12_ORACLE)
def d12_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-2-gram repetition stats + Gopher-style repetitive flag."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return repetition_stats(docs)


# ---------------------------------------------------------------------------
# d13 — PII redaction. The corpus has no organic PII, so deterministic
# contact strings are injected first (email+IP for doc_id%7==0, phone
# for doc_id%11==0 — both for %77), then scrubbed; the check covers the
# full inject → count → replace → fingerprint path on both engines.
# ---------------------------------------------------------------------------
_INJECT_SQL = (
    "text || CASE WHEN doc_id % 7 = 0 THEN ' contact doc' || CAST(doc_id AS VARCHAR)"
    " || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

_D13_ORACLE = f"""
WITH injected AS (
  SELECT doc_id, {_INJECT_SQL} AS s FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(s, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(s,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IP_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM injected
"""


@register("d13_pii_redaction", _D13_ORACLE)
def d13_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub: per-kind match counts + redacted fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact doc"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call 555-867-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("s"),
    )
    cols = redact_pii("s")
    return injected.select(
        "doc_id",
        cols["n_emails"].alias("n_emails"),
        cols["n_ips"].alias("n_ips"),
        cols["n_phones"].alias("n_phones"),
        F.md5(cols["redacted"]).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# d14 — benchmark decontamination (GPT-3-style n-gram overlap): docs with
# doc_id%19==0 form the "eval set"; every train doc reports the fraction
# of its distinct word 5-grams that occur anywhere in the eval split.
# The corpus's planted duplicates make the distribution bimodal (~0 vs
# 1.0), so the 0.5 cutoff is a real decision boundary.
# ---------------------------------------------------------------------------
_D14_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
), g5 AS (
  SELECT DISTINCT a.doc_id,
         a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS shingle
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  JOIN tok d ON d.doc_id = a.doc_id AND d.i = a.i + 3
  JOIN tok e ON e.doc_id = a.doc_id AND e.i = a.i + 4
), eval_g AS (
  SELECT DISTINCT shingle FROM g5 WHERE doc_id % 19 = 0
), train AS (
  SELECT doc_id, shingle FROM g5 WHERE doc_id % 19 <> 0
), agg AS (
  SELECT t.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
  FROM train t LEFT JOIN eval_g e ON t.shingle = e.shingle
  GROUP BY 1
)
SELECT doc_id, n_grams, CAST(n_overlap AS BIGINT) AS n_overlap,
       CAST(n_overlap AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_frac,
       CAST(n_overlap AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.5 AS is_contaminated
FROM agg
"""


@register("d14_decontamination", _D14_ORACLE)
def d14_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set 5-gram overlap per train doc (broadcast probe)."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_stats(docs, F.col("doc_id") % 19 == 0, n=5, threshold=0.5)


# ---------------------------------------------------------------------------
# d17 — leakage-safe train/val/test split: near-duplicate documents must
# land in the SAME split, or held-out metrics leak training content.
# Split key = the d8-pair connected component's cluster id (singletons
# key on their own doc_id); the deterministic md5 coin then maps the
# KEY, not the doc, to train(12/16) / val(2/16) / test(2/16).
# ---------------------------------------------------------------------------

def _d17_oracle() -> str:
    from .dedup_text import _D8_ORACLE

    return f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({_D8_ORACLE}) p
), edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION
  SELECT d2 AS src, d1 AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), reach AS (
  SELECT node, node AS label FROM nodes
  UNION
  SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
  SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1
), keyed AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_key
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, cluster_key,
       CASE WHEN substr(md5(CAST(cluster_key AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
            WHEN substr(md5(CAST(cluster_key AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
            ELSE 'test' END AS split
FROM keyed
"""


def _register_d17() -> None:
    from ..operators import dedup as D
    from .dedup_text import d8_fingerprint_neardup

    @register("d17_leakage_safe_split", _d17_oracle())
    def d17_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cluster-keyed deterministic split: no near-dup pair straddles
        train/val/test. Components from the d8 pair graph; singleton
        docs key on themselves; one md5 coin per cluster key."""
        docs = load_table(spark, sf_dir, "documents")
        pairs = d8_fingerprint_neardup(spark, sf_dir)
        comp = D.connected_components(pairs, src="d1", dst="d2").select(
            F.col("node").alias("doc_id"), "cluster_id"
        )
        keyed = docs.select("doc_id").join(comp, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_key")
        )
        coin = F.substring(F.md5(F.col("cluster_key").cast("string")), 1, 1)
        return keyed.select(
            "doc_id",
            "cluster_key",
            F.when(coin <= "b", "train").when(coin <= "d", "val").otherwise("test").alias("split"),
        )


_register_d17()


# ---------------------------------------------------------------------------
# d20 — the Gopher rule-set quality gate (the companion to d12's
# repetition rules): token-count window, mean-word-length window,
# alphabetic-word fraction, distinct-stopword evidence. Flags are
# computed from UNROUNDED single-divide doubles (deterministic given
# exact integer counts); the reported fractions are rounded to 9
# decimals purely for display/hash stability.
# ---------------------------------------------------------------------------
_D20_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(length(w)) AS BIGINT) AS sum_len,
         CAST(SUM(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
         CAST(COUNT(DISTINCT CASE WHEN w IN ('the','a','of','and','to','is','in') THEN w END)
              AS BIGINT) AS n_stop
  FROM tok GROUP BY 1
)
SELECT doc_id, n_tokens,
       round(CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS mean_word_len,
       round(CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS alpha_word_frac,
       n_stop AS stopword_hits,
       (n_tokens BETWEEN 20 AND 100000)
           AND (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) BETWEEN 3.0 AND 10.0)
           AND (CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.8)
           AND (n_stop >= 2) AS passes_gopher
FROM agg
"""


@register("d20_gopher_quality", _D20_ORACLE)
def d20_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set verdict per document (see
    operators.quality.gopher_quality_rules)."""
    from ..operators.quality import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_rules(ensure_min_partitions(docs))
