"""Lexical retrieval + hybrid fusion operators — the search side of a
RAG / training-data pipeline (reference parity: the reference ships no
retrieval engine; this extends the LLM-pipeline surface beside the
embedding ANN stack in `operators/similarity`).

* `bm25_scores` — Okapi BM25 (Robertson & Zaragoza 2009), k1/b
  saturation, shared by the literal-query census (d40) and the
  document-as-query hybrid (s10). Parity discipline is d28's: the one
  transcendental (idf's ln) runs on an identical-by-construction
  double and is quantized to DECIMAL at the source; the tf saturation
  factor is one identical IEEE chain quantized to DECIMAL; scores sum
  and RANK as exact decimals (order-independent across any partition
  count).
* `rrf_fuse` — reciprocal-rank fusion (Cormack, Clarke & Buettcher
  2009): score = Σ_lists 1/(K + rank). Engine-exact form: the
  reciprocal is INTEGER floor(1e9/(K + rank)) — Spark's `div` and
  DuckDB's `//` agree for non-negative operands (the d33 fixed-point
  rule) — so fusion is a plain integer sum with no float anywhere.

Scale shape: BM25's only corpus-sized work is one (doc, term)
tokenize + the df/tf aggregations, both keyed on terms restricted to
the broadcast query vocabulary; N and avgdl arrive as driver scalars
(the sanctioned O(1) d24 pattern — a 1-row join would plan a
BroadcastNestedLoopJoin, which the repo-wide plan gate bans). RRF
joins two already-top-K rank lists — metadata-sized by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Standard RRF dampening constant (Cormack et al. use 60).
RRF_K = 60
#: Integer reciprocal scale: floor(1e9 / (K + rank)).
RRF_SCALE = 1_000_000_000


def tokens_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) over lowercased ``[a-z]+`` runs — the shared
    tokenization of the text-analysis family (d26/d38/d40)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("term"),
    )


def corpus_stats(docs: DataFrame, tok: DataFrame) -> tuple[float, float, DataFrame]:
    """(n_docs, avgdl, dl) — the two O(1) BM25 scalars plus the per-doc
    token-length relation (checkpointed: consumed by both the scalar
    fetch and the scoring join)."""
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl")).localCheckpoint(eager=True)
    n_docs = float(docs.count())
    row = dl.agg(F.sum("dl").alias("s"), F.count("*").alias("c")).first()
    avgdl = float(row["s"]) / float(row["c"])
    return n_docs, avgdl, dl


def bm25_scores(
    tok: DataFrame,
    qterms: DataFrame,
    n_docs: float,
    avgdl: float,
    dl: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """Per (query_id, doc_id): exact-decimal BM25 score + matched-term
    count. ``qterms`` is (query_id, term) — a literal query table (d40)
    or the distinct terms of query documents (s10; pass
    ``exclude_self=True`` there so a document never retrieves itself).
    Constants must make the IEEE chain identical on both engines:
    k1=1.2/b=0.75 fold to the exact doubles 2.2 and 0.25 that the SQL
    oracles spell literally."""
    qt = F.broadcast(qterms)
    tf = tok.join(qt, "term")
    if exclude_self:
        tf = tf.filter(F.col("doc_id") != F.col("query_id"))
    tf = tf.groupBy("query_id", "term", "doc_id").agg(F.count("*").alias("tf"))
    dfq = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf = dfq.select(
        "term",
        F.round(
            F.log(
                (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("idf_q"),
    )
    tf_sat = F.round(
        (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl)))
        ),
        9,
    ).cast("decimal(18,9)")
    parts = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .select("query_id", "doc_id", (F.col("idf_q") * tf_sat).alias("p"))
    )
    return parts.groupBy("query_id", "doc_id").agg(
        F.sum("p").alias("score_x"), F.count("*").alias("n_terms_matched")
    )


def rrf_fuse(rank_lists: list[DataFrame], k: int = RRF_K) -> DataFrame:
    """Reciprocal-rank fusion of top-K rank lists, each
    (query_id, doc_id, rank): rrf_score = Σ floor(1e9/(k + rank)),
    docs absent from a list contribute 0 for it. Pure integer
    arithmetic — exact, order-independent, engine-identical (floor
    division over positive operands)."""
    # div semantics: Spark's `/` on longs is a double — use the integer
    # `div` operator so the reciprocal stays exact (and floors like
    # DuckDB's `//` for these positive operands)
    scored = [
        df.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST({RRF_SCALE} AS BIGINT) div (CAST({k} AS BIGINT) + rank)").alias(
                "_part"
            ),
        )
        for df in rank_lists
    ]
    allparts = reduce(DataFrame.unionByName, scored)
    return allparts.groupBy("query_id", "doc_id").agg(
        F.sum("_part").alias("rrf_score"), F.count("*").alias("n_lists")
    )


def bm25_literal_queries(
    spark: SparkSession, query_terms: tuple[tuple[int, str], ...]
) -> DataFrame:
    """A literal (query_id, term) table (d40's fixed query census)."""
    return spark.createDataFrame(list(query_terms), "query_id bigint, term string")
