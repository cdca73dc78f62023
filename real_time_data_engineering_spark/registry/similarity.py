"""Similarity-search queries on `embeddings` (ANN surface).

s1/s2 are parity-checked via integer-quantized dot products (see
operators.similarity); s3 (IVF) is the approximate scale path and is
property-tested against brute force instead of oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.readers import load_table
from . import register

_N_QUERIES = 20

# Shared oracle scaffolding: quantized vectors + exact integer dots.
_QUANT_CTE = f"""
WITH qv AS (
  SELECT vec_id, list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings
), norms AS (
  SELECT v.vec_id, CAST(SUM(u.e * u.e) AS BIGINT) AS norm_q
  FROM qv v, unnest(v.emb) AS u(e)
  GROUP BY 1
  HAVING SUM(u.e * u.e) > 0
), qu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
  FROM qv WHERE vec_id < {_N_QUERIES}
), vu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM qv
), dots AS (
  SELECT q.vec_id AS qid, x.vec_id AS nid, CAST(SUM(q.v * x.v) AS BIGINT) AS dot
  FROM qu q JOIN vu x ON q.i = x.i AND q.vec_id <> x.vec_id
  GROUP BY 1, 2
), scored AS (
  SELECT d.qid, d.nid,
         CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.norm_q AS DOUBLE)) * sqrt(CAST(nv.norm_q AS DOUBLE)))
             AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.qid
  JOIN norms nv ON nv.vec_id = d.nid
), ranked AS (
  SELECT qid, nid, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
  FROM scored
)
"""

_S1_ORACLE = _QUANT_CTE + """
SELECT qid, nid, cosine, rank FROM ranked WHERE rank <= 5
"""


@register("s1_cosine_topk", _S1_ORACLE)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for the first 20 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, F.col("vec_id") < _N_QUERIES, k=5)


_S2_ORACLE = _QUANT_CTE + """
, votes AS (
  SELECT r.qid, e.label AS n_label, COUNT(*) AS votes
  FROM ranked r JOIN embeddings e ON e.vec_id = r.nid
  WHERE r.rank <= 5
  GROUP BY 1, 2
), best AS (
  SELECT qid, n_label, votes,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, n_label ASC) AS rn
  FROM votes
)
SELECT qid, n_label AS predicted_label, votes FROM best WHERE rn = 1
"""


@register("s2_knn_label_vote", _S2_ORACLE)
def s2_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction over exact top-5 neighbors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_label_vote(emb, F.col("vec_id") < _N_QUERIES, k=5)


@register("s3_ivf_topk", None, doc="IVF-partitioned approximate top-k (no SQL oracle; recall property-tested)")
def s3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: probe 2 nearest cells of 10 — the 100 TB path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, F.col("vec_id") < _N_QUERIES, k=5, n_probe=2)


@register(
    "s4_kmeans_clusters",
    None,
    doc="Deterministic Lloyd k-means assignment (iterative algorithm — no "
    "SQL oracle; nearest-centroid + determinism invariants are tested in "
    "tests/test_fuzzy_ops.py).",
)
def s4_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 Lloyd clustering of the embedding corpus (domain discovery /
    IVF coarse-quantizer training)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.kmeans_assign(emb, k=8, max_iter=10)
