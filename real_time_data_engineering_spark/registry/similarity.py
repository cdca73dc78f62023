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


# s3's IVF routing and probe are deterministic end-to-end: cell
# centroids are exact integer SUM vectors (affinity = (q·s)/c, one
# float64 divide), probe order ties break on cell ASC, and the in-cell
# scoring is the same quantized-exact cosine as s1 — so the whole
# approximate index is SQL-expressible and oracle-checked, not just
# property-tested.
# The IVF pipeline body, parameterized only by the `qv` CTE that
# provides (vec_id, label, emb) — s3 uses the raw label column as the
# cell, s5 feeds the kmeans-trained cluster in as the label. Split in
# two so s8 can reuse the ROUTING half (through `cand`) with ADC
# scoring over PQ codes instead of the exact-cosine rerank; the query
# count is a parameter so s11 can run the same chain over its 5
# query documents.
def _ivf_route_body(n_queries: int) -> str:
    return f"""), norms AS (
  SELECT v.vec_id, CAST(SUM(u.e * u.e) AS BIGINT) AS norm_q
  FROM qv v, unnest(v.emb) AS u(e)
  GROUP BY 1
  HAVING SUM(u.e * u.e) > 0
), u AS (
  SELECT q.vec_id, q.label, unnest(q.emb) AS v, generate_subscripts(q.emb, 1) AS i
  FROM qv q JOIN norms n ON n.vec_id = q.vec_id
), cent AS (
  SELECT label AS cell, i AS pos, CAST(SUM(v) AS BIGINT) AS s FROM u GROUP BY 1, 2
), cellc AS (
  SELECT label AS cell, COUNT(DISTINCT vec_id) AS c FROM u GROUP BY 1
), aff AS (
  SELECT qq.vec_id AS qid, ct.cell,
         CAST(CAST(SUM(qq.v * ct.s) AS BIGINT) AS DOUBLE) / CAST(MAX(cc.c) AS DOUBLE) AS affinity
  FROM u qq
  JOIN cent ct ON ct.pos = qq.i
  JOIN cellc cc ON cc.cell = ct.cell
  WHERE qq.vec_id < {n_queries}
  GROUP BY 1, 2
), routed AS (
  SELECT qid, cell FROM (
    SELECT qid, cell,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY affinity DESC, cell ASC) AS rn
    FROM aff) WHERE rn <= 2
), cand AS (
  SELECT r.qid, n.vec_id AS nid
  FROM routed r
  JOIN qv v ON v.label = r.cell
  JOIN norms n ON n.vec_id = v.vec_id
  WHERE v.vec_id <> r.qid
)"""


_IVF_ROUTE_BODY = _ivf_route_body(_N_QUERIES)

_IVF_SCORE_TAIL = """, dots AS (
  SELECT cd.qid, cd.nid, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
  FROM cand cd
  JOIN u a ON a.vec_id = cd.qid
  JOIN u b ON b.vec_id = cd.nid AND b.i = a.i
  GROUP BY 1, 2
), scored AS (
  SELECT d.qid, d.nid,
         CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.norm_q AS DOUBLE)) * sqrt(CAST(nv.norm_q AS DOUBLE)))
             AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.qid
  JOIN norms nv ON nv.vec_id = d.nid
)
SELECT qid, nid, cosine, rank FROM (
  SELECT qid, nid, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS BIGINT) AS rank
  FROM scored) WHERE rank <= 5
"""

_IVF_BODY = _IVF_ROUTE_BODY + _IVF_SCORE_TAIL

_S3_ORACLE = """
WITH qv AS (
  SELECT vec_id, label, list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings
""" + _IVF_BODY


@register("s3_ivf_topk", _S3_ORACLE)
def s3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: probe 2 nearest cells of 10 — the 100 TB path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, F.col("vec_id") < _N_QUERIES, k=5, n_probe=2)


def _kmeans_cte(k: int = 8, iters: int = 10) -> str:
    """Generate the Lloyd-iteration CTE chain: ``iters`` update rounds
    unrolled, ending in ``kasg`` (vec_id, cluster, d2) — composable
    into s4's direct read or s5's IVF-over-trained-cells pipeline.

    Every CTE is MATERIALIZED: each round references the previous
    round's centroids twice, so DuckDB's default CTE inlining would
    expand the 10-round chain exponentially (empirically: minutes at
    50 vectors); materialization keeps it linear (~1 s).

    Sound because Spark's early convergence stop is a fixpoint — once
    centroids repeat, every further unrolled round reproduces them — so
    unrolled-N equals converged-at-most-N. Determinism contract mirrored
    exactly: init = k smallest ids, d² tie-break on lowest cluster,
    centroid update = exact int64 quantized sums / (1e6·n), empty
    clusters keep their previous centroid (the COALESCE).
    """
    head = f"""
WITH xu AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
), init_ids AS MATERIALIZED (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS cluster
  FROM embeddings ORDER BY vec_id ASC LIMIT {k}
), cent0 AS MATERIALIZED (
  SELECT ii.cluster, x.i AS pos, x.v AS m
  FROM init_ids ii JOIN xu x ON x.vec_id = ii.vec_id
)"""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""", d{t} AS MATERIALIZED (
  SELECT x.vec_id, c.cluster, SUM((x.v - c.m) * (x.v - c.m)) AS d2
  FROM xu x JOIN cent{t - 1} c ON c.pos = x.i
  GROUP BY 1, 2
), asg{t} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rn
    FROM d{t}) WHERE rn = 1
), nc{t} AS MATERIALIZED (
  SELECT a.cluster, x.i AS pos,
         CAST(CAST(SUM(x.q) AS BIGINT) AS DOUBLE) / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS m_new
  FROM asg{t} a JOIN xu x ON x.vec_id = a.vec_id
  GROUP BY 1, 2
), cent{t} AS MATERIALIZED (
  SELECT p.cluster, p.pos, COALESCE(n.m_new, p.m) AS m
  FROM cent{t - 1} p
  LEFT JOIN nc{t} n ON n.cluster = p.cluster AND n.pos = p.pos
)""")
    tail = f""", dF AS MATERIALIZED (
  SELECT x.vec_id, c.cluster, SUM((x.v - c.m) * (x.v - c.m)) AS d2
  FROM xu x JOIN cent{iters} c ON c.pos = x.i
  GROUP BY 1, 2
), kasg AS MATERIALIZED (
  SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, d2 FROM (
    SELECT vec_id, cluster, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rn
    FROM dF) WHERE rn = 1
)"""
    return head + "".join(rounds) + tail


def _kmeans_oracle(k: int = 8, iters: int = 10) -> str:
    """s4's oracle: the CTE chain + the (vec_id, cluster, dist_sq) read."""
    return _kmeans_cte(k, iters) + """
SELECT vec_id, cluster, round(d2, 9) AS dist_sq FROM kasg
"""


@register(
    "s4_kmeans_clusters",
    _kmeans_oracle(k=8, iters=10),
    doc="Deterministic Lloyd k-means assignment, oracle-checked via the "
    "unrolled-iteration SQL (sound: early stop is a fixpoint). "
    "Nearest-centroid + determinism invariants additionally tested in "
    "tests/test_fuzzy_ops.py.",
)
def s4_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 Lloyd clustering of the embedding corpus (domain discovery /
    IVF coarse-quantizer training)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.kmeans_assign(emb, k=8, max_iter=10)
    # dist_sq's last ulp depends on summation order (numpy pairwise vs
    # SQL fold); 9-decimal rounding on both sides removes engine noise
    # while cluster assignment stays exact-arithmetic deterministic.
    return out.withColumn("dist_sq", F.round("dist_sq", 9))


# s5 composes the two deterministic pieces end-to-end: train the coarse
# quantizer with the unrolled-Lloyd CTE chain, then run the identical
# IVF pipeline with the learned cluster as the cell. Everything the
# composition relies on is already individually exact (s4 assignment,
# s3 routing/probe), so the composite stays oracle-checkable.
_S5_ORACLE = (
    _kmeans_cte(k=10, iters=10)
    + """, qv AS MATERIALIZED (
  SELECT e.vec_id, ka.cluster AS label, list_transform(e.embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings e JOIN kasg ka ON ka.vec_id = e.vec_id
"""
    + _IVF_BODY
)


@register(
    "s5_ivf_topk_kmeans",
    _S5_ORACLE,
    doc="IVF with a REAL trained coarse quantizer: k-means cells (k=10) "
    "instead of the label stand-in — train, bucket, probe 2 cells, exact "
    "rerank. Oracle = unrolled-Lloyd CTEs composed with the IVF SQL.",
)
def s5_ivf_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ANN build-and-query path over trained cells (at scale:
    assignment computed at write time, corpus bucketed by cell, queries
    probe without any corpus shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk_kmeans(emb, F.col("vec_id") < _N_QUERIES, k=5, n_probe=2, n_cells=10)


# ---------------------------------------------------------------------------
# s6 — product quantization (Jégou et al.): per-subspace Lloyd
# codebooks → m-code compression → asymmetric-distance top-k. The
# oracle unrolls the per-subspace Lloyd rounds exactly like s4's CTE
# chain but keyed by (sub, cluster), quantizes the trained codebook
# with floor(x·1e6), and scores with exact int64 LUT sums — the whole
# train→encode→search composite is bit-deterministic on both engines.
# Every CTE is MATERIALIZED (same inlining-blowup reason as s4).
# ---------------------------------------------------------------------------


def _pq_chain(
    k: int = 16,
    iters: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    n_queries: int = 20,
) -> str:
    """The PQ train→encode→LUT CTE chain (pxu … pkasg, qcent, lut),
    WITHOUT a leading WITH or a scoring tail — composable after other
    chains (s8 appends it to the Lloyd-cell CTEs) or wrapped directly
    by `_pq_oracle` for s6's full-corpus scan."""
    head = f"""pxu AS MATERIALIZED (
  SELECT vec_id,
         CAST((generate_subscripts(embedding, 1) - 1) // {sub_dim} AS INT) AS sub,
         CAST((generate_subscripts(embedding, 1) - 1) % {sub_dim} AS INT) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
), pinit AS MATERIALIZED (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cluster
  FROM embeddings ORDER BY vec_id ASC LIMIT {k}
), pcent0 AS MATERIALIZED (
  SELECT x.sub, ii.cluster, x.pos, x.v AS mval
  FROM pinit ii JOIN pxu x ON x.vec_id = ii.vec_id
)"""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""", pd{t} AS MATERIALIZED (
  SELECT x.vec_id, x.sub, c.cluster, SUM((x.v - c.mval) * (x.v - c.mval)) AS d2
  FROM pxu x JOIN pcent{t - 1} c ON c.sub = x.sub AND c.pos = x.pos
  GROUP BY 1, 2, 3
), pasg{t} AS MATERIALIZED (
  SELECT vec_id, sub, cluster FROM (
    SELECT vec_id, sub, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cluster ASC) AS rn
    FROM pd{t}) WHERE rn = 1
), pnc{t} AS MATERIALIZED (
  SELECT a.sub, a.cluster, x.pos,
         CAST(CAST(SUM(x.q) AS BIGINT) AS DOUBLE) / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS m_new
  FROM pasg{t} a JOIN pxu x ON x.vec_id = a.vec_id AND x.sub = a.sub
  GROUP BY 1, 2, 3
), pcent{t} AS MATERIALIZED (
  SELECT p.sub, p.cluster, p.pos, COALESCE(n.m_new, p.mval) AS mval
  FROM pcent{t - 1} p
  LEFT JOIN pnc{t} n ON n.sub = p.sub AND n.cluster = p.cluster AND n.pos = p.pos
)""")
    tail = f""", pdF AS MATERIALIZED (
  SELECT x.vec_id, x.sub, c.cluster, SUM((x.v - c.mval) * (x.v - c.mval)) AS d2
  FROM pxu x JOIN pcent{iters} c ON c.sub = x.sub AND c.pos = x.pos
  GROUP BY 1, 2, 3
), pkasg AS MATERIALIZED (
  SELECT vec_id, sub, cluster FROM (
    SELECT vec_id, sub, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cluster ASC) AS rn
    FROM pdF) WHERE rn = 1
), qcent AS MATERIALIZED (
  SELECT sub, cluster, pos, CAST(floor(mval * 1000000.0) AS BIGINT) AS cq
  FROM pcent{iters}
), lut AS MATERIALIZED (
  SELECT x.vec_id AS qid, x.sub, c.cluster,
         CAST(SUM((x.q - c.cq) * (x.q - c.cq)) AS BIGINT) AS dist
  FROM pxu x JOIN qcent c ON c.sub = x.sub AND c.pos = x.pos
  WHERE x.vec_id < {n_queries}
  GROUP BY 1, 2, 3
)"""
    return head + "".join(rounds) + tail


def _pq_oracle(
    k: int = 16,
    iters: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    n_queries: int = 20,
    topk: int = 5,
) -> str:
    return (
        "\nWITH "
        + _pq_chain(k, iters, m, sub_dim, n_queries)
        + f""", pscored AS (
  SELECT l.qid, g.vec_id AS nid, CAST(SUM(l.dist) AS BIGINT) AS est_dist
  FROM pkasg g JOIN lut l ON l.sub = g.sub AND l.cluster = g.cluster
  WHERE g.vec_id <> l.qid
  GROUP BY 1, 2
)
SELECT qid, nid, est_dist, rank FROM (
  SELECT qid, nid, est_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS BIGINT) AS rank
  FROM pscored) WHERE rank <= {topk}
"""
    )


@register(
    "s6_pq_topk",
    _pq_oracle(k=16, iters=5, m=8, sub_dim=8, n_queries=_N_QUERIES, topk=5),
    doc="Product-quantization ANN: per-subspace Lloyd codebooks (8 "
    "subspaces × 16 centroids), vectors compressed to 8 codes, "
    "asymmetric-distance top-k via an exact-int64 broadcast LUT — the "
    "memory-side ANN path at 100 TB (the codes relation is ~8 bytes per "
    "vector). Oracle = per-subspace unrolled-Lloyd CTEs composed with "
    "the quantized LUT scoring; planted-duplicate recall is "
    "property-tested in tests/test_fuzzy_ops.py.",
)
def s6_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8×16 PQ codebooks, encode the corpus, answer the standard
    20-query top-5 by asymmetric distance over codes only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_adc_topk(emb, F.col("vec_id") < _N_QUERIES, m=8, k=16, max_iter=5, topk=5)


# ---------------------------------------------------------------------------
# s7 — ANN quality evaluation: recall@5 of the IVF index against the
# exact brute-force answer, per query. The metric every production ANN
# deployment tracks before trading exactness for speed; at 100 TB it is
# computed on a sampled query set exactly like this 20-query block.
# Oracle = the s1 and s3 oracles composed (both already hash-verified
# on their own rows), so the recall numbers are exact by construction.
# ---------------------------------------------------------------------------
_S7_ORACLE = (
    "WITH exact AS MATERIALIZED (\n  SELECT qid, nid FROM (\n"
    + _S1_ORACLE
    + "\n) ex\n), approx AS MATERIALIZED (\n  SELECT qid, nid FROM (\n"
    + _S3_ORACLE
    + "\n) ap\n)\n"
    + """
SELECT ap.qid,
       CAST(COUNT(e.nid) AS BIGINT) AS n_hits,
       CAST(COUNT(e.nid) AS DOUBLE) / 5.0 AS recall_at_5
FROM approx ap
LEFT JOIN exact e ON e.qid = ap.qid AND e.nid = ap.nid
GROUP BY 1
"""
)


@register(
    "s7_ann_recall",
    _S7_ORACLE,
    doc="Recall@5 of the IVF route-and-probe path vs exact brute force, "
    "per query — the accuracy/speed dial every ANN index is tuned by. "
    "Both sides reuse already-oracle-verified building blocks (s1, s3).",
)
def s7_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of IVF(n_probe=2) against exact top-5."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, F.col("vec_id") < _N_QUERIES, k=5).select("qid", "nid")
    approx = S.ivf_topk(emb, F.col("vec_id") < _N_QUERIES, k=5, n_probe=2).select("qid", "nid")
    hits = approx.join(exact.withColumn("_hit", F.lit(1)), ["qid", "nid"], "left")
    return (
        hits.groupBy("qid")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(5.0)).alias("recall_at_5"),
        )
    )


# ---------------------------------------------------------------------------
# s8 — IVF-PQ (the FAISS `IVFxx,PQyy` index): coarse k-means routing
# composed with asymmetric-distance scoring over PQ CODES. s5 reranks
# probed candidates against raw vectors; s8's probe touches only the
# codes relation (m small ints per vector) plus the per-query m·k LUT
# — the memory-side configuration every 100 TB ANN deployment runs.
# Oracle = the three already-verified chains composed: unrolled-Lloyd
# cells (s4/s5), the PQ train→encode→LUT chain (s6), and the IVF
# routing body (s3/s5), with ADC scoring restricted to routed-cell
# candidates. Everything is exact-int deterministic end to end.
# ---------------------------------------------------------------------------
def _s8_chain(n_queries: int, qv_where: str = "") -> str:
    """The full IVF-PQ oracle chain (Lloyd cells + PQ codebooks + IVF
    routing + ADC scoring), ending at the CTE ``s8scored``
    (qid, nid, est_dist) — wrapped directly by `_S8_ORACLE`'s top-5
    read, and composed by s11 into the hybrid-fusion oracle.

    ``qv_where`` filters the SERVED corpus (routing stats + candidates)
    while both quantizer trainings stay full-corpus — exactly the state
    of a written index after `forget_from_ivfpq_index` with an exact
    routing decrement (s18's erasure semantics: codes gone, routing
    sums decremented, trained quantizers frozen)."""
    return (
        _kmeans_cte(k=10, iters=10)
        + ", "
        + _pq_chain(k=16, iters=5, m=8, sub_dim=8, n_queries=n_queries)
        + f""", qv AS MATERIALIZED (
  SELECT e.vec_id, ka.cluster AS label, list_transform(e.embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings e JOIN kasg ka ON ka.vec_id = e.vec_id
  {qv_where}
"""
        + _ivf_route_body(n_queries)
        + """, s8scored AS (
  SELECT cd.qid, cd.nid, CAST(SUM(l.dist) AS BIGINT) AS est_dist
  FROM cand cd
  JOIN pkasg g ON g.vec_id = cd.nid
  JOIN lut l ON l.qid = cd.qid AND l.sub = g.sub AND l.cluster = g.cluster
  GROUP BY 1, 2
)"""
    )


_S8_ORACLE = (
    _s8_chain(_N_QUERIES)
    + """
SELECT qid, nid, est_dist, rank FROM (
  SELECT qid, nid, est_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS BIGINT) AS rank
  FROM s8scored) WHERE rank <= 5
"""
)


@register(
    "s8_ivfpq_topk",
    _S8_ORACLE,
    doc="IVF-PQ composite index (FAISS IVF10,PQ8x16 analogue): k-means "
    "cell routing (probe 2 of 10) + asymmetric-distance top-5 over PQ "
    "codes only — candidates never touch the raw vector column. Oracle "
    "composes the s4 Lloyd chain, the s6 PQ chain and the s3 routing "
    "body; exact-int deterministic throughout.",
)
def s8_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route queries to 2 of 10 trained cells, score candidates by PQ
    codes (8 subspaces x 16 centroids), return top-5 per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivfpq_topk(
        emb,
        F.col("vec_id") < _N_QUERIES,
        topk=5,
        n_probe=2,
        n_cells=10,
        m=8,
        k_codes=16,
        pq_iter=5,
        km_iter=10,
    )


# ---------------------------------------------------------------------------
# s9 — SemDeDup (Abbas et al. 2023): semantic deduplication made
# sub-quadratic by comparing embeddings only WITHIN k-means clusters —
# the embedding-space sibling of d19's LSH-then-rerank ladder and the
# operator the paper runs over LAION/web corpora before training.
# Oracle = the already-verified unrolled-Lloyd chain (s4/s5/s8) feeding
# the d7-style exact quantized-cosine pair check, restricted to
# same-cluster pairs, with min-id representative election (d16's keeper
# convention). Everything is exact-int/IEEE-identical end to end.
# ---------------------------------------------------------------------------
# the within-cluster pair-check tail is shared verbatim by s9 (pinned
# k=10, the literal-k oracle) and s17 (auto-k: k derived from N inside
# the SQL itself) — only the Lloyd chain's k differs.
_S9_TAIL = """, sq AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings
), snorm AS MATERIALIZED (
  SELECT v.vec_id, CAST(SUM(u.e * u.e) AS BIGINT) AS norm_q
  FROM sq v, unnest(v.emb) AS u(e)
  GROUP BY 1
  HAVING SUM(u.e * u.e) > 0
), su AS MATERIALIZED (
  SELECT q.vec_id, k.cluster, unnest(q.emb) AS v, generate_subscripts(q.emb, 1) AS i
  FROM sq q
  JOIN kasg k ON k.vec_id = q.vec_id
  JOIN snorm n ON n.vec_id = q.vec_id
), sdots AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
  FROM su a JOIN su b ON a.cluster = b.cluster AND a.i = b.i AND b.vec_id < a.vec_id
  GROUP BY 1, 2
), sclose AS (
  SELECT d.a_id, d.b_id
  FROM sdots d
  JOIN snorm na ON na.vec_id = d.a_id
  JOIN snorm nb ON nb.vec_id = d.b_id
  WHERE CAST(d.dot AS DOUBLE)
        / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) >= 0.35
), sdup AS (
  SELECT a_id, MIN(b_id) AS dup_of FROM sclose GROUP BY 1
)
SELECT k.vec_id, CAST(k.cluster AS INTEGER) AS cluster,
       (d.dup_of IS NOT NULL) AS is_dup, d.dup_of
FROM kasg k
JOIN snorm n ON n.vec_id = k.vec_id
LEFT JOIN sdup d ON d.a_id = k.vec_id
"""

_S9_ORACLE = _kmeans_cte(k=10, iters=10) + _S9_TAIL


@register(
    "s9_semdedup",
    _S9_ORACLE,
    doc="SemDeDup semantic dedup: k-means-bucketed within-cluster exact "
    "quantized-cosine pairs (threshold 0.35), min-id representative "
    "election — the sub-quadratic embedding-dedup ladder the paper "
    "runs before training. Oracle composes the unrolled-Lloyd chain "
    "with the d7 pair check restricted to same-cluster pairs.",
)
def s9_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per vector: cluster, is-semantic-duplicate verdict, and the
    kept representative (smallest lower-id cluster-mate above the
    cosine threshold). k=10 is PINNED here because the unrolled-Lloyd
    oracle must train the same quantizer; production calls pass
    ``target_cell_rows`` instead, which derives k = ceil(N/target) so
    pair work stays ~N·target (linear) — the SemDeDup-paper k∝N
    convention, equivalence- and scale-tested in
    tests/test_fuzzy_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semdedup(emb, k=10, max_iter=10, threshold=0.35)


# ---------------------------------------------------------------------------
# s10 — hybrid retrieval: BM25 (lexical) + exact cosine (dense) fused
# with reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
# standard RAG retrieval stack (every production search today runs
# lexical+dense hybrid). Queries are DOCUMENTS (doc_id/vec_id share the
# corpus id space): the dense list is the query vector's exact top-20
# cosine neighbors (s1 logic), the lexical list is BM25 over the query
# document's distinct terms (d40's scorer, self-excluded), and fusion
# is the exact-integer reciprocal floor(1e9/(60+rank)) sum — Spark
# `div` == DuckDB `//` on positive operands, so the fused ranking is
# engine-identical with no float anywhere.
# ---------------------------------------------------------------------------
_S10_N_QUERIES = 5

# The lexical half (BM25 over the query documents' distinct terms,
# ranked top-20 per query) and the integer-RRF fusion tail are shared
# verbatim between s10 (exact dense list) and s11 (ANN dense list from
# the persisted IVF-PQ index) — only the dense rank list differs.
_LEX_CTES = f""", htok AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), hdl AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM htok GROUP BY 1
), hstats AS MATERIALIZED (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM hdl
), hq AS MATERIALIZED (
  SELECT DISTINCT doc_id AS query_id, term FROM htok WHERE doc_id < {_S10_N_QUERIES}
), htf AS MATERIALIZED (
  SELECT q.query_id, q.term, t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM htok t JOIN hq q ON q.term = t.term AND t.doc_id <> q.query_id
  GROUP BY 1, 2, 3
), hdfq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM htok
  WHERE term IN (SELECT DISTINCT term FROM hq) GROUP BY 1
), hidf AS (
  SELECT d.term,
         CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
              AS DECIMAL(18,6)) AS idf_q
  FROM hdfq d CROSS JOIN hstats s
), hparts AS (
  SELECT f.query_id, f.doc_id,
         i.idf_q * CAST(round((CAST(f.tf AS DOUBLE) * 2.2)
             / (CAST(f.tf AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE) / s.avgdl))), 9)
           AS DECIMAL(18,9)) AS p
  FROM htf f
  JOIN hdl d ON d.doc_id = f.doc_id
  JOIN hidf i ON i.term = f.term
  CROSS JOIN hstats s
), hbagg AS (
  SELECT query_id, doc_id, SUM(p) AS score_x FROM hparts GROUP BY 1, 2
), hblist AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score_x DESC, doc_id ASC
           ) AS BIGINT) AS rank
    FROM hbagg) WHERE rank <= 20
)"""


def _rrf_fused_ctes(dense_ranked: str, pre: str) -> str:
    """The fusion as composable CTEs under a name prefix: RRF-fuse a
    (qid, nid, rank) dense rank list (passed as a SQL snippet,
    top-20-bounded here) with `hblist`, exact integer reciprocal,
    ending at ``{pre}top`` — (query_id, doc_id, rrf_score, n_lists,
    rank). Prefixing lets one oracle fuse TWO dense lists against the
    same lexical list (s13's recall comparison)."""
    return f""", {pre}pl AS (
  SELECT qid AS query_id, nid AS doc_id,
         CAST(1000000000 // (60 + rank) AS BIGINT) AS p
  FROM ({dense_ranked}) dns WHERE rank <= 20
  UNION ALL
  SELECT query_id, doc_id, CAST(1000000000 // (60 + rank) AS BIGINT) AS p
  FROM hblist
), {pre}fused AS (
  SELECT query_id, doc_id, CAST(SUM(p) AS BIGINT) AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM {pre}pl GROUP BY 1, 2
), {pre}top AS (
  SELECT query_id, doc_id, rrf_score, n_lists,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM {pre}fused
)"""


def _rrf_tail(dense_ranked: str) -> str:
    """Fusion tail: the fused CTEs plus the top-10 read (s10/s11's
    final relation)."""
    return (
        _rrf_fused_ctes(dense_ranked, "h")
        + """
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_score, n_lists, rank
FROM htop WHERE rank <= 10
"""
    )


# The exact-cosine dense chain (the s1 kernel as SQL), ending at
# ``hranked`` (qid, nid, rank) — shared by s10's oracle and s13's
# recall comparison. No leading WITH so it composes after other chains.
_S1_DENSE_CTES = f"""hqv AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings
), hnorms AS MATERIALIZED (
  SELECT v.vec_id, CAST(SUM(u.e * u.e) AS BIGINT) AS norm_q
  FROM hqv v, unnest(v.emb) AS u(e)
  GROUP BY 1
  HAVING SUM(u.e * u.e) > 0
), hqu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
  FROM hqv WHERE vec_id < {_S10_N_QUERIES}
), hvu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM hqv
), hdots AS MATERIALIZED (
  SELECT q.vec_id AS qid, x.vec_id AS nid, CAST(SUM(q.v * x.v) AS BIGINT) AS dot
  FROM hqu q JOIN hvu x ON q.i = x.i AND q.vec_id <> x.vec_id
  GROUP BY 1, 2
), hranked AS (
  SELECT qid, nid,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.norm_q AS DOUBLE)) * sqrt(CAST(nv.norm_q AS DOUBLE))) DESC,
             nid ASC) AS BIGINT) AS rank
  FROM hdots d
  JOIN hnorms nq ON nq.vec_id = d.qid
  JOIN hnorms nv ON nv.vec_id = d.nid
)"""

_S10_ORACLE = (
    "WITH "
    + _S1_DENSE_CTES
    + "\n"
    + _LEX_CTES
    + _rrf_tail("SELECT qid, nid, rank FROM hranked")
)


@register(
    "s10_hybrid_rrf",
    _S10_ORACLE,
    doc="Hybrid lexical+dense retrieval: BM25 over the query document's "
    "terms fused with its exact cosine top-20 by reciprocal-rank "
    "fusion (integer floor(1e9/(60+rank)) — no float in the fused "
    "ranking). The production RAG retrieval stack; oracle composes "
    "the verified s1 cosine chain with the d40 BM25 scorer.",
)
def s10_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query document after RRF-fusing its BM25 and cosine
    top-20 lists (documents and embeddings share the id space)."""
    from ..sources.readers import ensure_min_partitions

    emb = load_table(spark, sf_dir, "embeddings")
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    dense = S.cosine_topk(emb, F.col("vec_id") < _S10_N_QUERIES, k=20).select(
        F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank"
    )
    return _fuse_with_lexical(spark, docs, dense, _S10_N_QUERIES)


def _lexical_top20(spark: SparkSession, docs: DataFrame, n_queries: int) -> DataFrame:
    """The shared lexical list: BM25 over each query document's
    distinct terms (self excluded), top-20 per query."""
    from pyspark.sql import Window

    from ..operators.retrieval import bm25_scores, corpus_stats, tokens_df

    tok = tokens_df(docs)
    n_docs, avgdl, dl = corpus_stats(docs, tok)
    qterms = (
        tok.filter(F.col("doc_id") < n_queries)
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
        .localCheckpoint(eager=True)  # tiny; consumed by tf AND df joins
    )
    lex_scores = bm25_scores(tok, qterms, n_docs, avgdl, dl, exclude_self=True)
    wl = Window.partitionBy("query_id").orderBy(F.desc("score_x"), F.asc("doc_id"))
    return (
        lex_scores.withColumn("rank", F.row_number().over(wl).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )


def _fuse_lists(dense: DataFrame, lex: DataFrame) -> DataFrame:
    """RRF-fuse a (query_id, doc_id, rank) dense list with a lexical
    rank list, exact integer reciprocal, top-10 per query."""
    from pyspark.sql import Window

    from ..operators.retrieval import rrf_fuse

    fused = rrf_fuse([dense, lex])
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rrf_score", "n_lists", "rank")
    )


def _fuse_with_lexical(
    spark: SparkSession, docs: DataFrame, dense: DataFrame, n_queries: int
) -> DataFrame:
    """`_fuse_lists` against the shared BM25 lexical top-20."""
    return _fuse_lists(dense, _lexical_top20(spark, docs, n_queries))


# ---------------------------------------------------------------------------
# s11 — the 100 TB form of s10: identical RRF fusion, but the DENSE
# list comes from the PERSISTED IVF-PQ index (`operators/ann_index`) —
# routed through stored centroids, scored over PQ codes only, unprobed
# cells' files unread — instead of s1's exact brute-force fan-out.
# This is the production hybrid-retrieval plan: the lexical side's
# corpus work is bounded by the broadcast query vocabulary, the dense
# side's by |probed cells|, and fusion is metadata-sized. The index is
# deterministic end to end (disk ≡ in-memory ≡ the s8 oracle chain,
# equivalence-tested in tests/test_ann_index.py), so the whole hybrid
# stays VALUE-oracled: the SQL composes the verified s8 chain (dense),
# the d40 BM25 scorer (lexical) and the integer-RRF tail.
# Recall-vs-exact is measured against s10 (the s7 precedent) in
# tests/test_fuzzy_ops.py.
# ---------------------------------------------------------------------------
_S11_ORACLE = (
    _s8_chain(_S10_N_QUERIES)
    + _LEX_CTES
    + _rrf_tail(
        """SELECT qid, nid,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS BIGINT) AS rank
     FROM s8scored"""
    )
)


@register(
    "s11_hybrid_rrf_ann",
    _S11_ORACLE,
    doc="ANN-backed hybrid retrieval: BM25 lexical top-20 fused (integer "
    "RRF) with the dense top-20 served by the PERSISTED IVF-PQ index — "
    "probes read only routed cells' code files, no raw-vector scan. "
    "Oracle composes the verified s8 IVF-PQ chain with the d40 BM25 "
    "scorer; value-checkable because the index is deterministic.",
)
def s11_hybrid_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query document after RRF-fusing BM25 with the IVF-PQ
    index's ADC top-20 (documents and embeddings share the id space)."""
    from ..operators.ann_index import ivfpq_index_topk, write_ivfpq_index
    from ..sources.readers import ensure_min_partitions
    from . import work_dir

    emb = load_table(spark, sf_dir, "embeddings")
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    # the persistent index builds ONCE per (corpus, params) and is
    # reused fingerprint-gated across calls (`skip_if_current`): the
    # build is deterministic, so a current index is value-identical to
    # the rebuild it skips — the production write-once/serve-many
    # shape. A corpus or parameter change rebuilds automatically.
    path = work_dir("s11_ivfpq", sf_dir)
    write_ivfpq_index(
        emb, path, n_cells=10, m=8, k_codes=16, pq_iter=5, km_iter=10,
        skip_if_current=True,
    )
    queries = emb.filter(F.col("vec_id") < _S10_N_QUERIES)
    dense = ivfpq_index_topk(
        spark, path, queries, topk=20, n_probe=2, exclude_self=True
    ).select(F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank")
    return _fuse_with_lexical(spark, docs, dense, _S10_N_QUERIES)


# ---------------------------------------------------------------------------
# s12 — IVF index cell-health census: the maintenance signal the
# append path documents ("monitor per-cell counts; retrain when drift
# crosses policy" — operators/ann_index.append_to_ivfpq_index, the
# FAISS re-cluster trade). Per trained cell: member count, share of
# the corpus, and the overfull flag (n·k > 2·N — integer
# cross-multiplication, no float in the decision) that says routing
# has gone lopsided enough that probes stop pruning. Deterministic
# end to end (the s4 Lloyd contract), so the census is fully
# value-oracled by the unrolled-Lloyd chain; N arrives as the
# sanctioned O(1) driver scalar (a 1-row join would plan the banned
# BNLJ). At scale this runs off the persisted index's routing stats
# (`_routing_stats` — same (cluster, c) relation) without touching
# vectors at all.
# ---------------------------------------------------------------------------
_S12_ORACLE = (
    _kmeans_cte(k=10, iters=10)
    + """, s12cc AS (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM kasg GROUP BY 1
), s12tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM kasg
)
SELECT c.cluster, c.n_vectors,
       CAST(c.n_vectors AS DOUBLE) / CAST(t.n AS DOUBLE) AS share,
       (c.n_vectors * 10 > 2 * t.n) AS overfull
FROM s12cc c CROSS JOIN s12tot t
"""
)


@register(
    "s12_index_cell_health",
    _S12_ORACLE,
    doc="IVF cell-balance census over the trained coarse quantizer "
    "(k=10): per-cell count, corpus share, and the integer-exact "
    "overfull flag (n*k > 2*N) — the drift signal that schedules an "
    "index retrain after appends (the FAISS re-cluster policy). "
    "Oracle = the unrolled-Lloyd chain + counts; N is the sanctioned "
    "O(1) driver scalar.",
)
def s12_index_cell_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per trained cell: (cluster, n_vectors, share, overfull)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign = S.kmeans_assign(emb, k=10, max_iter=10).select("vec_id", "cluster")
    counts = assign.groupBy("cluster").agg(F.count("*").alias("n_vectors"))
    # kmeans_assign assigns EVERY input row, so N is the cheap parquet
    # metadata count — never a second pass through the assignment kernel
    n = emb.count()  # O(1) driver scalar (d24 precedent)
    return counts.select(
        "cluster",
        "n_vectors",
        (F.col("n_vectors").cast("double") / F.lit(float(n))).alias("share"),
        (F.col("n_vectors") * F.lit(10) > F.lit(2 * n)).alias("overfull"),
    )


# ---------------------------------------------------------------------------
# s13 — ANN-hybrid retrieval quality, REGISTERED (the s7 precedent
# promoted to the hybrid stack): per query, recall@10 of the
# index-served hybrid (s11: IVF-PQ dense list) against the exact
# hybrid (s10: brute-force cosine dense list). Both engines compose
# the same three verified chains — the s8 IVF-PQ oracle, the s1 exact
# cosine oracle and the d40 BM25 lexical oracle — fuse each dense list
# against the SAME lexical list with the integer-RRF tail, and count
# the top-10 overlap, so the measurement itself is fully value-oracled
# (deterministic index ⇒ deterministic recall). This is the number an
# operator watches when tuning n_probe / n_cells against quality.
# ---------------------------------------------------------------------------
_S13_ORACLE = (
    _s8_chain(_S10_N_QUERIES)
    + ",\n"
    + _S1_DENSE_CTES
    + "\n"
    + _LEX_CTES
    + _rrf_fused_ctes("SELECT qid, nid, rank FROM hranked", "ex")
    + _rrf_fused_ctes(
        """SELECT qid, nid,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS BIGINT) AS rank
     FROM s8scored""",
        "an",
    )
    + """
SELECT CAST(e.query_id AS BIGINT) AS query_id,
       CAST(COUNT(a.doc_id) AS BIGINT) AS n_hits,
       CAST(COUNT(a.doc_id) AS DOUBLE) / 10.0 AS recall_at_10
FROM (SELECT query_id, doc_id FROM extop WHERE rank <= 10) e
LEFT JOIN (SELECT query_id, doc_id FROM antop WHERE rank <= 10) a
  ON a.query_id = e.query_id AND a.doc_id = e.doc_id
GROUP BY e.query_id
"""
)


@register(
    "s13_hybrid_ann_recall",
    _S13_ORACLE,
    doc="Per-query recall@10 of the ANN-backed hybrid (s11's IVF-PQ "
    "dense list) against the exact hybrid (s10's brute-force dense "
    "list), both fused against the SAME lexical list — the quality "
    "dial for n_probe/n_cells, value-oracled because every chain in "
    "the comparison is deterministic.",
)
def s13_hybrid_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_hits, recall_at_10) of ANN-hybrid vs exact-hybrid."""
    from ..operators.ann_index import ivfpq_index_topk, write_ivfpq_index
    from ..sources.readers import ensure_min_partitions
    from . import work_dir

    emb = load_table(spark, sf_dir, "embeddings")
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    # the expensive lexical list is computed ONCE and fused twice
    lex = _lexical_top20(spark, docs, _S10_N_QUERIES).localCheckpoint(eager=True)
    dense_exact = S.cosine_topk(emb, F.col("vec_id") < _S10_N_QUERIES, k=20).select(
        F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank"
    )
    # same per-corpus index path + parameters as s11 (deterministic ⇒
    # identical content whichever registered query writes it), reused
    # fingerprint-gated instead of retrained per call
    path = work_dir("s11_ivfpq", sf_dir)
    write_ivfpq_index(
        emb, path, n_cells=10, m=8, k_codes=16, pq_iter=5, km_iter=10,
        skip_if_current=True,
    )
    queries = emb.filter(F.col("vec_id") < _S10_N_QUERIES)
    dense_ann = ivfpq_index_topk(
        spark, path, queries, topk=20, n_probe=2, exclude_self=True
    ).select(F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank")
    exact10 = _fuse_lists(dense_exact, lex).select("query_id", "doc_id")
    ann10 = _fuse_lists(dense_ann, lex).select(
        "query_id", "doc_id", F.lit(1).alias("_hit")
    )
    return (
        exact10.join(ann10, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").cast("long").alias("n_hits"),
            (F.count("_hit").cast("double") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# s14 — IVF-PQ search with an exact rerank stage (the FAISS
# `IndexRefineFlat` wrapper): the persisted index shortlists top-25
# candidates per query by ADC over codes, then the refine stage
# recomputes the EXACT quantized squared-L2 for just those 25 against
# the raw vector table and keeps the exact top-5. This is the standard
# production recall knob — ADC's PQ quantization error reorders
# near-ties, and a bounded exact pass (|queries|·k·refine vectors, never
# the corpus) repairs it. Oracle = the verified s8 chain shortlisted at
# rank ≤ 25, re-scored with the exact int64 fold over the quantized
# components (the same xu relation the Lloyd chain already built), so
# the whole two-stage composition stays fully value-oracled.
# ---------------------------------------------------------------------------
_S14_ORACLE = (
    _s8_chain(_N_QUERIES)
    + """, s14cand AS MATERIALIZED (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS rn
    FROM s8scored) WHERE rn <= 25
), s14d AS MATERIALIZED (
  SELECT c.qid, c.nid, CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS exact_dist
  FROM s14cand c
  JOIN xu a ON a.vec_id = c.qid
  JOIN xu b ON b.vec_id = c.nid AND b.i = a.i
  GROUP BY 1, 2
)
SELECT qid, nid, exact_dist, rank FROM (
  SELECT qid, nid, exact_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY exact_dist ASC, nid ASC) AS BIGINT) AS rank
  FROM s14d) WHERE rank <= 5
"""
)


@register(
    "s14_ivfpq_refine",
    _S14_ORACLE,
    doc="IVF-PQ + exact rerank (FAISS IndexRefineFlat analogue): the "
    "persisted index's ADC top-25 shortlist per query, re-scored with "
    "the exact quantized squared-L2 against the raw vector table, "
    "exact top-5 kept. Oracle composes the verified s8 chain with the "
    "int64 refine fold; recall-vs-ADC is property-tested.",
)
def s14_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per query from the persisted IVF-PQ index after exact
    rerank of its ADC top-25 shortlist (refine_factor=5, n_probe=2)."""
    from ..operators.ann_index import ivfpq_index_topk_refined, write_ivfpq_index
    from . import work_dir

    emb = load_table(spark, sf_dir, "embeddings")
    # same per-corpus path + parameters as s11/s13: the build is
    # deterministic in (corpus, params), so `skip_if_current` reuses a
    # current index instead of retraining both quantizers per call —
    # the production write-once/serve-many shape, fingerprint-gated
    path = work_dir("s11_ivfpq", sf_dir)
    write_ivfpq_index(
        emb, path, n_cells=10, m=8, k_codes=16, pq_iter=5, km_iter=10,
        skip_if_current=True,
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivfpq_index_topk_refined(
        spark, path, queries, emb, topk=5, refine_factor=5, n_probe=2,
        exclude_self=True,
    )


# ---------------------------------------------------------------------------
# s15 — hardest-positive / hardest-negative triplet mining: the batch
# construction step every contrastive / metric-learning pipeline runs
# over its corpus (FaceNet hard mining; bi-encoder hard negatives).
# Per anchor: the same-label vector it is FURTHEST from (hardest
# positive), the different-label vector it is CLOSEST to (hardest
# negative), and the triplet-margin verdict. Oracle extends the
# verified s1 quantized-cosine chain with label joins and two ranked
# top-1 windows; the margin is one double subtraction + literal
# compare — deterministic on both engines.
# ---------------------------------------------------------------------------
_S15_ORACLE = (
    _QUANT_CTE
    + """, tlab AS (
  SELECT vec_id, label FROM embeddings
), tsc AS MATERIALIZED (
  SELECT s.qid, lq.label AS q_label, s.nid, ln.label AS n_label, s.cosine
  FROM scored s
  JOIN tlab lq ON lq.vec_id = s.qid
  JOIN tlab ln ON ln.vec_id = s.nid
), tpos AS (
  SELECT qid, nid AS pos_id, cosine AS pos_cos FROM (
    SELECT qid, nid, cosine,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine ASC, nid ASC) AS rn
    FROM tsc WHERE q_label = n_label) WHERE rn = 1
), tneg AS (
  SELECT qid, nid AS neg_id, cosine AS neg_cos FROM (
    SELECT qid, nid, cosine,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rn
    FROM tsc WHERE q_label <> n_label) WHERE rn = 1
)
SELECT p.qid, p.pos_id, n.neg_id, p.pos_cos, n.neg_cos,
       p.pos_cos - n.neg_cos AS margin,
       (p.pos_cos - n.neg_cos < 0.2) AS violates_margin
FROM tpos p JOIN tneg n ON n.qid = p.qid
"""
)


@register(
    "s15_triplet_mining",
    _S15_ORACLE,
    doc="Hardest-positive/hardest-negative triplet mining per anchor "
    "(FaceNet hard mining / bi-encoder hard negatives): lowest-cosine "
    "same-label vector, highest-cosine different-label vector, and the "
    "triplet-margin verdict — the contrastive-training batch builder "
    "as one broadcast fan-out + two per-anchor top-1 windows. Oracle "
    "extends the verified s1 chain with label joins.",
)
def s15_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, pos_id, neg_id, pos_cos, neg_cos, margin, violates_margin)
    for the first 20 anchors, margin 0.2."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.triplet_mining(emb, F.col("vec_id") < _N_QUERIES, margin=0.2)


# ---------------------------------------------------------------------------
# s16 — MMR-diversified retrieval (Carbonell & Goldstein 1998): the
# result-diversification re-rank every production search/RAG stack
# runs on its fused shortlist. Greedy over s10's hybrid top-10 per
# query: seed with the most relevant, then 4 rounds of
# argmax(λ·rel − (1−λ)·max-sim-to-selected), λ=0.5. Everything is
# deterministic — rel is the integer RRF score divided by a POWER OF
# TWO (exact in binary), pair similarities are the exact quantized
# cosine, MAX is order-independent, ties break on doc_id — so the
# greedy unrolls into plain SQL (the s4 unrolled-iteration precedent)
# and the whole diversifier is value-oracled on top of the verified
# s10 chain.
# ---------------------------------------------------------------------------
_MMR_REL_DIV = 33_554_432.0  # 2^25: the rel normalization is binary-exact


def _s16_rounds(k: int = 5) -> str:
    rounds = []
    for t in range(2, k + 1):
        rounds.append(f""", mrem{t} AS (
  SELECT c.query_id, c.doc_id, c.rel FROM mcand c
  LEFT JOIN msel{t - 1} s ON s.query_id = c.query_id AND s.doc_id = c.doc_id
  WHERE s.doc_id IS NULL
), mmx{t} AS MATERIALIZED (
  SELECT r.query_id, r.doc_id, r.rel, MAX(p.cos) AS maxsim
  FROM mrem{t} r
  JOIN msel{t - 1} s ON s.query_id = r.query_id
  JOIN msim p ON p.query_id = r.query_id AND p.a = r.doc_id AND p.b = s.doc_id
  GROUP BY 1, 2, 3
), mpick{t} AS MATERIALIZED (
  SELECT query_id, doc_id, CAST({t} AS BIGINT) AS pick_order, mmr FROM (
    SELECT query_id, doc_id, mmr,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mmr DESC, doc_id ASC) AS rn
    FROM (SELECT query_id, doc_id, 0.5 * rel - 0.5 * maxsim AS mmr FROM mmx{t})
  ) WHERE rn = 1
), msel{t} AS MATERIALIZED (
  SELECT * FROM msel{t - 1} UNION ALL SELECT * FROM mpick{t}
)""")
    return "".join(rounds)


_S16_ORACLE = (
    "WITH "
    + _S1_DENSE_CTES
    + "\n"
    + _LEX_CTES
    + _rrf_fused_ctes("SELECT qid, nid, rank FROM hranked", "h")
    + f""", mcand AS MATERIALIZED (
  SELECT query_id, doc_id, CAST(rrf_score AS DOUBLE) / {_MMR_REL_DIV} AS rel
  FROM htop WHERE rank <= 10
), mu AS MATERIALIZED (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
  FROM hqv WHERE vec_id IN (SELECT DISTINCT doc_id FROM mcand)
), mdot AS MATERIALIZED (
  SELECT p.query_id, p.a, p.b, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
  FROM (SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b
        FROM mcand c1
        JOIN mcand c2 ON c2.query_id = c1.query_id AND c2.doc_id <> c1.doc_id) p
  JOIN mu x ON x.vec_id = p.a
  JOIN mu y ON y.vec_id = p.b AND y.i = x.i
  GROUP BY 1, 2, 3
), msim AS MATERIALIZED (
  SELECT d.query_id, d.a, d.b,
         CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) AS cos
  FROM mdot d
  JOIN hnorms na ON na.vec_id = d.a
  JOIN hnorms nb ON nb.vec_id = d.b
), msel1 AS MATERIALIZED (
  SELECT query_id, doc_id, CAST(1 AS BIGINT) AS pick_order, 0.5 * rel AS mmr
  FROM (SELECT query_id, doc_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS rn
        FROM mcand) WHERE rn = 1
)"""
    + _s16_rounds(5)
    + """
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, pick_order, mmr FROM msel5
"""
)


@register(
    "s16_mmr_diversified",
    _S16_ORACLE,
    doc="MMR result diversification over the hybrid shortlist: greedy "
    "argmax(0.5·rel − 0.5·max-sim-to-selected) for 5 picks from s10's "
    "fused top-10, rel = integer RRF / 2^25 (binary-exact), pair sims "
    "= exact quantized cosine. Oracle unrolls the greedy rounds in "
    "SQL on top of the verified s10 chain.",
)
def s16_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, pick_order, mmr): 5 MMR picks per query from
    the hybrid top-10."""
    from ..operators.retrieval import mmr_select
    from ..sources.readers import ensure_min_partitions

    emb = load_table(spark, sf_dir, "embeddings")
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    dense = S.cosine_topk(emb, F.col("vec_id") < _S10_N_QUERIES, k=20).select(
        F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank"
    )
    fused = _fuse_with_lexical(spark, docs, dense, _S10_N_QUERIES)
    cand = fused.select(
        "query_id",
        "doc_id",
        (F.col("rrf_score").cast("double") / F.lit(_MMR_REL_DIV)).alias("rel"),
    )
    base = S.with_quantized(emb).select("vec_id", "emb_q", "norm_q")
    ids = cand.select(F.col("query_id").alias("_q"), F.col("doc_id").alias("vec_id"))
    cvec = base.join(F.broadcast(ids), "vec_id").localCheckpoint(eager=True)  # tiny
    a = cvec.select(
        F.col("_q").alias("query_id"),
        F.col("vec_id").alias("a"),
        F.col("emb_q").alias("a_emb"),
        F.col("norm_q").alias("a_norm"),
    )
    b = cvec.select(
        F.col("_q").alias("query_id"),
        F.col("vec_id").alias("b"),
        F.col("emb_q").alias("b_emb"),
        F.col("norm_q").alias("b_norm"),
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            S.cosine_q(
                S.dot_q(F.col("a_emb"), F.col("b_emb")),
                F.col("a_norm"),
                F.col("b_norm"),
            ).alias("cos"),
        )
    )
    return mmr_select(cand, sims, k=5, lam=0.5)


# ---------------------------------------------------------------------------
# s17 — SemDeDup under the PRODUCTION auto-k knob (r7 verdict item 4):
# the registered s9 pins k=10 because its oracle trains a literal-k
# quantizer; this twin registers the `target_cell_rows` path itself —
# k = ceil(N / 100), the paper's k∝N convention that pins per-cell pair
# work to ~target² and keeps total work LINEAR in the corpus
# (REPLICA_r07: auto-k 2.2 s vs fixed-k 36.0 s at 10×). The oracle
# needs no per-scale regeneration: k appears in the Lloyd chain only
# as the init LIMIT, and DuckDB accepts a subquery there, so the SQL
# derives the SAME integer-exact k = (N + target - 1) // target from
# the corpus itself — value-green at every sf with one string.
# ---------------------------------------------------------------------------
_S17_TARGET = 100

_S17_ORACLE = (
    _kmeans_cte(
        k=f"(SELECT (COUNT(*) + {_S17_TARGET - 1}) // {_S17_TARGET} FROM embeddings)",
        iters=10,
    )
    + _S9_TAIL
)


@register(
    "s17_semdedup_autok",
    _S17_ORACLE,
    doc="SemDeDup with the production auto-k scale knob: "
    "k = ceil(N/100) derived from the corpus (one O(1) count, the "
    "sanctioned d24 driver-scalar pattern), within-cluster exact "
    "quantized-cosine pairs, min-id representative election. The "
    "oracle derives the identical k inside SQL (subquery LIMIT on the "
    "Lloyd init), so the same string value-checks at every scale.",
)
def s17_semdedup_autok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per vector: cluster, is-dup verdict and kept representative
    under the k = ceil(N/100) auto-scaled quantizer."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semdedup(
        emb, max_iter=10, threshold=0.35, target_cell_rows=_S17_TARGET
    )


# ---------------------------------------------------------------------------
# s18 — GDPR erasure reaching the DENSE index (r8: FAISS remove_ids
# with lakehouse semantics, the s8 counterpart of d52's lexical
# forget). PQ codes ARE derived personal data — a lossy encoding of
# the erased embedding — so a source-table delete without an index
# forget would keep serving the erased vectors as neighbors. The
# Spark side writes the persisted IVF-PQ index over the full corpus,
# erases a fixed 10-id set (codes deleted via the stats-pruned
# in-list MOR predicate, routing sums decremented exactly via a
# negative delta, then physical compact/expire/vacuum) and serves
# top-5 from what remains. Oracle: the verified s8 chain with the
# SERVED corpus filtered to survivors while both quantizer trainings
# stay full-corpus — precisely "the original index minus the erased
# vectors", which is what a no-retrain erasure must equal.
# ---------------------------------------------------------------------------
_S18_FORGET_IDS = (23, 73, 123, 173, 223, 273, 323, 373, 423, 473)

_S18_ORACLE = (
    _s8_chain(
        _N_QUERIES,
        qv_where="WHERE e.vec_id NOT IN ("
        + ", ".join(str(i) for i in _S18_FORGET_IDS)
        + ")",
    )
    + """
SELECT qid, nid, est_dist, rank FROM (
  SELECT qid, nid, est_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY est_dist ASC, nid ASC) AS BIGINT) AS rank
  FROM s8scored) WHERE rank <= 5
"""
)


@register(
    "s18_ann_forget",
    _S18_ORACLE,
    doc="IVF-PQ top-5 served from the persisted index AFTER erasing 10 "
    "vectors (FAISS remove_ids as lakehouse state): code rows deleted "
    "by a stats-pruned in-list MOR predicate, routing sums decremented "
    "exactly by a negative centroid delta, physical "
    "compact/expire/vacuum — quantizers stay frozen, nothing retrains, "
    "the corpus is never rescanned. Oracle = the verified s8 chain "
    "serving only the survivors (training still full-corpus) — the "
    "no-retrain erasure identity.",
)
def s18_ann_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 ADC neighbors per query from the forgotten IVF-PQ index
    (build + erase are fingerprint-stamped as one unit, so repeat
    calls serve without retraining)."""
    from ..operators.ann_index import (
        forget_from_ivfpq_index,
        ivfpq_index_topk,
        write_ivfpq_index,
    )
    from ..operators.freshness import BuildStamp
    from . import work_dir

    emb = load_table(spark, sf_dir, "embeddings")
    path = work_dir("s18_annforget", sf_dir)
    params = dict(n_cells=10, m=8, k_codes=16, pq_iter=5, km_iter=10)
    stamp = BuildStamp(
        spark,
        path,
        {"kind": "ivfpq+forget", "ids": list(_S18_FORGET_IDS), **params},
        emb,
        ("vec_id", "embedding"),
    )
    if not stamp.is_current():
        stamp.invalidate()
        write_ivfpq_index(emb, path, manifest_codes=True, **params)
        forget_from_ivfpq_index(
            spark,
            path,
            list(_S18_FORGET_IDS),
            vectors=emb,  # exact routing decrement (the oracle's shape)
            physical=True,
        )
        stamp.write()
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivfpq_index_topk(
        spark, path, queries, topk=5, n_probe=2, exclude_self=True
    )


# ---------------------------------------------------------------------------
# s19 — exact range search (FAISS range_search): every neighbor with
# cosine ≥ τ, no k. Top-k truncates dense neighborhoods and
# over-returns sparse ones; the threshold form is what semantic dedup
# (s9's 0.35 radius), near-dup blocking and recall-complete retrieval
# actually specify. Plan shape: ONE broadcast fan-out + a predicate —
# no window, no shuffle; output cost is exactly the matching pairs.
# Oracle: the verified s1 quantized-cosine chain with the rank tail
# replaced by the threshold filter.
# ---------------------------------------------------------------------------
_S19_ORACLE = _QUANT_CTE + """
SELECT qid, nid, cosine FROM scored WHERE cosine >= 0.35
"""


@register(
    "s19_range_search",
    _S19_ORACLE,
    doc="Exact range search: all neighbors with cosine >= 0.35 for the "
    "20-query block (FAISS range_search analogue — the no-k threshold "
    "primitive semantic dedup and blocking specify). One broadcast "
    "fan-out + a filter: no window, no shuffle; exact quantized-cosine "
    "kernel shared with s1.",
)
def s19_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, nid, cosine) for every pair at or above the 0.35 radius."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_range(emb, F.col("vec_id") < _N_QUERIES, threshold=0.35)


# ---------------------------------------------------------------------------
# s20 — INDEX-SERVED range search (r8 verdict item 2): s19's scale twin,
# the FAISS range_search over an IVF index. s19 is the exact brute-force
# baseline (linear in the corpus per query set); the 100 TB shape is:
# route each query to its n_probe cells, ADC-prefilter the probed
# candidates at a radius τ′ IN THE QUANTIZED-L2 DOMAIN (unit-norm
# embeddings: ‖a−b‖² = 2−2cos, so the 1.6e12 limit is the cos ≈ 0.2
# ball — slack under τ = 0.35 that PQ error must exceed to drop a true
# neighbor), then exact-refine just the survivors against raw vectors
# (the s14 pattern applied to a radius). Emitted pairs are EXACT; only
# completeness is approximate — and s21 measures it (the s7 precedent).
# Oracle: the verified s8 chain's s8scored (ALL probed candidates'
# est_dist) + the same ADC filter + the exact quantized-cosine tail —
# every stage mirrored, so the row set value-checks bit-for-bit.
# ---------------------------------------------------------------------------
_S20_ADC_LIMIT = 1_600_000_000_000

_S20_TAIL = f""", rq AS MATERIALIZED (
  SELECT qid, nid FROM s8scored WHERE est_dist <= {_S20_ADC_LIMIT}
), rdot AS MATERIALIZED (
  SELECT r.qid, r.nid, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM rq r
  JOIN xu a ON a.vec_id = r.qid
  JOIN xu b ON b.vec_id = r.nid AND b.i = a.i
  GROUP BY 1, 2
), rapprox AS MATERIALIZED (
  SELECT d.qid, d.nid,
         CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) AS cosine
  FROM rdot d
  JOIN norms na ON na.vec_id = d.qid
  JOIN norms nb ON nb.vec_id = d.nid
  WHERE CAST(d.dot AS DOUBLE)
        / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) >= 0.35
)"""

_S20_ORACLE = (
    _s8_chain(_N_QUERIES)
    + _S20_TAIL
    + """
SELECT qid, nid, cosine FROM rapprox
"""
)


def _s20_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build/reuse the persisted IVF-PQ index (the s11/s13/s14 path +
    parameters, fingerprint-gated) and range-probe it at the 0.35
    radius for the 20-query block."""
    from ..operators.ann_index import ivfpq_index_range, write_ivfpq_index
    from . import work_dir

    emb = load_table(spark, sf_dir, "embeddings")
    path = work_dir("s11_ivfpq", sf_dir)
    write_ivfpq_index(
        emb, path, n_cells=10, m=8, k_codes=16, pq_iter=5, km_iter=10,
        skip_if_current=True,
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivfpq_index_range(
        spark, path, queries, emb, threshold=0.35, adc_limit=_S20_ADC_LIMIT,
        n_probe=2, exclude_self=True,
    )


@register(
    "s20_range_search_ivf",
    _S20_ORACLE,
    doc="Index-served range search (FAISS range_search over IVF — s19's "
    "scale twin): route to 2 of 10 cells, ADC-prefilter the probed "
    "candidates at the 1.6e12 quantized-L2 radius (the cos~0.2 ball "
    "for unit-norm vectors), exact-refine only the survivors at "
    "cos >= 0.35. Every emitted pair is exact; completeness is "
    "measured by s21. Oracle composes the verified s8 chain with the "
    "identical ADC filter + exact-cosine tail.",
)
def s20_range_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, nid, cosine) at the 0.35 radius, served from the persisted
    IVF-PQ index: probed cells' codes only, ADC prefilter, exact refine."""
    return _s20_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# s21 — recall@τ of the index-served range search vs the exact s19
# truth (the s7 precedent for radius queries): the accuracy/cost dial
# an IVF range deployment is tuned by. s20's output is a SUBSET of the
# exact truth by construction (its refine stage recomputes the true
# cosine), so per-query recall = |index pairs| / |exact pairs| — both
# sides already verified chains; queries with no exact neighbor at the
# radius drop out (no denominator) on both engines identically.
# Measured at sf0.01: micro-recall 17/25 at n_probe=2, 25/25 at
# n_probe=10, IDENTICAL at a 6x-looser ADC limit — every miss is a
# routing miss (the n_probe dial, s7's finding), never the prefilter.
# ---------------------------------------------------------------------------
_S21_ORACLE = (
    _s8_chain(_N_QUERIES)
    + _S20_TAIL
    + f""", rexd AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS nid, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM xu a
  JOIN xu b ON b.i = a.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {_N_QUERIES}
  GROUP BY 1, 2
), rexact AS MATERIALIZED (
  SELECT d.qid, d.nid
  FROM rexd d
  JOIN norms na ON na.vec_id = d.qid
  JOIN norms nb ON nb.vec_id = d.nid
  WHERE CAST(d.dot AS DOUBLE)
        / (sqrt(CAST(na.norm_q AS DOUBLE)) * sqrt(CAST(nb.norm_q AS DOUBLE))) >= 0.35
)
SELECT e.qid,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(x.nid) AS BIGINT) AS n_index,
       CAST(COUNT(x.nid) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall_at_tau
FROM rexact e
LEFT JOIN rapprox x ON x.qid = e.qid AND x.nid = e.nid
GROUP BY 1
"""
)


@register(
    "s21_range_recall",
    _S21_ORACLE,
    doc="Per-query recall@tau of the index-served range search (s20) "
    "against the exact range truth (s19's kernel) — the radius "
    "analogue of s7's recall@5. s20 emits a subset of the truth by "
    "construction, so recall = index pairs / exact pairs per query; "
    "oracle composes the two verified chains.",
)
def s21_range_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, n_exact, n_index, recall_at_tau) per query with at least
    one exact neighbor at the 0.35 radius."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_range(emb, F.col("vec_id") < _N_QUERIES, threshold=0.35).select(
        "qid", "nid"
    )
    approx = _s20_pairs(spark, sf_dir).select("qid", "nid")
    hits = exact.join(approx.withColumn("_hit", F.lit(1)), ["qid", "nid"], "left")
    return hits.groupBy("qid").agg(
        F.count("*").alias("n_exact"),
        F.count("_hit").alias("n_index"),
        (F.count("_hit").cast("double") / F.count("*").cast("double")).alias(
            "recall_at_tau"
        ),
    )


# ---------------------------------------------------------------------------
# s22 — semantic-rung cell census (r9 verdict item 6): the within-cell
# contract (SemDeDup's own) means twins at the 0.35 radius whose
# endpoints land in DIFFERENT coarse cells are invisible to both the
# batch semantic stage and the incremental rung — correctly equivalent,
# but unmeasured. This census makes the blind spot a number: for every
# exact radius pair (s19's truth, query block), was it within-cell
# (visible to cell-local semantic dedup) or cross-cell (invisible)?
# Reported per QUERY-side cell — the recall dial a production retune of
# `ann_cells` / `semantic_threshold` turns (more cells = cheaper pair
# work but more cross-cell blindness; the s12 cell-health precedent).
# The production twin is the same computation over the ingest plan's
# `_vectors` store; here it runs over the shared embeddings corpus so
# the oracle can rebuild both sides from scratch. Oracle = the verified
# unrolled-Lloyd chain (s4/s5/s8's kasg, k=10 pinned) + s19's exact
# quantized-cosine pair kernel + one per-cell rollup.
# ---------------------------------------------------------------------------
_S22_ORACLE = (
    _kmeans_cte(k=10, iters=10)
    + f""", cqv AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)) AS emb
  FROM embeddings
), cnorms AS MATERIALIZED (
  SELECT v.vec_id, CAST(SUM(u.e * u.e) AS BIGINT) AS norm_q
  FROM cqv v, unnest(v.emb) AS u(e)
  GROUP BY 1
  HAVING SUM(u.e * u.e) > 0
), cqu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
  FROM cqv WHERE vec_id < {_N_QUERIES}
), cvu AS (
  SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM cqv
), cdots AS (
  SELECT q.vec_id AS qid, x.vec_id AS nid, CAST(SUM(q.v * x.v) AS BIGINT) AS dot
  FROM cqu q JOIN cvu x ON q.i = x.i AND q.vec_id <> x.vec_id
  GROUP BY 1, 2
), cpairs AS (
  SELECT d.qid, d.nid
  FROM cdots d
  JOIN cnorms nq ON nq.vec_id = d.qid
  JOIN cnorms nv ON nv.vec_id = d.nid
  WHERE CAST(d.dot AS DOUBLE)
        / (sqrt(CAST(nq.norm_q AS DOUBLE)) * sqrt(CAST(nv.norm_q AS DOUBLE))) >= 0.35
)
SELECT ka.cluster AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN kb.cluster = ka.cluster THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
       CAST(SUM(CASE WHEN kb.cluster = ka.cluster THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS recall_within
FROM cpairs p
JOIN kasg ka ON ka.vec_id = p.qid
JOIN kasg kb ON kb.vec_id = p.nid
GROUP BY 1
"""
)


@register(
    "s22_semantic_cell_census",
    _S22_ORACLE,
    doc="Semantic-rung observability census: per coarse cell, how many "
    "exact 0.35-radius pairs (s19's truth, query block) are "
    "within-cell (visible to SemDeDup-style cell-local dedup) vs "
    "cross-cell (structurally invisible) — the recall dial for "
    "retuning ann_cells/semantic_threshold. Oracle composes the "
    "verified Lloyd chain with s19's exact pair kernel.",
)
def s22_semantic_cell_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, n_exact, n_within, recall_within) per query-side cell
    with at least one exact radius pair."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.cosine_range(emb, F.col("vec_id") < _N_QUERIES, threshold=0.35).select(
        "qid", "nid"
    )
    assign = S.kmeans_assign(emb, k=10, max_iter=10).select("vec_id", "cluster")
    qa = assign.select(F.col("vec_id").alias("qid"), F.col("cluster").alias("cell"))
    na = assign.select(F.col("vec_id").alias("nid"), F.col("cluster").alias("n_cell"))
    within = F.when(F.col("n_cell") == F.col("cell"), 1).otherwise(0)
    return (
        exact.join(qa, "qid")
        .join(na, "nid")
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(within).cast("bigint").alias("n_within"),
            (F.sum(within).cast("double") / F.count("*").cast("double")).alias(
                "recall_within"
            ),
        )
    )
