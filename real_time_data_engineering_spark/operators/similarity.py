"""Similarity search over embedding columns (`array<float>`).

Two tiers, per the standard ANN playbook:

* **Brute-force cosine top-k** — the exactness baseline. Expressed with
  `zip_with` + `aggregate` (JVM-side, codegen; no Python). Cost is
  |Q|·N·d: fine for reranking / small query sets; the broadcast of the
  query block keeps it shuffle-free.
* **IVF-style partitioned search** — the 100 TB path: k centroids
  (label column stands in for a trained coarse quantizer here), vectors
  partitioned by cell, queries probe only their nearest cells. Search
  cost drops to |Q|·(N/cells)·probes and the cell assignment is a
  broadcast join, so the big side never shuffles.

Parity note: the oracle-checked variants quantize floats with
floor(x·1e6) into BIGINT so dot products are exact integers on both
engines; the one double division at the end is bit-stable. The plain
double variants are the production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000.0


def quantized(col: Column | str) -> Column:
    """array<float> → array<bigint> via floor(x·1e6) — exact both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * F.lit(QUANT_SCALE)))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(dot: Column, n1: Column, n2: Column) -> Column:
    """cos = dot / (sqrt(n1)·sqrt(n2)) — one deterministic double expr."""
    return dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))


def with_quantized(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    return df.withColumn("emb_q", quantized(emb_col)).withColumn("norm_q", norm_sq_q(F.col("emb_q")))


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the rows matching ``query_pred``.

    The query block is broadcast; the corpus side stays partition-local
    (no shuffle until the final per-query top-k, which AQE keeps tiny).
    """
    base = with_quantized(emb, emb_col)
    q = base.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("emb_q").alias("q_emb"), F.col("norm_q").alias("q_norm")
    )
    v = base.select(F.col(id_col).alias("nid"), F.col("emb_q").alias("v_emb"), F.col("norm_q").alias("v_norm"))
    pairs = v.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        cosine_q(dot_q(F.col("q_emb"), F.col("v_emb")), F.col("q_norm"), F.col("v_norm")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def knn_label_vote(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN majority-vote classification on top of exact top-k.

    Tie-break: (votes DESC, label ASC) — deterministic on both engines.
    """
    topk = cosine_topk(emb, query_pred, k, id_col, emb_col)
    labels = emb.select(F.col(id_col).alias("nid"), F.col(label_col).alias("n_label"))
    votes = topk.join(F.broadcast(labels), "nid").groupBy("qid", "n_label").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("n_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("n_label").alias("predicted_label"), "votes")
    )


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-bucketed ANN: centroids from cell means, probe n nearest cells.

    This is the scale path: the corpus is hash-partitioned by cell once
    (at write time it would be bucketed), and each query only scans the
    ``n_probe`` cells whose centroids are nearest — a broadcast of
    |cells| centroids decides the routing, so no corpus shuffle.
    Recall < 1.0 by construction; property-tested against brute force.
    """
    base = with_quantized(emb, emb_col)
    dim = emb.select(F.size(emb_col).alias("d")).first()["d"]
    # centroid per cell: exact integer mean numerators, one double divide
    cent = (
        base.select(F.col(cell_col).alias("cell"), F.posexplode("emb_q").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", (F.col("s").cast("double") / F.col("c").cast("double")).alias("m"))))
            .getField("m")
            .alias("centroid")
        )
    )
    q = base.filter(query_pred).select(
        F.col(id_col).alias("qid"), F.col("emb_q").alias("q_emb"), F.col("norm_q").alias("q_norm")
    )
    # route each query to its n_probe nearest centroids (tiny broadcast)
    qc = q.crossJoin(F.broadcast(cent)).select(
        "qid",
        "q_emb",
        "q_norm",
        "cell",
        F.aggregate(
            F.zip_with(F.col("q_emb"), F.col("centroid"), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("affinity"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("affinity"), F.asc("cell"))
    routed = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= n_probe).select("qid", "q_emb", "q_norm", "cell")
    v = base.select(
        F.col(id_col).alias("nid"), F.col(cell_col).alias("cell"), F.col("emb_q").alias("v_emb"), F.col("norm_q").alias("v_norm")
    )
    pairs = v.join(F.broadcast(routed), "cell").filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid", "nid", cosine_q(dot_q(F.col("q_emb"), F.col("v_emb")), F.col("q_norm"), F.col("v_norm")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k).select("qid", "nid", "cosine", "rank")
