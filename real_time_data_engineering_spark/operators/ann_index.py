"""Persistent IVF index: cluster assignment at WRITE time, bucketed
storage, partition-pruned probes at READ time.

`similarity.ivf_topk_kmeans` trains and assigns per query call — right
for ad-hoc use, wrong at 100 TB, where the docstrings promise "the
assignment is computed once at write time and the corpus is bucketed on
it, so queries never shuffle the corpus". This module delivers that
promise as storage:

* ``write_ivf_index`` — train the coarse quantizer (optionally on a
  bounded deterministic sample, see ``kmeans_assign(sample_n=...)``),
  assign every vector once, and write the corpus hive-partitioned by
  ``cluster=N`` next to a tiny ``_centroids`` parquet holding each
  cell's exact int64 SUM vector + count (the same order-independent
  routing representation `ivf_topk` uses).
* ``ivf_index_topk`` — route queries against the stored centroids
  (broadcast-sized), then scan ONLY the probed ``cluster=`` partitions:
  Spark's partition pruning keeps unprobed buckets' files untouched
  (assert `PartitionFilters` in the plan), so query cost is
  |probed cells| · cell size, independent of corpus size on disk.

Determinism: training init, assignment tie-breaks and the quantized
scoring are `kmeans_assign`/`ivf_topk` contracts, so a written index
answers queries EXACTLY like the in-memory composition with the same
parameters — pinned by an equivalence test.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import cosine_q, dot_dec, dot_q, kmeans_assign, with_quantized

_CENTROIDS = "_centroids"


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 10,
    max_iter: int = 10,
    sample_n: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> int:
    """Train, assign once, bucket the corpus on disk. Returns n_cells.

    Layout: ``path/cluster=N/*.parquet`` (the bucketed corpus, one hive
    partition per cell) + ``path/_centroids/*.parquet`` with
    (cluster, cent_s array<bigint>, c) — the exact integer SUM centroid
    representation, so routing after a reload is bit-identical to
    routing at write time.
    """
    assign = kmeans_assign(
        emb, k=n_cells, max_iter=max_iter, id_col=id_col, emb_col=emb_col, sample_n=sample_n
    )
    clustered = emb.join(assign.select(id_col, "cluster"), id_col)
    clustered.write.mode("overwrite").partitionBy("cluster").parquet(path)
    spark = emb.sparkSession
    stored = spark.read.parquet(path)
    cent = (
        with_quantized(stored, emb_col)
        .select("cluster", F.posexplode("emb_q").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).getField("s").alias("cent_s"))
        .join(
            with_quantized(stored, emb_col)
            .groupBy("cluster")
            .agg(F.count("*").alias("c")),
            "cluster",
        )
    )
    cent.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, _CENTROIDS))
    return n_cells


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_pred: Column,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k over a written index: broadcast-route on the stored
    centroids, scan only the probed ``cluster=`` partitions.

    The probe filter is a partition-column predicate, so the scan's
    `PartitionFilters` keeps every unprobed bucket's files unread —
    the disk-level analogue of `ivf_topk`'s broadcast-join routing,
    with the quantized scoring unchanged (same results, bit-for-bit).

    Queries are taken from the index itself via ``query_pred`` (the
    registry convention); external query vectors would route the same
    way against the centroid frame.
    """
    cent = spark.read.parquet(os.path.join(path, _CENTROIDS))
    corpus = spark.read.parquet(path)
    q = with_quantized(corpus.filter(query_pred), emb_col).select(
        F.col(id_col).alias("qid"),
        F.col("emb_q").alias("q_emb"),
        F.col("norm_q").alias("q_norm"),
    )
    qc = q.crossJoin(F.broadcast(cent)).select(
        "qid",
        "q_emb",
        "q_norm",
        "cluster",
        (dot_dec(F.col("q_emb"), F.col("cent_s")).cast("double") / F.col("c").cast("double")).alias(
            "affinity"
        ),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("affinity"), F.asc("cluster"))
    routed = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "q_emb", "q_norm", "cluster")
    )
    # the probed cells become a PARTITION filter on the bucketed scan:
    # collect the (tiny, ≤ |queries|·n_probe) cell set to the driver and
    # push it as an IN-list — this is metadata-sized by construction,
    # and it is what lets Spark prune unprobed buckets' files entirely
    probe_cells = sorted({r.cluster for r in routed.select("cluster").distinct().collect()})
    pruned = corpus.filter(F.col("cluster").isin(probe_cells))
    v = with_quantized(pruned, emb_col).select(
        F.col(id_col).alias("nid"),
        F.col("cluster"),
        F.col("emb_q").alias("v_emb"),
        F.col("norm_q").alias("v_norm"),
    )
    pairs = v.join(F.broadcast(routed), "cluster").filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid",
        "nid",
        cosine_q(dot_q(F.col("q_emb"), F.col("v_emb")), F.col("q_norm"), F.col("v_norm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )
