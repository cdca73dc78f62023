"""Round-8 ADVICE fixes: stamp format versioning, d49 zero-token
guard, refine loud-fail on a corpus/index mismatch."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators import freshness
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


def test_build_stamp_format_version_forces_rebuild(spark, tmp_path, monkeypatch):
    """A stamp written by old code must stop matching after the index
    format version is bumped, even when (corpus, params) are unchanged
    — otherwise skip_if_current silently serves a stale-layout index."""
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "idx")
    stamp = freshness.BuildStamp(spark, path, {"k": 3}, df, ("doc_id",))
    stamp.write()
    assert stamp.is_current()
    # same (corpus, params) from a fresh instance still matches...
    again = freshness.BuildStamp(spark, path, {"k": 3}, df, ("doc_id",))
    assert again.is_current()
    # ...but a format bump (a code upgrade) must invalidate it
    monkeypatch.setattr(
        freshness, "INDEX_FORMAT_VERSION", freshness.INDEX_FORMAT_VERSION + 1
    )
    upgraded = freshness.BuildStamp(spark, path, {"k": 3}, df, ("doc_id",))
    assert not upgraded.is_current()


def test_d49_zero_token_source_yields_finite_epochs(spark, tmp_path):
    """An all-whitespace source has source_tokens=0; both engines must
    agree on the clamped (div by greatest(tokens,1)) repeat factor
    instead of NULL-vs-raise divergence."""
    from real_time_data_engineering_spark.registry import all_specs

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    empty = docs.limit(3).withColumn("text", F.lit("   ")).withColumn(
        "source", F.lit("empty_src")
    )
    sf_dir = str(tmp_path)
    docs.unionByName(empty).write.parquet(f"{sf_dir}/documents.parquet")

    spec = all_specs()["d49_epoch_budget"]
    got = {
        (r.source, r.n_docs, r.source_tokens, r.budget_tokens, r.epochs_x100, r.over_repeat)
        for r in spec.spark(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(spec.oracle).fetchall()}
    assert got == want
    by_src = {t[0]: t for t in got}
    assert by_src["empty_src"][2] == 0  # zero tokens...
    assert by_src["empty_src"][4] is not None  # ...finite epochs_x100
    assert by_src["empty_src"][5] is True  # and flagged over the knee


def test_ivfpq_refine_raises_on_corpus_missing_shortlist_vector(spark, tmp_path):
    """Probing an index with a corpus that lacks a shortlisted vector
    (appended index + stale base corpus) must FAIL, not silently return
    fewer than topk rows."""
    from py4j.protocol import Py4JJavaError

    from real_time_data_engineering_spark.operators.ann_index import (
        ivfpq_index_topk_refined,
        write_ivfpq_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_cells=4, m=4, k_codes=4)
    queries = emb.filter(F.col("vec_id") < 3)
    # drop most of the corpus: shortlist candidates can't all resolve
    stale = emb.filter(F.col("vec_id") < 5)
    with pytest.raises((Py4JJavaError, Exception), match="no raw vector"):
        ivfpq_index_topk_refined(
            spark, path, queries, stale, topk=5, refine_factor=5, n_probe=2
        ).collect()
    # the full corpus still works
    ok = ivfpq_index_topk_refined(
        spark, path, queries, emb, topk=5, refine_factor=5, n_probe=2
    )
    assert ok.count() > 0
