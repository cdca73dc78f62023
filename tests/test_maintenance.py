"""Compaction maintenance: small-file binpack rewrite (reference §4 —
nightly rewrite_data_files; here as a parquet-native operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators.maintenance import compact_parquet, table_stats
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem")
    frag = str(tmp_path / "frag")
    # manufacture a fragmented layout: 64 tiny files
    li.repartition(64).write.parquet(frag)
    assert table_stats(frag)["n_files"] == 64
    before_rows = spark.read.parquet(frag).count()
    before_sum = spark.read.parquet(frag).agg(F.sum("l_quantity")).first()[0]

    report = compact_parquet(spark, frag, target_mb=128, sort_by=["l_orderkey"])

    assert report["after"]["n_files"] < 64
    assert report["after"]["n_files"] == report["target_files"]
    assert spark.read.parquet(frag).count() == before_rows
    assert spark.read.parquet(frag).agg(F.sum("l_quantity")).first()[0] == before_sum
    # physical layout sanity: the data really lives in exactly the
    # reported number of files
    n_files_seen = (
        spark.read.parquet(frag).select(F.input_file_name().alias("_f")).distinct().count()
    )
    assert n_files_seen == report["after"]["n_files"]
