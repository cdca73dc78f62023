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


def test_incremental_overwrite_touches_only_new_partitions(spark, tmp_path):
    """Dynamic partition overwrite must leave untouched partitions'
    files byte-identical — the 100 TB incremental contract: a daily
    increment rewrites one date, never the table."""
    import os

    from real_time_data_engineering_spark.operators.maintenance import incremental_overwrite

    path = str(tmp_path / "fct")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03") for i in range(5)],
        "pickup_date string, k int, v double",
    )
    full.write.partitionBy("pickup_date").parquet(path)

    def files_of(day):
        d = os.path.join(path, f"pickup_date={day}")
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d) if f.endswith(".parquet")}

    before_d1 = files_of("2024-01-01")
    inc = spark.createDataFrame(
        [("2024-01-02", 99, 9.9), ("2024-01-04", 1, 1.0)], "pickup_date string, k int, v double"
    )
    touched = incremental_overwrite(inc, path, "pickup_date")
    assert sorted(touched) == ["2024-01-02", "2024-01-04"]
    assert files_of("2024-01-01") == before_d1  # untouched partition intact
    got = spark.read.parquet(path)
    assert got.filter("pickup_date = '2024-01-02'").count() == 1  # replaced, not appended
    assert got.filter("pickup_date = '2024-01-04'").count() == 1  # new partition added
    assert got.filter("pickup_date = '2024-01-01'").count() == 5


def test_merge_upsert_latest_wins(spark):
    """S9 semantics: one row per key, greatest precombine wins, updates
    beat existing on exact ties."""
    from real_time_data_engineering_spark.operators.maintenance import merge_upsert

    existing = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 5, 20.0)], "trip_id string, ver int, fare double"
    )
    updates = spark.createDataFrame(
        [("a", 2, 11.0), ("b", 5, 21.0), ("c", 1, 30.0)], "trip_id string, ver int, fare double"
    )
    got = {r.trip_id: (r.ver, r.fare) for r in merge_upsert(existing, updates, ["trip_id"], "ver").collect()}
    assert got == {"a": (2, 11.0), "b": (5, 21.0), "c": (1, 30.0)}
