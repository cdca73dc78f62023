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


def test_partition_filter_compaction_leaves_other_partitions_untouched(spark, tmp_path):
    """The incremental-compaction contract: with partition_filter set,
    every non-matching partition's files survive byte-identical and the
    matching partition keeps all of its rows."""
    import os

    path = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03") for i in range(50)],
        "pickup_date string, k int, v double",
    )
    # fragment only one partition's layout
    df.filter("pickup_date <> '2024-01-02'").write.partitionBy("pickup_date").parquet(path)
    df.filter("pickup_date = '2024-01-02'").repartition(16).write.mode("append").partitionBy(
        "pickup_date"
    ).parquet(path)

    def files_of(day):
        d = os.path.join(path, f"pickup_date={day}")
        return {
            f: (os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_d1, before_d3 = files_of("2024-01-01"), files_of("2024-01-03")
    n_frag = len(files_of("2024-01-02"))
    assert n_frag >= 10  # fragmented enough to compact

    report = compact_parquet(
        spark, path, target_mb=128, partition_filter="pickup_date = '2024-01-02'"
    )

    assert report["rewritten_partitions"] == ["pickup_date=2024-01-02"]
    assert files_of("2024-01-01") == before_d1
    assert files_of("2024-01-03") == before_d3
    assert len(files_of("2024-01-02")) < n_frag
    got = spark.read.parquet(path)
    assert got.count() == 150
    assert got.filter("pickup_date = '2024-01-02'").count() == 50


def test_partition_filter_rejects_row_level_predicates(spark, tmp_path):
    """A predicate on a data column would silently drop rows from every
    swapped partition — must be refused, not half-applied."""
    import pytest

    path = str(tmp_path / "part_tbl2")
    spark.createDataFrame(
        [("2024-01-01", i, float(i)) for i in range(10)],
        "pickup_date string, k int, v double",
    ).write.partitionBy("pickup_date").parquet(path)
    with pytest.raises(ValueError, match="partition columns"):
        compact_parquet(spark, path, partition_filter="k > 5")
    # unpartitioned table + filter is also refused
    flat = str(tmp_path / "flat_tbl")
    spark.range(10).write.parquet(flat)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, flat, partition_filter="id > 5")


def test_full_compaction_preserves_hive_layout(spark, tmp_path):
    """A no-filter rewrite of a partitioned table must keep the
    key=value directory layout (partition pruning depends on it)."""
    import os

    path = str(tmp_path / "part_tbl3")
    spark.createDataFrame(
        [(d, i) for d in ("a", "b") for i in range(20)], "grp string, k int"
    ).repartition(8).write.partitionBy("grp").parquet(path)

    compact_parquet(spark, path, target_mb=128)

    assert sorted(d for d in os.listdir(path) if d.startswith("grp=")) == ["grp=a", "grp=b"]
    got = spark.read.parquet(path)
    assert got.count() == 40
    assert got.filter("grp = 'a'").count() == 20


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


def test_partition_filter_matches_hive_escaped_values(spark, tmp_path):
    """String partition values containing '='/'/'/'%' are written by
    Spark as %XX-escaped dir names; the partition_filter dir matching
    must render values the same way or it silently skips (or worse,
    mismatches) those partitions."""
    import os

    path = str(tmp_path / "esc_tbl")
    weird, plain = "s=3/a%b{c", "plain"  # '{' is in Spark's charToEscape too
    df = spark.createDataFrame(
        [(s, i, float(i)) for s in (weird, plain) for i in range(40)],
        "src string, k int, v double",
    )
    df.filter(f"src = '{plain}'").write.partitionBy("src").parquet(path)
    df.filter(f"src = '{weird}'").repartition(12).write.mode("append").partitionBy(
        "src"
    ).parquet(path)
    esc_dir = "src=s%3D3%2Fa%25b%7Bc"
    assert os.path.isdir(os.path.join(path, esc_dir))  # escaping premise
    n_frag = len(
        [f for f in os.listdir(os.path.join(path, esc_dir)) if f.endswith(".parquet")]
    )
    assert n_frag >= 8

    report = compact_parquet(
        spark, path, target_mb=128, partition_filter=f"src = '{weird}'"
    )
    assert report["rewritten_partitions"] == [esc_dir]
    after = [
        f for f in os.listdir(os.path.join(path, esc_dir)) if f.endswith(".parquet")
    ]
    assert len(after) < n_frag
    got = spark.read.parquet(path)
    assert got.count() == 80
    assert got.filter(F.col("src") == weird).count() == 40
