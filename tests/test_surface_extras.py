"""Literal-surface exemplars for two inventory rows the main suite
covers only by analogue: cross-format columnar IO (§2.1 — the engine
is parquet-canonical, but Spark's ORC writer/reader is first-class and
contract-preserving) and a true Python UDTF (§2.9 — the table-function
class; the production paths use explode/mapInPandas, and this pins the
equivalence so the UDTF form stays a drop-in).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """§2.1 cross-format: orders written as ORC read back bit-equal."""
    o = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == o.schema
    key = [c for c in o.columns]
    want = sorted(map(tuple, o.select(*key).collect()))
    got = sorted(map(tuple, back.select(*key).collect()))
    assert got == want


def test_python_udtf_equals_explode_plan(spark):
    """§2.9 UDTF: a real @udtf table function produces exactly the rows
    the production explode/posexplode plan produces — the UDTF form is
    the extension point, the built-in plan is the hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, idx: int, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.lower().strip().split()):
                yield doc_id, i, tok

    docs = load_table(spark, SF_DIR, "documents").limit(50).select("doc_id", "text")
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT t.doc_id, t.idx, t.token "
                "FROM _udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
                    "idx", "token"
                ),
            ).collect(),
        )
    )
    assert got == want
