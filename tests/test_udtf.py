"""Python UDTF surface tests."""

from __future__ import annotations

from pyspark.sql.functions import lit


def test_shingle_udtf_dataframe_api(spark):
    from sunat_rree_demo_spark.operators.udtf_ops import ShingleUDTF

    rows = ShingleUDTF(lit("a b c d e"), lit(3)).collect()
    assert [(r.pos, r.shingle) for r in rows] == [
        (0, "a b c"), (1, "b c d"), (2, "c d e")]


def test_shingle_udtf_sql_and_lateral(spark):
    from sunat_rree_demo_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    out = spark.sql("SELECT * FROM shingle_udtf('uno dos tres cuatro', 2)").collect()
    assert len(out) == 3 and out[0].shingle == "uno dos"

    # lateral join over a table: one UDTF expansion per input row
    spark.createDataFrame([("x y z",), ("p q",)], ["text"]) \
        .createOrReplaceTempView("t_docs")
    lat = spark.sql(
        "SELECT text, s.shingle FROM t_docs, "
        "LATERAL shingle_udtf(text, 2) AS s").collect()
    assert sorted(r.shingle for r in lat) == ["p q", "x y", "y z"]


def test_shingle_udtf_null_and_short(spark):
    from sunat_rree_demo_spark.operators.udtf_ops import ShingleUDTF

    assert ShingleUDTF(lit(None).cast("string"), lit(3)).collect() == []
    assert ShingleUDTF(lit("solo"), lit(3)).collect() == []
