"""As-of join semantics on crafted frames."""

from __future__ import annotations

from pyspark.sql import Row


def test_asof_join_most_recent_prior(spark):
    from sunat_rree_demo_spark.operators.joins import asof_join

    left = spark.createDataFrame([
        Row(k="u1", ts=10, lid=100),
        Row(k="u1", ts=5, lid=101),   # before any right row
        Row(k="u2", ts=7, lid=102),
        Row(k="u3", ts=9, lid=103),   # group with no right rows at all
    ])
    right = spark.createDataFrame([
        Row(k="u1", ts=6, rid=900),
        Row(k="u1", ts=9, rid=901),
        Row(k="u2", ts=7, rid=902),   # simultaneous → inclusive match
    ])
    out = {r.lid: r.rid_asof
           for r in asof_join(left, right, on=["k"], order_col="ts",
                              right_cols=["rid"]).collect()}
    assert out == {100: 901,   # latest right at ts<=10 is ts=9
                   101: None,  # no prior right row
                   102: 902,   # equal ts matches (inclusive)
                   103: None}  # group absent from right


def test_asof_join_preserves_left_rowcount(spark):
    from sunat_rree_demo_spark.operators.joins import asof_join
    from sunat_rree_demo_spark.sources.catalog import load_table

    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    e = load_table(spark, SF_SMOKE, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    out = asof_join(purchases, clicks, on=["user_id"], order_col="ts",
                    right_cols=["event_id"])
    assert out.count() == purchases.count()
