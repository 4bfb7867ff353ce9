"""Bucketed layout: the join plan must contain no shuffle Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mm_spark.sources.bucketing import colocated_join, write_bucketed
from flink_mm_spark.sources.tables import table
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
        lineitem = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=8)

        j = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]

        # and it computes the same thing as the shuffled plain-parquet join
        got = j.agg(F.sum("l_quantity").cast("long").alias("s")).collect()[0]["s"]
        want = (
            orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
            .agg(F.sum("l_quantity").cast("long").alias("s"))
            .collect()[0]["s"]
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_bucketed_overwrites_stale_uncataloged_location(spark):
    """A leftover warehouse dir whose table the catalog does NOT know (fresh
    session after a crash / another session's write) must not fail the write
    with LOCATION_ALREADY_EXISTS — write_bucketed clears both."""
    import os
    from urllib.parse import urlparse

    name = "b_stale_location_test"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, name)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        os.makedirs(loc, exist_ok=True)  # stale dir, no catalog entry
        with open(os.path.join(loc, "junk"), "w") as f:
            f.write("stale")
        df = spark.range(100).withColumnRenamed("id", "k")
        write_bucketed(df, name, "k", n_buckets=4)
        assert spark.table(name).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
