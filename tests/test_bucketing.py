"""Bucketed tables: the co-located-join strategy for repeated joins at
scale — both sides bucketed on the join key means NO Exchange in the
join plan (the shuffle is paid once at write time, amortized over
every subsequent join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); the database is dropped on teardown
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("buckdemo.lineitem_b")
    )
    (
        spark.read.parquet(f"{SF}/orders.parquet")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("buckdemo.orders_b")
    )
    yield "buckdemo"
    spark.sql("DROP DATABASE buckdemo CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # disable auto-broadcast so the join exercises the bucket layout
    # (at real scale neither side fits in a broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("buckdemo.lineitem_b")
        o = spark.table("buckdemo.orders_b")
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it computes the same result as the shuffled join
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == plain
