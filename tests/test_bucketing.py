"""Bucketed co-located join: the join between two tables bucketed by the
same key must plan WITHOUT a shuffle on either side — the 100 TB
fact-join strategy (shuffle paid once at write, amortized across joins)."""

from pyspark.sql import functions as F

from streamlit_projet_spark_streaming_spark.sources.bucketing import colocated_join, write_bucketed
from streamlit_projet_spark_streaming_spark.sources.catalog import load_table

from .conftest import SF_CORRECT


def test_bucketed_join_has_no_exchange(spark):
    # drop catalog entries AND any orphaned managed locations from
    # earlier interrupted runs (saveAsTable refuses to overwrite a
    # location it doesn't own)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    orders = load_table(spark, "orders", SF_CORRECT).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, "lineitem", SF_CORRECT).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)

    joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    # and the result is the plain join's result
    expect = orders.join(lineitem, "o_orderkey").count()
    assert joined.count() == expect

    # contrast: the same join over non-bucketed sources DOES shuffle
    # (sanity that the assertion above is meaningful)
    plain = orders.join(lineitem.hint("merge"), "o_orderkey")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan
