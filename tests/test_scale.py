"""Scale-infrastructure behavior: bucketed joins eliminate the
shuffle; salted joins keep results identical and spread hot keys;
global_rank matches a single-reducer window without using one."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flirt_consume_spark.io import load_table
from flirt_consume_spark.operators.scale import (
    global_rank,
    salted_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # saveAsTable writes to ./spark-warehouse (gitignored).
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", ("o_orderkey",), 8)
    write_bucketed(lineitem, "b_lineitem", ("l_orderkey",), 8)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    j = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderstatus").count()
    p = plan_of(j)
    join_section = p.split("HashAggregate")[0]
    assert "Exchange" not in join_section.split("SortMergeJoin")[0] or (
        p.count("Exchange") <= 1
    ), f"bucketed join still shuffles both sides:\n{p}"
    # ground truth: same result as the unbucketed join
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain_join(spark):
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    nation = load_table(spark, SF, "nation")
    got = (
        salted_join(customer, nation, "n_nationkey")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = (
        customer.join(nation, "n_nationkey")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_rejects_outer(spark):
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_nationkey", "n_nationkey"
    )
    nation = load_table(spark, SF, "nation")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(customer, nation, "n_nationkey", how="full")


def test_global_rank_matches_window_rank(spark):
    orders = load_table(spark, SF, "orders")
    cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    got = global_rank(orders, cols).select("o_orderkey", "rnk")
    w = Window.orderBy(*cols)
    want = orders.select("o_orderkey", F.row_number().over(w).alias("rnk"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # and the plan never funnels the table through one partition:
    # no Window node at all, offsets come from the triangular join
    p = plan_of(got)
    assert "Window" not in p, p


def test_salt_spreads_rows(spark):
    customer = load_table(spark, SF, "customer")
    salted = customer.withColumn(
        "_salt", F.pmod(F.xxhash64(*customer.columns), F.lit(8))
    )
    counts = [r.cnt for r in salted.groupBy("_salt").agg(
        F.count(F.lit(1)).alias("cnt")).collect()]
    assert len(counts) == 8
    assert max(counts) < 2.5 * min(counts), f"salt skewed: {counts}"
