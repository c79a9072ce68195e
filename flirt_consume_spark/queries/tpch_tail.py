"""TPC-H tail shapes (Q6/Q11/Q14/Q15/Q16/Q17/Q19/Q20 analogues) —
the remaining classic plan shapes not covered by queries/shapes.py:
pure pushdown scans, scalar-subquery broadcasts, decorrelated
correlated aggregates, disjunctive join predicates, and nested
semi-join chains. The fixture has no partsupp table, so the
inventory-flavoured queries (Q11/Q16/Q20) re-root on lineitem as the
supplier-part fact — same join topology and subquery structure,
different spine.

Exactness discipline (queries/base.py): every revenue/quantity
aggregate is an integer-unit sum, every share/threshold compare is
integer-rational, so the DuckDB hash matches bit for bit at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.queries.base import dsum, query, sql_dsum, t


@query(
    "shape_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue', 4)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
)
def shape_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): the canonical
    pushdown showcase — zero joins, three conjunctive predicates that
    must ALL reach the parquet scan (date range + discount band +
    quantity cap in PushedFilters), one global exact sum. At 100 TB
    this is the query where scan pruning IS the runtime: row-group
    statistics skip everything outside the ship-year."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 4)
    )


@query(
    "shape_promo_effect",
    oracle="""
    SELECT ship_year,
           floor(CAST(promo_cents AS DOUBLE) / total_cents * 1e8) / 1e6
             AS promo_share_pct
    FROM (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT) ELSE 0 END) AS promo_cents,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS total_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ship_year
    ) yr
    """,
)
def shape_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): promo revenue as a percent
    of total revenue per ship year — the conditional-numerator /
    unconditional-denominator ratio computed in ONE aggregation pass
    over the part-enriched fact (no second scan, no self-join). The
    part dim broadcasts; the share is an exact integer-cent rational
    floored at 1e-6 so both engines emit the identical double."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", cents).otherwise(0)
            ).alias("_promo"),
            F.sum(cents).alias("_tot"),
        )
    )
    return agg.select(
        "ship_year",
        (
            F.floor(F.col("_promo").cast("double") / F.col("_tot") * 1e8)
            / 1e6
        ).alias("promo_share_pct"),
    )


@query(
    "shape_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_cents AS DOUBLE) / 100 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT MAX(total_cents) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def shape_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the max. The scalar subquery decorrelates to a broadcast:
    the per-supplier aggregate (small — |suppliers| rows) computes its
    own max in a second tiny agg, which cross-joins back as a 1-row
    broadcast filter. No window-over-everything single reducer, no
    second scan of lineitem; exact cents make the max tie-stable."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents).alias("total_cents")
    )
    best = rev.agg(F.max("total_cents").alias("_best"))
    sup = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_cents") == F.col("_best"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 100).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "shape_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def shape_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    supplier counts per (brand, type, size) bucket with a NOT IN
    exclusion list (negative-balance suppliers stand in for the
    complaint filter; the fixture has no s_comment). The exclusion
    decorrelates to a broadcast anti-join — NULL-safe by
    construction since s_suppkey is a key; the distinct-agg shuffles
    once on the group key with partial distinct upstream."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(bad),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "shape_small_qty_revenue",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey AS pk,
             SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS sq100,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand, {sql_dsum('l_extendedprice', 'avg_yearly_x7', 2)}
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN per_part ON l_partkey = pk
    WHERE CAST(floor(l_quantity * 100) AS BIGINT) * 5 * cnt < sq100
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def shape_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems whose quantity is under 20% of their part's average —
    the canonical correlated scalar subquery, decorrelated into a
    per-part aggregate joined back to the fact. The threshold compare
    is the integer cross-multiplication q*5*cnt < Σq (no division →
    no float boundary), and the per-part agg shuffles on the SAME key
    as the join so AQE can plan a single exchange. Grouped by brand
    (vs Q17's single scalar) to exercise the post-join re-agg."""
    li = t(spark, sf_dir, "lineitem")
    q100 = F.floor(F.col("l_quantity") * 100).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(q100).alias("sq100"), F.count(F.lit(1)).alias("cnt")
    )
    part = t(spark, sf_dir, "part")
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(q100 * 5 * F.col("cnt") < F.col("sq100"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum("l_extendedprice", "avg_yearly_x7", 2))
        .orderBy("p_brand")
    )


@query(
    "shape_disjunctive_revenue",
    oracle=f"""
    SELECT p_brand, {sql_dsum('l_extendedprice * (1 - l_discount)',
                              'revenue', 6)}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def shape_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a three-arm disjunction
    mixing part-side (brand, size) and lineitem-side (quantity)
    predicates across the join. Catalyst extracts the common
    join key (equi-join survives; no nested-loop fallback) and pushes
    the derivable per-side disjuncts (brand∈{3,4,5}, size≤35,
    qty≤30) below the join as scan filters — the residual OR
    evaluates post-join. Grouped by brand to surface all three arms."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            arm("Brand#3", 15, 1, 11)
            | arm("Brand#4", 25, 10, 20)
            | arm("Brand#5", 35, 20, 30)
        )
        .groupBy("p_brand")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                6,
            )
        )
        .orderBy("p_brand")
    )


@query(
    "shape_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
        )
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(floor(l_quantity * 100) AS BIGINT)) > 50 * 100
    )
    ORDER BY s_suppkey
    """,
)
def shape_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    shipped a meaningful volume of 'gear' parts in 1996 — a nested
    IN-chain (part name filter → grouped HAVING on lineitem →
    supplier semi-join), each level decorrelating to a semi-join:
    the part list broadcasts into the lineitem scan, the qualifying
    supplier keys (small) broadcast-semi into supplier. The fixture
    has no partsupp, so the availqty>½·shipped test becomes a fixed
    shipped-quantity threshold on the same nested topology."""
    gears = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    q100 = F.floor(F.col("l_quantity") * 100).cast("long")
    qualifying = (
        li.join(
            F.broadcast(gears),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(q100).alias("_sq"))
        .filter(F.col("_sq") > 50 * 100)
        .select("l_suppkey")
    )
    sup = t(spark, sf_dir, "supplier")
    return (
        sup.join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "shape_important_stock",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS value_cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 3
      GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(value_cents AS DOUBLE) / 100 AS part_value
    FROM per_part
    WHERE value_cents * (SELECT COUNT(*) FROM per_part)
            > 2 * (SELECT SUM(value_cents) FROM per_part)
    ORDER BY value_cents DESC, l_partkey
    """,
)
def shape_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part
    traded value for one nation's suppliers, keeping parts worth more
    than 2× the mean part value — the grouped-agg +
    global-scalar-subquery HAVING. Q11's fixed fraction threshold is
    scale-DEpendent (0.0001 finds everything at SF1, nothing at
    SF1000); the 2×-mean form is the scale-invariant equivalent and
    survives any SF. The total/count derive from the
    ALREADY-AGGREGATED per-part frame (tiny), never a second fact
    scan, and join back as a 1-row broadcast; the share test is the
    integer cross-multiplication value·N > 2·Σvalue. Fixture has no
    partsupp, so lineitem×supplier is the stock-value fact."""
    sup = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    per_part = (
        li.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = per_part.agg(
        F.sum("value_cents").alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("_n") > 2 * F.col("_tot"))
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100).alias("part_value"),
        )
        .orderBy(F.desc("value_cents"), "l_partkey")
        .select("l_partkey", "part_value")
    )


@query(
    "shape_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 4)},
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def shape_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter — the last of the 22
    TPC-H query shapes, completing the full sweep (Q1≈agg_route,
    Q2≈sql_min_cost, Q3/Q4/Q5/Q7/Q8/Q9/Q12/Q13/Q18 in shapes.py,
    Q6/Q11/Q14/Q15/Q16/Q17/Q19/Q20 here, Q21≈sql_waiting_orders,
    Q22≈sql_distant_customers).

    Plan shape: the quarter predicate prunes ORDERS at the scan, the
    return-flag predicate prunes LINEITEM at the scan, the pruned
    orders join lineitem on the fact key, customers/nation ride
    broadcast joins, and the top-20 is a TakeOrdered (per-partition
    heaps — no global sort shuffle). Revenue is the exact
    integer-unit sum; ties break on c_custkey."""
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    j = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(cu), od["o_custkey"] == cu["c_custkey"])
        .join(
            F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"]
        )
    )
    rev = dsum(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4
    )
    return (
        j.groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .agg(rev)
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
