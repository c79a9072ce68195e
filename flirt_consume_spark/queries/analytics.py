"""Event-sequence analytics keys: ordered funnel conversion and
cohort retention over the events table — the two standard
user-journey readouts an events pipeline serves (the reference's
domain analogue: itinerary legs flown in order, and route activity by
first-seen month).

Both are two co-partitioned shuffles on user_id (per-user reduction,
then matrix aggregation) — no window over the full stream, no
self-join explosion. Registered last: the first 50 registry slots
stay reserved for keys awaiting external verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.queries.base import query, t


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
      (SELECT COUNT(*) FROM s1) AS n_clicked,
      (SELECT COUNT(*) FROM s2) AS n_converted
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users → first click → purchase strictly AFTER
    that click. Step 2 is an ORDERED condition (a purchase before the
    first click does not count), which a naive event_type filter gets
    wrong.

    Computed in ONE scan and ONE shuffle: a per-user range window in
    integer microseconds with frame end -1 marks, for every event,
    whether any STRICTLY-earlier click exists (range -1 excludes
    same-timestamp peers — exactly the oracle's ts > first-click-ts);
    the per-user reduction then folds clicked/converted flags, and
    three counts come off that tiny table. The naive form (first-click
    table joined back) scans the stream twice and shuffles twice."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "click_before", F.coalesce(F.max("is_click").over(w), F.lit(0))
    )
    per_user = flagged.groupBy("user_id").agg(
        F.max("is_click").alias("clicked"),
        F.max(F.col("is_purchase") * F.col("click_before")).alias("converted"),
    )
    # coalesce to 0: these are COUNTS of users clearing each step
    # (the oracle spells them as COUNT(*), which is 0 on an empty
    # stream) — SUM's empty-input NULL would misreport "no users" as
    # "unknown".
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.coalesce(F.sum("clicked"), F.lit(0))
        .cast("bigint")
        .alias("n_clicked"),
        F.coalesce(F.sum("converted"), F.lit(0))
        .cast("bigint")
        .alias("n_converted"),
    )


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(CASE WHEN hi = lo THEN 0
                ELSE LEAST(CAST(floor((o_totalprice - lo) / (hi - lo) * 20)
                           AS BIGINT), 19) END AS BIGINT) AS bucket,
           COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE)
                / 1e2 AS DOUBLE) AS price_sum
    FROM orders, b
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bucket histogram of order value — the data-
    profiling primitive (distribution shape in one scan + one tiny
    bounds broadcast). Bucket assignment is the same IEEE
    subtract/divide/floor chain both engines compute identically; the
    max value clamps into the last bucket."""
    orders = t(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # hi == lo (constant column / single row) puts every row in
    # bucket 0 — the degenerate-range convention; without the guard
    # the ANSI divide raises DIVIDE_BY_ZERO. The oracle carries the
    # identical CASE so both engines agree on any input.
    bucket = F.when(
        F.col("hi") == F.col("lo"), F.lit(0).cast("long")
    ).otherwise(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 20
            ).cast("long"),
            F.lit(19).cast("long"),
        )
    )
    return (
        orders.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 1e2).cast("long"))
                / F.lit(1e2)
            )
            .cast("double")
            .alias("price_sum"),
        )
    )


@query(
    "profile_table",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary: null count, exact distinct count, and
    min/max per profiled column. The profiling pass every ingest
    pipeline runs before trusting a new drop.

    r12 rework (guide §1.2 step 1 + §2.3): the previous single
    multi-`countDistinct` aggregation planned as Expand (4× every
    row) into a SortAggregate chain — string agg buffers (min/max of
    the two status/priority columns) are not hash-aggregatable, so
    the whole 4n-row stream was SORTED, inside the serial one-task
    scan stage. Now each column runs a two-level hash aggregation:
    groupBy(col).count() (fixed-width buffer — map-side partial, one
    tiny exchange of |distinct| rows), then nulls / distinct-count /
    min / max read off the grouped frame (the only sort-aggregate
    left is over ≤ |distinct| rows). The three per-column legs are
    independent subtrees of one union — Spark schedules their stages
    concurrently, and each scan prunes to its single column."""
    orders = t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    legs = []
    for c in cols:
        g = orders.select(c).groupBy(c).agg(F.count(F.lit(1)).alias("_cnt"))
        legs.append(
            g.agg(
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("_cnt"))),
                    F.lit(0).cast("long"),
                ).alias("n_nulls"),
                # count(col) over the grouped frame counts the
                # NON-NULL group keys = exact COUNT(DISTINCT col).
                F.count(c).alias("n_distinct"),
                # min/max in the column's native type, THEN
                # stringified — lexicographic min of string-cast
                # numerics would disagree with the oracle's
                # CAST(MIN(...) AS VARCHAR).
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_nulls",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@query(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, strftime(MIN(ts), '%Y-%m') AS cohort
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS act_month
      FROM events
    )
    SELECT f.cohort, a.act_month, COUNT(*) AS n_active
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen month,
    counted per month they were active — the (cohort × month) grid
    behind every retention curve. Per-user min + per-user-month
    distinct, then one join and a small matrix agg; all stages share
    the user_id partitioning."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("act_month")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort", "act_month")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
