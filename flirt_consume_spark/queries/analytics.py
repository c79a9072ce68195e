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
    wrong — the per-user first-click table joins back against the
    stream so only post-click purchases survive. Both reductions
    shuffle on user_id; the three funnel counts are tiny scalar
    aggs."""
    ev = t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    n_clicked = s1.agg(F.count(F.lit(1)).alias("n_clicked"))
    n_conv = s2.agg(F.count(F.lit(1)).alias("n_converted"))
    return (
        n_users.crossJoin(F.broadcast(n_clicked))
        .crossJoin(F.broadcast(n_conv))
    )


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
