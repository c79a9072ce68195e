"""Temporal query keys (SURVEY.md §2.E + J6) — the reference-signature ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.operators import temporal as T
from flirt_consume_spark.queries.base import dsum, query, sql_dsum, t


@query(
    "expand_schedule",
    oracle="""
    SELECT o_orderkey,
           CAST(d AS DATE) AS leg_date,
           CAST(isodow(d) AS BIGINT) AS dow
    FROM (
      SELECT o_orderkey,
             unnest(generate_series(
               CAST(o_orderdate AS DATE),
               CAST(o_orderdate AS DATE) + INTERVAL 13 DAY,
               INTERVAL 1 DAY)) AS d
      FROM orders
      WHERE o_orderkey % 10 = 0
    )
    WHERE substr('1111100', isodow(d), 1) = '1'
    """,
)
def expand_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — THE flirt-consume signature op: schedule row (date range +
    day-of-week mask) -> one row per operating date. Modeled on
    orders: each order expands to the weekdays ('1111100' Mon-Fri
    mask) in its 14-day window. Narrow op: sequence + explode +
    substring(mask, isodow, 1) — no shuffle, no UDF."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    sched = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("eff"),
        F.date_add(F.to_date("o_orderdate"), 13).alias("disc"),
        F.lit("1111100").alias("mask"),
    )
    legs = T.expand_schedule(sched, "eff", "disc", "mask")
    return legs.select(
        "o_orderkey",
        F.col("leg_date"),
        (F.weekday("leg_date") + 1).cast("bigint").alias("dow"),
    )


@query(
    "time_normalize",
    oracle="""
    SELECT event_id,
           CAST(offset_min AS BIGINT) AS offset_min,
           strftime(ts - (offset_min * INTERVAL 1 MINUTE),
                    '%Y-%m-%d %H:%M:%S.%f') AS utc_s,
           CAST(date_diff('day', CAST(ts AS DATE),
                CAST(ts - (offset_min * INTERVAL 1 MINUTE) AS DATE))
             AS BIGINT) AS day_shift
    FROM (SELECT event_id, ts, (user_id % 27 - 13) * 30 AS offset_min
          FROM events)
    """,
)
def time_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: local wall-clock + UTC-offset minutes -> absolute timestamp
    with day-rollover tracking (the reference's published-local-time
    normalization; offsets synthesized per user as ±390min)."""
    ev = t(spark, sf_dir, "events").withColumn(
        "offset_min", (F.col("user_id") % 27 - 13) * 30
    )
    out = T.normalize_local_time(ev, "ts", "offset_min")
    return out.select(
        "event_id",
        F.col("offset_min").cast("bigint").alias("offset_min"),
        F.date_format("utc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("utc_s"),
        F.col("day_shift").cast("bigint").alias("day_shift"),
    )


@query(
    "time_bucket",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           COUNT(*) AS cnt,
           {sql_dsum('o_totalprice', 'revenue', 2)}
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: calendar bucketing — the month key driving the reference's
    per-month collection swap (our partition-overwrite sink key)."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.last_day("o_orderdate").alias("month_end"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice", "revenue", 2),
    )


@query(
    "time_duration",
    oracle="""
    SELECT l_orderkey,
           CAST(min(l_shipdate) AS DATE) AS first_ship,
           CAST(max(l_shipdate) AS DATE) AS last_ship,
           CAST(date_diff('day', CAST(min(l_shipdate) AS DATE),
                          CAST(max(l_shipdate) AS DATE)) AS BIGINT) AS span_days
    FROM lineitem GROUP BY l_orderkey
    """,
)
def time_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: interval arithmetic & durations (flight duration / gap
    between legs -> ship-span per order)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.to_date(F.min("l_shipdate")).alias("first_ship"),
        F.to_date(F.max("l_shipdate")).alias("last_ship"),
        F.datediff(F.to_date(F.max("l_shipdate")), F.to_date(F.min("l_shipdate")))
        .cast("bigint")
        .alias("span_days"),
    )


@query(
    "join_asof",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           click_id
    FROM (
      SELECT p.user_id, p.event_id, p.ts, c.event_id AS click_id,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY c.ts DESC, c.event_id DESC
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: temporal as-of join — each purchase matched to the latest
    click at-or-before it for the same user (the reference's
    dated-leg -> effective-schedule-version lookup).

    Spark has no native ASOF JOIN; implemented via union + running
    last_value over one (user)-partitioned window: a single shuffle,
    linear per-partition scan, no probe×version pair explosion —
    unlike the join+rank oracle SQL, this survives keys with many
    versions at 100 TB."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = T.asof_join(
        versions=clicks,
        probes=purchases,
        key="user_id",
        version_ts="ts",
        probe_ts="ts",
        version_cols=["click_id"],
        probe_cols=["event_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "click_id",
    )


@query(
    "join_asof_fwd",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           purchase_id
    FROM (
      SELECT c.user_id, c.event_id, c.ts, p.event_id AS purchase_id,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts ASC, p.event_id ASC
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ) WHERE rn = 1
    """,
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6b: FORWARD as-of join — each click matched to the earliest
    purchase at-or-after it for the same user (time-to-conversion;
    pandas merge_asof direction='forward'). Same single-shuffle
    union + running-scan implementation as join_asof, mirrored to a
    [current, following] frame — the oracle's join+rank form would
    explode probe×version pairs at scale."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = T.asof_join_forward(
        versions=purchases,
        probes=clicks,
        key="user_id",
        version_ts="ts",
        probe_ts="ts",
        version_cols=["purchase_id"],
        probe_cols=["event_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "purchase_id",
    )


@query(
    "scd2_history",
    oracle="""
    WITH chg AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), points AS (
      SELECT user_id, event_type, ts, event_id FROM chg
      WHERE prev_type IS NULL OR prev_type != event_type
    )
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS BOOLEAN) AS is_current
    FROM points
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: SCD Type-2 interval versioning — compress an event stream
    to change points (value != previous), then close each version
    with the next change's timestamp (valid_from/valid_to,
    NULL = current). This is how the reference's *schedule versions*
    come to exist — the table J6's as-of join consumes. Two windows
    over the same (user, time) partitioning: one shuffle, second
    window reuses the sort."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.withColumn("prev_type", F.lag("event_type").over(w))
    points = chg.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    # Full-unique ordering (ts, event_id): two change points sharing a
    # (user_id, ts) would otherwise make valid_to nondeterministic
    # cross-engine; the oracle's lead windows order identically.
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return points.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
