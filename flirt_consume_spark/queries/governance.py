"""Data-governance / warehouse-utility query keys: referential-
integrity audit, ABC (Pareto-class) contribution analysis on a
distributed running sum, deterministic weighted sampling, and
first/last-touch revenue attribution.

Scale notes per key are in the docstrings; the shared theme is that
nothing here introduces a serialized stage — the ABC cumulative share
runs on ``operators/scale.global_cumsum`` (range-partitioned prefix
sum, no single-reducer window), the attribution windows are
partitioned per user, and the weighted sample is a TakeOrdered top-k
on a hash-derived priority, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flirt_consume_spark.queries.base import dsum, query, sql_dsum, t

_FK_RELS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


@query(
    "audit_fk",
    oracle="""
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
      SELECT '{f}.{fk}->{d}.{dk}' AS relationship,
             (SELECT COUNT(*) FROM {f}) AS n_rows,
             (SELECT COUNT(*) FROM {f}
              WHERE NOT EXISTS (SELECT 1 FROM {d} WHERE {dk} = {f}.{fk}))
               AS n_orphans
        """
        for f, fk, d, dk in _FK_RELS
    )
    + ")",
)
def audit_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan-row counts for every
    fact→dim foreign key in one result. Each relationship is a
    left-anti join (Spark picks broadcast-anti when the dim fits,
    shuffle-anti otherwise — both shapes never materialize matches),
    so the audit cost is one scan per fact table regardless of orphan
    count. The four one-row aggregates union into the report."""
    out = None
    for fact, fk, dim, dk in _FK_RELS:
        f_df = t(spark, sf_dir, fact)
        d_df = t(spark, sf_dir, dim)
        orphans = (
            f_df.join(d_df, f_df[fk] == d_df[dk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        rows = f_df.agg(F.count(F.lit(1)).alias("n_rows"))
        rel = (
            rows.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(f"{fact}.{fk}->{dim}.{dk}").alias("relationship"),
                "n_rows",
                "n_orphans",
            )
        )
        out = rel if out is None else out.unionByName(rel)
    return out


@query(
    "agg_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT l_partkey, cents,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey)
                  AS BIGINT) AS cum_cents,
             (SELECT CAST(SUM(cents) AS BIGINT) FROM rev) AS tot
      FROM rev
    )
    SELECT CASE WHEN cum_cents * 5 <= tot * 4 THEN 'A'
                WHEN cum_cents * 20 <= tot * 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100 AS revenue
    FROM cum GROUP BY 1
    """,
)
def agg_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto-class analysis: parts ranked by revenue, class A =
    parts inside the first 80% of cumulative revenue, B to 95%, C the
    tail. The running share uses the distributed prefix sum
    (operators/scale.global_cumsum — range partition + per-partition
    window + broadcast offsets), NOT a partition-less window, so the
    plan has no single-reducer stage at any scale. Revenue is exact
    integer cents end-to-end; class boundaries are integer
    cross-multiplications (cum·5 <= tot·4), so no float compare sits
    on a class boundary."""
    from flirt_consume_spark.operators.scale import global_cumsum

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("cents")
    )
    cum = global_cumsum(
        rev, "cents", [F.col("cents").desc(), F.col("l_partkey")],
        cum_col="cum_cents",
    )
    tot = rev.agg(F.sum("cents").alias("_tot"))
    classed = cum.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("cum_cents") * 5 <= F.col("_tot") * 4, "A")
        .when(F.col("cum_cents") * 20 <= F.col("_tot") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("cents").cast("double") / 100).alias("revenue"),
    )


_SAMPLE_K = 100


@query(
    "sample_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             floor(ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                        1, 8))::BIGINT + 0.5) / 4294967296.0)
                   / o_totalprice * 1e9) / 1e9 AS priority
      FROM orders WHERE o_totalprice > 0
    )
    SELECT o_orderkey, o_totalprice, priority
    FROM keyed ORDER BY priority DESC, o_orderkey LIMIT {_SAMPLE_K}
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES, IPL 2006): each row gets priority u^(1/w) with u uniform in
    (0,1); the k largest priorities are a proper weighted sample. We
    rank by the monotone-equivalent ln(u)/w, with u derived from an
    md5 slice of the key — deterministic, so retries/backfills resample
    identically and the oracle replays the construction. The ONLY
    transcendental is ln(); selection and output both use the
    floor-to-1e-9 value, so a last-ulp libm difference between engines
    cannot flip the top-k boundary unless two priorities collide
    within 1e-9 — and then the o_orderkey tiebreak still agrees.
    Top-k is orderBy+limit = TakeOrdered: per-partition heaps of k,
    no global sort."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
               16, 10).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    priority = F.floor(F.log(u) / F.col("o_totalprice") * 1e9) / F.lit(1e9)
    return (
        orders.select("o_orderkey", "o_totalprice", priority.alias("priority"))
        .orderBy(F.col("priority").desc(), "o_orderkey")
        .limit(_SAMPLE_K)
    )


@query(
    "attribution_touch",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, value,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER w AS ft,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS lt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), conv AS (
      SELECT * FROM seq WHERE event_type = 'purchase' AND lt IS NOT NULL
    )
    SELECT 'first_touch' AS model, ft AS event_type,
           COUNT(*) AS n_conversions, {sql_dsum('value', 'revenue')}
    FROM conv GROUP BY ft
    UNION ALL
    SELECT 'last_touch' AS model, lt AS event_type,
           COUNT(*) AS n_conversions, {sql_dsum('value', 'revenue')}
    FROM conv GROUP BY lt
    """,
)
def attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch revenue attribution: each purchase's
    value is credited to the user's first (resp. most recent)
    non-purchase event strictly before it. ONE per-user window pass
    (frame end -1 enforces 'strictly before'; first/last with
    ignorenulls skip interleaved purchases) computes both touch
    columns, then two tiny aggregates read the purchases — the event
    stream is shuffled once, on user_id. Purchases with no preceding
    touch (first event of the user) are excluded in both models, so
    the two attributions sum to the same revenue."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    seq = ev.select(
        "user_id",
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    conv = seq.filter(
        (F.col("event_type") == "purchase") & F.col("lt").isNotNull()
    )
    first = conv.groupBy(F.col("ft").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        dsum("value", "revenue"),
    )
    last = conv.groupBy(F.col("lt").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        dsum("value", "revenue"),
    )
    return first.select(
        F.lit("first_touch").alias("model"), "*"
    ).unionByName(last.select(F.lit("last_touch").alias("model"), "*"))


@query(
    "agg_concurrency",
    oracle="""
    WITH pts AS (
      SELECT o_orderdate AS d, 1 AS delta, o_orderkey FROM orders
      UNION ALL
      SELECT o_orderdate + INTERVAL 7 DAY AS d, -1 AS delta, o_orderkey
      FROM orders
    ), swept AS (
      SELECT d, delta,
             CAST(SUM(delta) OVER (ORDER BY d, delta, o_orderkey)
                  AS BIGINT) AS cur
      FROM pts
    )
    SELECT strftime(d, '%Y-%m') AS month_key,
           CAST(MAX(cur) AS BIGINT) AS peak_active
    FROM swept GROUP BY 1
    """,
)
def agg_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per month via a distributed sweep
    line: each order contributes an 'active' interval
    [orderdate, orderdate+7d); starts emit +1, (exclusive) ends emit
    -1, and the running sum of deltas over the global (time, delta,
    key) order IS the number of concurrently-active intervals at each
    boundary — the classic sweep-line reduction of interval overlap
    counting, which never materializes overlapping PAIRS (quadratic)
    at all.

    The running sum is ``operators/scale.global_cumsum`` (range
    partition + per-partition window + broadcast offsets — no
    single-reducer stage), so the sweep scales to any interval count.
    Ordering (-1 before +1 at equal timestamps) makes ends free their
    slot before same-instant starts, matching the exclusive end.
    """
    from flirt_consume_spark.operators.scale import global_cumsum

    orders = t(spark, sf_dir, "orders")
    starts = orders.select(
        F.col("o_orderdate").alias("d"),
        F.lit(1).alias("delta"),
        "o_orderkey",
    )
    ends = orders.select(
        F.date_add("o_orderdate", 7).alias("d"),
        F.lit(-1).alias("delta"),
        "o_orderkey",
    )
    swept = global_cumsum(
        starts.unionByName(ends),
        "delta",
        [F.col("d"), F.col("delta"), F.col("o_orderkey")],
        cum_col="cur",
    )
    return swept.groupBy(
        F.date_format("d", "yyyy-MM").alias("month_key")
    ).agg(F.max("cur").cast("bigint").alias("peak_active"))


@query(
    "temporal_align",
    oracle="""
    WITH pts AS (
      SELECT o_custkey AS k, o_orderdate AS d, o_orderkey AS id,
             o_orderpriority AS a_val, CAST(NULL AS VARCHAR) AS b_val
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_custkey, o_orderdate, o_orderkey,
             CAST(NULL AS VARCHAR), o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    ), seg AS (
      SELECT k, d, id,
             last_value(a_val IGNORE NULLS) OVER w AS a_cur,
             last_value(b_val IGNORE NULLS) OVER w AS b_cur,
             lead(d) OVER w2 AS d_next
      FROM pts
      WINDOW w AS (PARTITION BY k ORDER BY d, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY k ORDER BY d, id)
    )
    SELECT k AS custkey, strftime(d, '%Y-%m-%d') AS seg_start,
           strftime(d_next, '%Y-%m-%d') AS seg_end, a_cur, b_cur
    FROM seg WHERE a_cur IS NOT NULL AND b_cur IS NOT NULL
    """,
)
def temporal_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal alignment of two per-key validity histories (the
    bitemporal 'align'/'normalize' op of temporal databases): merge
    both attribute streams into one per-key event sequence; at every
    boundary the running last-known value of EACH stream (ignorenulls
    last over the merged order) gives the combined segment, and
    lead() closes it — so N+M events produce their aligned segments
    in ONE window pass on ONE key shuffle, instead of the quadratic
    interval self-join the naive overlap formulation plans. Segments
    before both streams have reported are dropped (no fabricated
    values). The two histories here derive from disjoint halves of
    the orders stream (priority vs status), standing in for any two
    SCD2 dimension tables sharing a key."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("a_val"),
        F.lit(None).cast("string").alias("b_val"),
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("id"),
        F.lit(None).cast("string").alias("a_val"),
        F.col("o_orderstatus").alias("b_val"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("d", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = Window.partitionBy("k").orderBy("d", "id")
    seg = (
        a.unionByName(b)
        .select(
            "k",
            "d",
            F.last("a_val", ignorenulls=True).over(w).alias("a_cur"),
            F.last("b_val", ignorenulls=True).over(w).alias("b_cur"),
            F.lead("d").over(w2).alias("d_next"),
        )
        .filter(F.col("a_cur").isNotNull() & F.col("b_cur").isNotNull())
    )
    return seg.select(
        F.col("k").alias("custkey"),
        F.date_format("d", "yyyy-MM-dd").alias("seg_start"),
        F.date_format("d_next", "yyyy-MM-dd").alias("seg_end"),
        "a_cur",
        "b_cur",
    )
