"""Round-6 operator additions: LOCF forward fill, interval-overlap
self-join, the TPC-H Q13/Q18 classic shapes, and two corpus-model
builders (bigram next-token stats, BPE pair counting).

Design notes (SURVEY.md §4 discipline): every key pairs with a DuckDB
oracle and hash-matches exactly — doubles either pass through unchanged
(LOCF) or are floored to integer grains before aggregation; every
top-k orders by a full unique key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flirt_consume_spark.io import cache_path
from flirt_consume_spark.queries.base import query, t


@query(
    "win_locf",
    oracle="""
    SELECT user_id, event_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14: LOCF forward fill (last observation carried forward) — the
    standard sparse-to-dense series repair: every event carries the
    value of the user's most recent purchase (NULL until the first
    one). One per-user window pass, shuffled once on user_id; the
    filled double passes through UNCHANGED (no arithmetic), so the
    hash match is trivial-exact. Ordering is by event_id (unique,
    engine-independent), never by the ns-precision ts that Spark
    truncates to µs."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_purchase_value"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           CAST(date_diff('day',
                greatest(a.o_orderdate, b.o_orderdate),
                least(a.o_orderdate + INTERVAL 6 DAY,
                      b.o_orderdate + INTERVAL 6 DAY)) + 1 AS BIGINT)
             AS overlap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    WHERE a.o_orderdate <= b.o_orderdate + INTERVAL 6 DAY
      AND b.o_orderdate <= a.o_orderdate + INTERVAL 6 DAY
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15: interval-overlap self-join — pairs of 7-day order windows
    of the SAME customer that overlap in time, with the exact overlap
    length in days. The entity key is the blocking key (the standard
    way interval×interval joins survive scale: one hash shuffle on
    the key, per-key pair work bounded by intervals-per-entity, never
    a global time cross-product; for entity-free workloads the same
    shape works with coarse time buckets as the equi key). Overlap
    length is integer datediff arithmetic — exact in both engines."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), 6).alias("e"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    pairs = a.join(b, "custkey").filter(
        (F.col("order_a") < F.col("order_b"))
        & (F.col("sa") <= F.col("eb"))
        & (F.col("sb") <= F.col("ea"))
    )
    return pairs.select(
        "custkey",
        "order_a",
        "order_b",
        (
            F.datediff(
                F.least("ea", "eb"), F.greatest("sa", "sb")
            )
            + 1
        )
        .cast("bigint")
        .alias("overlap_days"),
    )


@query(
    "shape_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def shape_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SH9 (TPC-H Q13 shape): customer order-count distribution —
    LEFT OUTER join so zero-order customers survive into the c_count=0
    bucket, then a second aggregation over the counts. Two shuffles
    (join key, then count value); the outer join's preserved NULLs are
    exactly what COUNT(col) skips, matching the oracle bit for bit."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q18_MIN_QTY = 220


@query(
    "shape_top_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(floor(l_quantity * 100) AS BIGINT)) > {_Q18_MIN_QTY * 100}
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           big.qty_cents
    FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def shape_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SH10 (TPC-H Q18 shape): large-volume orders — aggregate the
    fact table FIRST (HAVING over the per-order quantity sum), then
    enrich only the few survivors through the dimension joins: the
    agg-before-join ordering is the difference between shuffling 600k
    lines and broadcasting a handful of hot orders at 100 TB.
    Quantities in exact integer cents."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("long"))
            .cast("bigint")
            .alias("qty_cents")
        )
        .filter(F.col("qty_cents") > _Q18_MIN_QTY * 100)
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("totalprice_cents"),
    )
    c = t(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "o_orderkey", "totalprice_cents", "qty_cents")
    )


_LM_MIN_PREFIX = 20


@query(
    "llm_ngram_lm",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tok
      FROM documents
      WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2
    ), grams AS (
      SELECT tok[i] AS w1, tok[i+1] AS w2
      FROM (SELECT doc_id, tok,
                   unnest(generate_series(1, len(tok) - 1)) AS i
            FROM toks)
    ), counts AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM grams GROUP BY w1, w2
    ), totals AS (
      SELECT w1, CAST(SUM(cnt) AS BIGINT) AS w1_total FROM counts GROUP BY w1
    ), ranked AS (
      SELECT c.w1, c.w2, c.cnt, t.w1_total,
             row_number() OVER (PARTITION BY c.w1
                                ORDER BY c.cnt DESC, c.w2) AS rnk
      FROM counts c JOIN totals t USING (w1)
      WHERE t.w1_total >= {_LM_MIN_PREFIX}
    )
    SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt, w1_total,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def llm_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L33: bigram next-token statistics — the count table behind an
    n-gram language model (and the data-side half of perplexity
    scoring): for every prefix token seen >= {_LM_MIN_PREFIX} times,
    the top-3 continuations with exact integer counts and the prefix
    total (the conditional probability is the cnt/w1_total rational —
    emitted as numerator/denominator, never a float division). One
    explode -> two hash aggs -> per-prefix top-k window; the prefix
    filter bounds output to the head of the Zipf curve, so the window
    partition count tracks vocabulary, not corpus size."""
    from flirt_consume_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(tokens("text").alias("tok")).filter(
        F.size("tok") >= 2
    )
    grams = tok.select(
        F.explode(
            F.expr(
                "transform(slice(tok, 1, size(tok) - 1), "
                "(w, i) -> struct(w AS w1, tok[i + 1] AS w2))"
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    counts = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("w1").agg(
        F.sum("cnt").cast("bigint").alias("w1_total")
    )
    ranked = (
        counts.join(totals, "w1")
        .filter(F.col("w1_total") >= _LM_MIN_PREFIX)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(
                    F.col("cnt").desc(), F.col("w2")
                )
            ),
        )
        .filter(F.col("rnk") <= 3)
    )
    return ranked.select(
        "w1", "w2", F.col("cnt").cast("bigint").alias("cnt"),
        "w1_total", F.col("rnk").cast("bigint").alias("rnk"),
    )


_BPE_TOP = 20


@query(
    "llm_bpe_pairs",
    oracle=rf"""
    WITH words AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        FROM documents
      ) WHERE len(w) >= 2 GROUP BY w
    ), pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
      GROUP BY 1
    )
    SELECT pair, cnt FROM pairs
    ORDER BY cnt DESC, pair LIMIT {_BPE_TOP}
    """,
)
def llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34: BPE merge-pair counting — the inner loop of byte-pair-
    encoding tokenizer training: count adjacent symbol pairs across
    the corpus, weighted by word frequency, and surface the top merge
    candidates. The corpus collapses to its word-frequency table
    FIRST (the standard BPE trick — pair work then tracks VOCABULARY
    size, not corpus size), then each word explodes into its
    length-1 adjacent pairs. Exact integer counts; top-k by
    (cnt DESC, pair) is a TakeOrdered, no global sort."""
    from flirt_consume_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(_BPE_TOP)
    )


@query(
    "sql_waiting_orders",
    oracle="""
    SELECT l1.l_suppkey, COUNT(*) AS numwait
    FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) >
          CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND CAST(l3.l_shipdate AS DATE) >
              CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
      )
    GROUP BY l1.l_suppkey
    """,
)
def sql_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SH11 (TPC-H Q21 shape): suppliers who were the SOLE late
    shipper on finished multi-supplier orders — the classic
    EXISTS + NOT EXISTS double correlation (the oracle keeps that
    form verbatim).

    r12 rework (guide §2.3 "aggregate before you shuffle"): the
    decorrelated semi + anti joins re-shuffled the FULL lineitem
    table by l_orderkey twice more on top of the main join. The
    correlation state per order is just two counts, so one
    per-(order, supplier) aggregation replaces both subqueries:
    with S(o) = distinct non-NULL suppliers of a status-F order and
    L(o) = distinct non-NULL LATE suppliers,
    EXISTS(other supplier)      ⇔ |S(o)| ≥ 2, and
    NOT EXISTS(other late supp) ⇔ |L(o)| = 1 (l1 itself is late, and
    NULL-supplier rows can never witness either subquery because
    `l_suppkey <> l1.l_suppkey` is NULL for them — mirrored by
    count(col) skipping NULL group keys; a NULL-suppkey l1 likewise
    fails EXISTS, mirrored by the explicit isNotNull filter).
    numwait(s) = Σ over qualifying orders of s's late-row count —
    lineitem crosses the wire ONCE (map-side partial pair agg), the
    per-order stats are a window over the tiny pair frame (groups
    bounded by suppliers-per-order, so the window never serializes),
    equivalence proven by the unchanged EXISTS-form oracle at every
    SF."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    od = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
    g = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, 1).otherwise(0).alias("_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("_late").cast("long").alias("_n_late_rows"))
    )
    wo = Window.partitionBy("l_orderkey")
    st = g.select(
        "l_orderkey",
        "l_suppkey",
        "_n_late_rows",
        F.count("l_suppkey").over(wo).alias("_n_supp"),
        F.count(
            F.when(F.col("_n_late_rows") > 0, F.col("l_suppkey"))
        ).over(wo).alias("_n_late_supp"),
    )
    return (
        st.filter(
            (F.col("_n_late_rows") > 0)
            & F.col("l_suppkey").isNotNull()
            & (F.col("_n_supp") >= 2)
            & (F.col("_n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_n_late_rows").cast("bigint").alias("numwait"))
    )


@query(
    "sql_distant_customers",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM (
      SELECT c_nationkey % 5 AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(floor(c2.c_acctbal * 100) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 100.0
          FROM customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
        )
    ) GROUP BY cntrycode
    """,
)
def sql_distant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SH12 (TPC-H Q22 shape): well-funded customers with no URGENT orders —
    an uncorrelated SCALAR subquery (the global positive-balance
    average, broadcast as a 1-row literal plan) combined with a
    correlated NOT EXISTS (decorrelated to a left-anti join). The
    average is the exact integer-cent sum divided in double — both
    engines evaluate the identical IEEE division, so the filter
    boundary cannot ulp-flip."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("cu_dc")
    t(spark, sf_dir, "orders").createOrReplaceTempView("od_dc")
    return spark.sql(
        """
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS acctbal_cents
        FROM (
          SELECT c_nationkey % 5 AS cntrycode, c_acctbal
          FROM cu_dc c
          WHERE c_acctbal > (
              SELECT CAST(SUM(CAST(floor(c2.c_acctbal * 100) AS BIGINT))
                          AS DOUBLE) / COUNT(*) / 100.0
              FROM cu_dc c2 WHERE c2.c_acctbal > 0.0
            )
            AND NOT EXISTS (
              SELECT 1 FROM od_dc o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
            )
        ) GROUP BY cntrycode
        """
    )


@query(
    "sql_min_cost",
    oracle="""
    SELECT l.l_partkey, l.l_suppkey,
           CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_cents
    FROM lineitem l
    WHERE CAST(floor(l.l_extendedprice * 100) AS BIGINT) = (
      SELECT MIN(CAST(floor(l2.l_extendedprice * 100) AS BIGINT))
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def sql_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SH13 (TPC-H Q2 shape): cheapest supply line per part via a
    CORRELATED SCALAR subquery (price = per-part minimum). Catalyst
    decorrelates it into an aggregate + equi-join on l_partkey — one
    shuffle, no per-row execution; the comparison runs on exact
    integer cents so min-equality cannot ulp-flip. Ties (several
    lines at the minimum) are all emitted, same as the oracle."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_mc")
    return spark.sql(
        """
        SELECT l.l_partkey, l.l_suppkey,
               CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM li_mc l
        WHERE CAST(floor(l.l_extendedprice * 100) AS BIGINT) = (
          SELECT MIN(CAST(floor(l2.l_extendedprice * 100) AS BIGINT))
          FROM li_mc l2 WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


_TT_VERSION = 3


@query(
    "cdc_time_travel",
    oracle=f"""
    WITH log AS (
      SELECT l_orderkey AS key,
             CASE WHEN md5(CAST(l_orderkey AS VARCHAR) || ':'
                           || CAST(l_linenumber AS VARCHAR)) < '2'
                  THEN 'D' ELSE 'U' END AS op,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(l_linenumber AS BIGINT) AS version
      FROM lineitem
    ), snap AS (
      SELECT key, op, price_cents,
             row_number() OVER (
               PARTITION BY key
               ORDER BY version DESC, price_cents DESC, op DESC) AS rn
      FROM log WHERE version <= {_TT_VERSION})
    SELECT key, price_cents
    FROM snap WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: time-travel read — the snapshot AS OF version
    {_TT_VERSION}, reconstructed by folding only change-log records at
    or below the cutoff (the lakehouse `VERSION AS OF` contract,
    computed relationally): same latest-wins merge as cdc_apply, but
    the version predicate prunes BEFORE the per-key window, so older
    snapshots cost LESS, not more. Tombstones at the cutoff still
    suppress their key — deletes time-travel correctly."""
    from flirt_consume_spark.queries.lifecycle import _change_log

    log = _change_log(spark, sf_dir).filter(
        F.col("version") <= _TT_VERSION
    )
    w = Window.partitionBy("key").orderBy(
        F.col("version").desc(),
        F.col("price_cents").desc(),
        F.col("op").desc(),
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", "price_cents")
    )


_HAV_NN = """2 * 6371.0 * asin(least(1.0, sqrt(
        sin(radians(b.lat - a.lat)/2) * sin(radians(b.lat - a.lat)/2)
        + cos(radians(a.lat)) * cos(radians(b.lat))
          * sin(radians(b.lon - a.lon)/2) * sin(radians(b.lon - a.lon)/2)
      )))"""


@query(
    "join_geo_nearest",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS key,
             (c_custkey * 7) % 140 - 70 + 0.25 AS lat,
             (c_custkey * 131) % 360 - 180 + 0.25 AS lon
      FROM customer
    ), pairs AS (
      SELECT a.key AS key, b.key AS neighbor,
             round({_HAV_NN}, 3) AS dist_km
      FROM pts a JOIN pts b ON a.key <> b.key
      WHERE {_HAV_NN} <= 150.0
    )
    SELECT key, neighbor, dist_km FROM (
      SELECT key, neighbor, dist_km,
             row_number() OVER (PARTITION BY key
                                ORDER BY dist_km, neighbor) AS rn
      FROM pairs
    ) WHERE rn = 1
    """,
)
def join_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: bounded-radius nearest-neighbor geo join — each point's
    closest other point within 150 km (the practical form of a
    spatial kNN: unbounded NN degenerates to all-pairs; real systems
    bound the search radius and widen on miss). Candidates come from
    the same 4°-grid 3×3-neighborhood join as J10 (O(|cell|²), never
    n²), symmetrized, then one per-key min via a window on the
    ROUNDED distance with an id tie-break. The oracle is brute force
    — the hash match proves the grid loses no candidate."""
    from flirt_consume_spark.functions import synth_coord
    from flirt_consume_spark.operators.spatial import grid_within_radius

    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("key"),
        synth_coord(F.col("c_custkey"), 7, 140, 0.25).alias("lat"),
        synth_coord(F.col("c_custkey"), 131, 360, 0.25).alias("lon"),
    )
    pairs = grid_within_radius(
        pts, "key", "lat", "lon", radius_km=150.0, cell_deg=4.0,
        max_abs_lat=70.0,
    )
    # r12 (guide §2.3 "aggregate before you shuffle"): mirror each
    # pair with ONE narrow explode (a unionByName of two projections
    # duplicates the grid-join subtree in the plan), and take the
    # per-key nearest with a min_by hash aggregation instead of a
    # row_number window — map-side partials collapse each task's
    # candidates to one row per key before the exchange, where the
    # window shuffled AND sorted the whole symmetrized pair stream.
    # The (dist_km, neighbor) ordering struct reproduces the window's
    # tie-break exactly.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("key_a").alias("key"),
                    F.col("key_b").alias("neighbor"),
                    F.col("dist_km"),
                ),
                F.struct(
                    F.col("key_b").alias("key"),
                    F.col("key_a").alias("neighbor"),
                    F.col("dist_km"),
                ),
            )
        ).alias("_e")
    ).select("_e.key", "_e.neighbor", "_e.dist_km")
    return (
        sym.groupBy("key")
        .agg(
            F.min_by(
                F.struct("neighbor", "dist_km"),
                F.struct("dist_km", "neighbor"),
            ).alias("_nn")
        )
        .select("key", F.col("_nn.neighbor"), F.col("_nn.dist_km"))
    )


_HASH_DIMS = 64


@query(
    "llm_hash_embed",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(md5(w), 1, 8))::BIGINT % {_HASH_DIMS} AS dim,
           COUNT(*) AS cnt
    FROM toks WHERE w <> ''
    GROUP BY doc_id, dim
    """,
)
def llm_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L35: feature hashing (the "hashing trick") — every document
    becomes a {_HASH_DIMS}-dim sparse count vector with dimensions
    assigned by md5(token) % dims: the stateless vectorizer for
    classifiers/dedup-prefilters at corpus scale (no vocabulary
    table, no fitting pass, embarrassingly parallel until one hash
    agg). Emitted in long form (doc_id, dim, cnt) — exact integer
    counts, engine-independent hashing."""
    from flirt_consume_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    dim = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
        .cast("long")
        % _HASH_DIMS
    )
    return (
        tok.select("doc_id", dim.alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "win_zscore",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1e6) AS BIGINT) AS vi
      FROM events
    ), agg AS (
      SELECT user_id, event_id, vi,
             COUNT(*) OVER win AS n,
             CAST(SUM(vi) OVER win AS BIGINT) AS s,
             SUM(vi * vi) OVER win AS q
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           floor((CAST(vi AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                 * 1e6) / 1e6 AS z,
           abs(floor((CAST(vi AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                 * 1e6) / 1e6) > 2.0 AS is_anomaly
    FROM agg
    WHERE (CAST(q AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n > 0.0
    """,
)
def win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15: rolling z-score anomaly screen — each event scored
    against the mean/stddev of its user's trailing 30 events (the
    moving-window cousin of time_seasonal's fixed-baseline screen).
    One per-key window pass carrying THREE running integer sums
    (n, Σv, Σv²) in 1e-6 units — variance by the moment identity, no
    second pass. Every double step (division, sqrt, multiply) is an
    IEEE correctly-rounded op on identical operands in both engines,
    so the floored 1e-6-grid z cannot diverge — the only ops banned
    are transcendentals. Degenerate windows (single point or zero
    variance) are excluded — a z-score is undefined there, and NULL
    booleans round-trip differently through the two engines' client
    bindings."""
    ev = t(spark, sf_dir, "events")
    vi = F.floor(F.col("value") * 1e6).cast("long")
    win = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-29, 0)
    )
    base = ev.select(
        "user_id",
        "event_id",
        vi.alias("vi"),
    ).select(
        "user_id",
        "event_id",
        "vi",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("vi").over(win).alias("s"),
        # Sigma v^2 widens past int64 when a 30-row window sits at the
        # value ceiling (30 * (5.6e8)^2 = 9.4e18 > 2^63): decimal(38)
        # on this sum only; DuckDB's HUGEINT window sum is the twin.
        F.sum(
            (F.col("vi") * F.col("vi")).cast("decimal(38,0)")
        ).over(win).alias("q"),
    )
    var = (
        F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / F.col("n")
    z_raw = (
        F.col("vi").cast("double") - F.col("s").cast("double") / F.col("n")
    ) / F.sqrt(var)
    z6 = F.floor(z_raw * 1e6) / 1e6
    return base.filter(var > 0.0).select(
        "user_id",
        "event_id",
        z6.alias("z"),
        (F.abs(z6) > 2.0).alias("is_anomaly"),
    )


@query(
    "sql_recursive",
    oracle="""
    WITH RECURSIVE parents AS (
      SELECT c_custkey + 1 AS node,
             ('0x' || substr(md5(CAST(c_custkey + 1 AS VARCHAR)), 1, 8))::BIGINT
               % (1 + (c_custkey + 1) // 8) AS parent
      FROM customer
    ), walk AS (
      SELECT node, parent AS cur, CAST(1 AS BIGINT) AS depth FROM parents
      UNION ALL
      SELECT w.node, p.parent, w.depth + 1
      FROM walk w JOIN parents p ON p.node = w.cur
      WHERE w.cur > 0
    )
    SELECT node, cur AS root, depth
    FROM walk WHERE cur = 0
    """,
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 SQL surface: native WITH RECURSIVE (Spark 4.0+) — the
    engine's own fixpoint operator, complementing the hand-unrolled
    dataflow form in `graph_ancestors`. Each customer node walks an
    md5-derived parent DAG (parent(n) = hash % (1 + n div 8):
    strictly decreasing ⇒ guaranteed termination at the virtual
    root 0, and the ÷8 contraction bounds depth at log₈ n — ~10
    levels even at 10⁹ nodes, so iteration count never becomes the
    scale problem). Spark executes the recursion as iterative
    UnionLoop steps joining only the LIVE frontier against the
    parent map; the map is materialized once (cached, 1 partition —
    it is dimension-sized) so per-iteration cost is the join, not a
    parquet re-scan. DuckDB replays identical md5 arithmetic in its
    own recursive CTE."""
    cust = t(spark, sf_dir, "customer")
    node = F.col("c_custkey") + 1
    parents = (
        cust.select(
            node.alias("node"),
            (
                F.conv(
                    F.substring(F.md5(node.cast("string")), 1, 8), 16, 10
                ).cast("long")
                % (1 + (node.cast("long") / 8).cast("long"))
            ).alias("parent"),
        )
        .coalesce(1)
        # eager localCheckpoint: materialized once before the iterative
        # plan references it (replaces cache()+count(), and leaves no
        # CacheManager entry for a later invocation to warm from)
        .localCheckpoint(eager=True)
    )
    parents.createOrReplaceTempView("par_rec")
    # The recursion emits ~nodes x depth rows across iterations, so the
    # default 1M-row dev guard (spark.sql.cteRecursionRowLimit) trips at
    # ~100x local scale already. Raised to a FINITE 1e8 (not -1): the
    # runaway-recursion guard stays armed for every later query in the
    # session, just sized for real data volumes; termination here is
    # additionally guaranteed by the level limit (100) and the strictly
    # decreasing parent map. Session-scoped by design — documented
    # engine tuning, same class as load_table's nanosAsLong.
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(100_000_000))
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT node, parent AS cur, CAST(1 AS BIGINT) AS depth
          FROM par_rec
          UNION ALL
          SELECT w.node, p.parent, w.depth + 1
          FROM walk w JOIN par_rec p ON p.node = w.cur
          WHERE w.cur > 0
        )
        SELECT node, cur AS root, depth
        FROM walk WHERE cur = 0
        """
    )


@query(
    "agg_mode",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, qty) AS rk
      FROM counted
    )
    SELECT l_returnflag, qty AS modal_qty, cnt AS modal_cnt
    FROM ranked WHERE rk = 1
    ORDER BY l_returnflag
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24: statistical mode per group with a DETERMINISTIC tie-break
    (highest count, then smallest value) — Spark's built-in
    F.mode() leaves ties engine-defined, so the portable form is
    count-then-argmax: one hash agg on the compound key (partial
    combine upstream — the shuffle carries one row per distinct
    (group, value), not per input row), then ONE max_by hash agg per
    group instead of a per-group top-1 window — the counted frame is
    (group × distinct values), so with few groups and a large value
    domain a window would serialize it into one reducer per group;
    the argmax agg partial-combines map-side. Ordinal
    (cnt, −qty) is unique per group ⇒ deterministic."""
    li = t(spark, sf_dir, "lineitem")
    counted = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counted.groupBy("l_returnflag")
        .agg(
            F.max_by(
                F.struct("qty", "cnt"),
                F.struct(F.col("cnt"), (-F.col("qty")).alias("nq")),
            ).alias("s")
        )
        .select(
            "l_returnflag",
            F.col("s.qty").alias("modal_qty"),
            F.col("s.cnt").alias("modal_cnt"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_nullsafe",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'O' THEN NULL
                  ELSE o_orderstatus END AS status_key
      FROM orders
    ), dim AS (
      SELECT DISTINCT
             CASE WHEN o_orderstatus = 'O' THEN NULL
                  ELSE o_orderstatus END AS status_key,
             CASE WHEN o_orderstatus = 'O' THEN 'open-unclassified'
                  ELSE 'closed-' || o_orderstatus END AS status_label
      FROM orders
    )
    SELECT d.status_label, COUNT(*) AS cnt
    FROM o JOIN dim d ON o.status_key IS NOT DISTINCT FROM d.status_key
    GROUP BY d.status_label
    ORDER BY d.status_label
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J17: null-safe equality join (<=> / IS NOT DISTINCT FROM) —
    NULL keys MATCH each other instead of silently dropping, the
    semantics dirty-dimension joins actually need (an unclassified
    fact row should hit the 'unknown' dim row, not vanish). Spark
    plans EqualNullSafe as an ordinary broadcast HASH join (keys
    coalesce to a proxy), not a nested loop — asserted in the plan
    audit. The NULL bucket is derived in-query so both engines see
    the identical key distribution."""
    orders = t(spark, sf_dir, "orders")
    skey = F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    o = orders.select("o_orderkey", skey.alias("status_key"))
    dim = (
        orders.select(
            skey.alias("d_key"),
            F.when(
                F.col("o_orderstatus") == "O", F.lit("open-unclassified")
            )
            .otherwise(F.concat(F.lit("closed-"), F.col("o_orderstatus")))
            .alias("status_label"),
        )
        .distinct()
    )
    return (
        o.join(F.broadcast(dim), o["status_key"].eqNullSafe(dim["d_key"]))
        .groupBy("status_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("status_label")
    )


@query(
    "win_range_hour",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
           CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) OVER w AS BIGINT)
             AS sum_micro_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W16: time-based RANGE window frame — per user, events and
    value volume in the TRAILING HOUR of each event. Unlike the
    ROWS frames elsewhere (win_rolling/win_zscore), the frame bound
    is a VALUE offset on the ordering key (epoch µs), so peers with
    equal timestamps share a frame and gaps shrink it — the
    correct semantics for rate limiting / velocity features. One
    hash shuffle on user_id; the frame scan is a per-partition
    two-pointer pass, never a self-join. Value sums stay integer
    (exact) end to end."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1e6).cast("long").alias("_v"),
        us.alias("_us"),
    ).select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt_1h"),
        F.sum("_v").over(w).cast("bigint").alias("sum_micro_1h"),
    )


@query(
    "sql_lateral",
    oracle="""
    SELECT n.n_name, top.c_custkey, top.c_acctbal
    FROM nation n JOIN LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) top ON TRUE
    ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey
    """,
)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 SQL surface: correlated LATERAL subquery with ORDER BY +
    LIMIT — top-2 customers per nation written the way an analyst
    writes it. Catalyst decorrelates the per-row subquery into a
    rank-within-partition plan (one hash shuffle on the correlation
    key + per-group limit), NOT |nation| separate scans — the same
    physical shape as the hand-written window top-k in `topk`, which
    is the point: the declarative per-row form must not cost per-row
    execution. Deterministic ties via the c_custkey tie-break on
    both engines."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("na_lat")
    t(spark, sf_dir, "customer").createOrReplaceTempView("cu_lat")
    return spark.sql(
        """
        SELECT n.n_name, top.c_custkey, top.c_acctbal
        FROM na_lat n JOIN LATERAL (
          SELECT c_custkey, c_acctbal
          FROM cu_lat
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) top
        ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey
        """
    )


@query(
    "sql_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(floor(l_quantity * 100) AS BIGINT) END) AS BIGINT)
             AS O_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(floor(l_quantity * 100) AS BIGINT) END) AS BIGINT)
             AS F_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 SQL surface: the PIVOT clause (vs A8's DataFrame .pivot) —
    the explicit IN list means the output schema is known at PLAN
    time, so no extra distinct-values pass over the fact (the
    DataFrame form without values pays one); executes as a single
    conditional aggregation, one shuffle on the group key. Quantities
    in exact integer cents."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_piv")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(floor(l_quantity * 100) AS BIGINT) AS q
          FROM li_piv
        )
        PIVOT (SUM(q) AS qty FOR l_linestatus IN ('O' AS O, 'F' AS F))
        ORDER BY l_returnflag
        """
    ).select(
        "l_returnflag",
        F.col("O").alias("O_qty"),
        F.col("F").alias("F_qty"),
    )


@query(
    "scan_binary",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 20 AND text IS NOT NULL
      AND octet_length(encode(text)) > 0
    """,
)
def scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: binaryFile source — whole files as (path, content) binary
    rows, the ingestion path for image/audio/video corpora
    (operators/multimodal.py consumes exactly this shape). Fixture:
    the first 20 documents written once as individual UTF-8 .txt
    files; the scan reads them back as opaque bytes, recovers the id
    from the file name, and fingerprints the payload. The oracle
    hashes the same UTF-8 bytes via DuckDB's encode() — proving the
    bytes-on-disk round-trip, not just the text. At 100 TB this
    source shards by file; content never transits the driver.

    ZERO-BYTE files are SKIPPED by Spark's binaryFile source (file
    splitting yields no partition for an empty file — verified: a
    0-byte doc_N.txt on disk produces no row). An ingest counting on
    empty assets must track them in a metadata table; the oracle
    mirrors the convention with octet_length > 0 (unicode-mirror
    regression: empty-string documents)."""
    import hashlib

    path = cache_path("binfiles", sf_dir, "documents")
    marker = os.path.join(path, "_done")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        rows = (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 20)
            .select("doc_id", "text")
            .collect()  # 20-row fixture build, once per (sf, fingerprint)
        )
        for r in rows:
            # A NULL payload has no file — matching the oracle's
            # WHERE text IS NOT NULL (a binaryFile corpus simply
            # lacks the asset; it cannot hold a "NULL file").
            if r.text is None:
                continue
            with open(os.path.join(path, f"doc_{r.doc_id}.txt"), "wb") as f:
                f.write(r.text.encode("utf-8"))
        with open(marker, "w") as f:
            f.write(str(len(rows)))
    df = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.txt"
    ).load(path)
    return df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "agg_skew_kurt",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(floor(value * 10) AS BIGINT)) AS s1,
             SUM(CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT)) AS s2,
             SUM(CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT)) AS s3,
             SUM(CAST(CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT)
                 * CAST(floor(value * 10) AS BIGINT) AS HUGEINT)) AS s4
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           floor(((CAST(s3 AS DOUBLE) / n)
                  - (3.0 * (CAST(s1 AS DOUBLE) / n)) * (CAST(s2 AS DOUBLE) / n)
                  + (2.0 * (CAST(s1 AS DOUBLE) / n)) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / (sqrt((CAST(s2 AS DOUBLE) / n)
                         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * ((CAST(s2 AS DOUBLE) / n)
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 * 1e6) / 1e6 AS skewness,
           floor(((CAST(s4 AS DOUBLE) / n)
                  - (4.0 * (CAST(s1 AS DOUBLE) / n)) * (CAST(s3 AS DOUBLE) / n)
                  + (6.0 * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                    * (CAST(s2 AS DOUBLE) / n)
                  - (3.0 * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                    * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 / (((CAST(s2 AS DOUBLE) / n)
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * ((CAST(s2 AS DOUBLE) / n)
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 * 1e6) / 1e6 - 3.0 AS excess_kurtosis
    FROM m
    WHERE (CAST(s2 AS DOUBLE) / n)
          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) > 0
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26: skewness + excess kurtosis per group — Spark's built-in
    skewness()/kurtosis() stream Welford-style moments whose float
    result depends on partition merge order, so they can never
    hash-match across engines. Instead: the agg_stats discipline
    extended to 3rd/4th raw moments as EXACT integer sums on a
    deci-unit grid (Σx⁴ crosses int64 at ~10⁵ rows, so that one sum
    alone widens to decimal(38); the rest stay on the compact long
    fast path), then one identical IEEE expression on both engines,
    floored to a 1e-6 grid. One shuffle, partial aggregation
    upstream, constant output."""
    ev = t(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 10).cast("long")
    m = ev.select("event_type", x.alias("x")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(
            (F.col("x") * F.col("x") * F.col("x") * F.col("x")).cast(
                "decimal(38,0)"
            )
        ).alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - mu * mu
    m3 = (
        F.col("s3").cast("double") / F.col("n")
        - (F.lit(3.0) * mu) * (F.col("s2").cast("double") / F.col("n"))
        + (F.lit(2.0) * mu) * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - (F.lit(4.0) * mu) * (F.col("s3").cast("double") / F.col("n"))
        + (F.lit(6.0) * (mu * mu)) * (F.col("s2").cast("double") / F.col("n"))
        - (F.lit(3.0) * (mu * mu)) * (mu * mu)
    )
    # zero-variance groups: floor(NaN) diverges across engines (Spark's
    # long-typed floor vs DuckDB's NaN-propagating floor), so
    # degenerate groups are excluded on BOTH sides — win_zscore's device.
    return m.filter(m2 > 0).select(
        "event_type",
        # m2^1.5 as sqrt(m2)*m2 and m2^2 as m2*m2: sqrt and multiply are
        # IEEE correctly-rounded on BOTH engines, pow() is only 1-ulp on
        # the JVM — the grid-floor discipline bans pow on principle
        # (same ruling as sample_weighted's ln() removal).
        (F.floor(m3 / (F.sqrt(m2) * m2) * 1e6) / 1e6).alias("skewness"),
        (F.floor(m4 / (m2 * m2) * 1e6) / 1e6 - 3.0).alias(
            "excess_kurtosis"
        ),
    )


@query(
    "time_workdays",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
               AS n1,
             date_diff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE))
               AS n2
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), w AS (
      -- Euclidean div/mod spelled in integer ops that are exact for
      -- NEGATIVE n too (pre-anchor dates): DuckDB's // truncates
      -- toward zero and % keeps the dividend's sign, so the naive
      -- n // 7 / n % 7 pair diverges from Spark's floor/pmod on any
      -- date before the 1970 anchor (epoch-mirror regression).
      SELECT o_orderpriority,
             (5 * ((n2 - ((n2 % 7) + 7) % 7) // 7)
                + least(((n2 % 7) + 7) % 7, 5))
             - (5 * ((n1 - ((n1 % 7) + 7) % 7) // 7)
                + least(((n1 % 7) + 7) % 7, 5)) AS wd
      FROM d
    )
    SELECT o_orderpriority,
           CAST(SUM(wd) AS BIGINT) AS total_workdays,
           floor(CAST(SUM(wd) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
             AS mean_workdays
    FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def time_workdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: business-day lead time (order date → ship date excluding
    weekends) per priority class. Weekday counting is CLOSED FORM —
    W(n) = 5·(n div 7) + min(n mod 7, 5) with n = days since an
    anchor MONDAY (1970-01-05), so the count is pure integer
    arithmetic identical in both engines (engine dayofweek()
    conventions differ: Spark 1=Sun..7=Sat, DuckDB 0=Sun..6=Sat —
    the anchor-mod trick sidesteps them, same device as
    time_seasonal). No calendar explode, no UDF: a 100-TB fact pays
    one scan + one agg shuffle."""
    j = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-05").cast("date")
            ).alias("n1"),
            F.datediff(
                F.to_date("l_shipdate"), F.lit("1970-01-05").cast("date")
            ).alias("n2"),
        )
    )

    def wfun(n):
        # Weekdays from the anchor Monday to day n, valid for ALL n
        # (floor division + non-negative pmod — a pre-anchor date has
        # negative n; see the oracle comment for why the naive
        # truncating pair breaks there).
        return 5 * F.floor(n / 7) + F.least(F.pmod(n, 7), F.lit(5))

    wd = (wfun(F.col("n2")) - wfun(F.col("n1"))).alias("wd")
    return (
        j.select("o_orderpriority", wd)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("wd").cast("bigint").alias("total_workdays"),
            (
                F.floor(
                    F.sum("wd").cast("double") / F.count(F.lit(1)) * 1e6
                )
                / 1e6
            ).alias("mean_workdays"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH wsum AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, cents, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM wsum
    )
    SELECT l_returnflag,
           CAST(MIN(cents) AS DOUBLE) / 100 AS weighted_median_price
    FROM cum WHERE 2 * cw >= tw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27: quantity-weighted median price per group — the smallest
    value whose cumulative weight reaches half the total (pure
    integer compare 2·cw ≥ tw: no division, no float boundary).

    Scale design: ``operators/scale.bucketized_weighted_quantile`` —
    two-level bucket search whose post-scan work is bounded by the
    VALUE DOMAIN, not by N. Level 1 aggregates the fact straight to
    2^10-cent bucket weights (≈11k buckets for any realistic price
    domain, regardless of row count), so the per-flag running sum
    over buckets is a bounded window; level 2 broadcast-prunes to
    the one median bucket per flag and resolves the exact cents with
    one more bounded window. Versus the former range-partitioned
    global cumsum over every (flag, distinct cents): no sampling
    pass, no range shuffle, no layout checkpoint — 3.0-3.8 s →
    1.7-2.0 s at sf0.1, bit-identical output. r13 (VERDICT task 5):
    both levels derive from ONE pinned (flag, cents) aggregation —
    at 100 TB the only full-width stage is a single narrow fact
    scan feeding a hash aggregation."""
    from flirt_consume_spark.operators.scale import (
        bucketized_weighted_quantile,
    )

    li = t(spark, sf_dir, "lineitem")
    fact = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    med = bucketized_weighted_quantile(
        fact, ["l_returnflag"], "cents", "w", q_num=1, q_den=2
    )
    return med.select(
        "l_returnflag",
        (F.col("wq").cast("double") / 100).alias("weighted_median_price"),
    ).orderBy("l_returnflag")


@query(
    "time_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS s,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               + 6 AS e
      FROM orders
    ), flagged AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_span
      FROM iv
    ), numbered AS (
      SELECT o_custkey, s, e,
             SUM(new_span) OVER (PARTITION BY o_custkey ORDER BY s, e
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    )
    SELECT o_custkey,
           CAST(COUNT(DISTINCT span_id) AS BIGINT) AS n_spans,
           CAST(SUM(span_days) AS BIGINT) AS covered_days
    FROM (
      SELECT o_custkey, span_id, MAX(e) - MIN(s) + 1 AS span_days
      FROM numbered GROUP BY o_custkey, span_id
    ) GROUP BY o_custkey
    """,
)
def time_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: merge overlapping intervals into maximal spans — each
    customer's 7-day order windows coalesced into disjoint coverage
    spans (n_spans + total covered days). The single-pass sweep:
    sort within key, flag a new span when the start clears the
    running max of PRIOR ends (cumulative max window — handles
    contained intervals that a lag(end) check would mis-split), then
    prefix-sum the flags into span ids. Two window passes + one agg,
    all shuffled once on the entity key; dates as integer day
    ordinals, exact in both engines. Complements time_islands
    (point gaps) and join_interval_overlap (pairwise overlap)."""
    iv = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("s"),
    ).withColumn("e", F.col("s") + 6)
    wprev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "o_custkey",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(wprev),
                F.lit(-9223372036854775808),
            ),
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    )
    wcum = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.select(
        "o_custkey", "s", "e", F.sum("new_span").over(wcum).alias("span_id")
    )
    spans = numbered.groupBy("o_custkey", "span_id").agg(
        (F.max("e") - F.min("s") + 1).alias("span_days")
    )
    return spans.groupBy("o_custkey").agg(
        F.countDistinct("span_id").cast("bigint").alias("n_spans"),
        F.sum("span_days").cast("bigint").alias("covered_days"),
    )
