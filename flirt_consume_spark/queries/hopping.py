"""Batch hopping windows & index-size estimation (round-6, seventh
wave).

- ``time_hopping``: batch SLIDING (hopping) window aggregation — 7-day
  windows advancing 1 day, revenue per window. The batch sibling of
  ``stream_sliding``: each fact row explodes into the ≤7 window
  starts that contain it (a bounded map-side explode, windows/hop),
  then ONE hash agg — never a self-join on a date-range predicate,
  which is the quadratic way to write this;
- ``llm_index_size``: inverted-index size estimation — per token,
  the exact varint byte cost of delta-encoding its sorted posting
  list (the standard Lucene-style layout), plus raw cost for
  comparison. Sizing the index BEFORE building it is how a corpus
  team budgets storage; deltas/varint lengths are pure integer math
  off one distinct + one window per token (token keys are
  high-cardinality — parallel).

Hash-match discipline: everything is integer-exact; no doubles at
all in llm_index_size, one exact-integer division in time_hopping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flirt_consume_spark.queries.base import query, t
from flirt_consume_spark.operators import text as X

_HOP_DAYS = 7  # window length in days; hop = 1 day


@query(
    "time_hopping",
    oracle=f"""
    WITH ex AS (
      SELECT CAST(o_orderdate AS DATE) + CAST(-g.off AS INTEGER) AS wstart,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      CROSS JOIN (SELECT unnest(generate_series(0, {_HOP_DAYS - 1}))
                  AS off) g
    )
    SELECT wstart,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM ex GROUP BY 1
    """,
)
def time_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E32: hopping-window aggregation in BATCH — total revenue in
    every 7-day window advancing 1 day (window [wstart, wstart+7)).
    The batch sibling of stream_sliding, and the scale-correct
    shape: each order explodes map-side into the 7 window starts
    containing it (bounded fan-out = windows/hop), then one hash
    agg on wstart — NOT a windows×facts range join (quadratic
    candidate generation) and NOT a per-window scan loop.

    Exactness: revenue is floor-scaled integer cents; window starts
    are pure date arithmetic. Scale: fan-out is a constant 7×
    projection (no shuffle until the final agg); group count is
    calendar-bounded."""
    od = t(spark, sf_dir, "orders")
    offs = F.array(*[F.lit(i) for i in range(_HOP_DAYS)])
    ex = (
        od.select(
            F.col("o_orderdate").cast("date").alias("d"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .select("d", "cents", F.posexplode(offs).alias("pos", "_off"))
        .select(
            F.expr("date_add(d, -pos)").alias("wstart"),
            "cents",
        )
    )
    return ex.groupBy("wstart").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("rev_cents"),
    )


# --- inverted-index size estimation --------------------------------------

_TOK_SQL = r"regexp_split_to_array(lower(trim(text)), '\s+')"


@query(
    "llm_index_size",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest({_TOK_SQL}) AS token FROM documents)
    ), deltas AS (
      SELECT token, doc_id,
             doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY token
                                                 ORDER BY doc_id), 0)
               AS delta
      FROM pairs
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(CASE WHEN delta < 128 THEN 1
                         WHEN delta < 16384 THEN 2
                         WHEN delta < 2097152 THEN 3
                         WHEN delta < 268435456 THEN 4
                         ELSE 5 END) AS BIGINT) AS varint_bytes,
           CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes
    FROM deltas
    GROUP BY 1
    """,
)
def llm_index_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L43: inverted-index size estimation — per token, the exact
    byte cost of the Lucene-style posting layout (sorted doc ids,
    delta-encoded, varint-compressed; 7 payload bits per byte)
    versus raw int64 postings. The capacity-planning pass a corpus
    team runs before building llm_inverted_index for real: high-df
    stopword tokens compress ~8× (dense deltas → 1-byte varints),
    rare tokens don't — the Zipf-shaped storage curve.

    Exactness: deltas and varint lengths are pure integer CASE
    thresholds (128^k boundaries); no doubles anywhere. Scale: one
    explode + distinct (narrow + one shuffle on (doc, token)), one
    lag window PARTITIONED BY TOKEN (high-cardinality — parallel;
    the per-token posting list is exactly what a real index build
    sorts), one hash agg."""
    docs = t(spark, sf_dir, "documents")
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                X.tokens("text")
            ).alias("token"),
        )
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    deltas = pairs.withColumn(
        "delta",
        F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0)),
    )
    vbytes = (
        F.when(F.col("delta") < 128, 1)
        .when(F.col("delta") < 16384, 2)
        .when(F.col("delta") < 2097152, 3)
        .when(F.col("delta") < 268435456, 4)
        .otherwise(5)
    )
    return deltas.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(vbytes).cast("bigint").alias("varint_bytes"),
        (F.count(F.lit(1)) * 8).cast("bigint").alias("raw_bytes"),
    )
