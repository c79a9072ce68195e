"""Table-evolution query keys: snapshot diff and row-level MERGE.

The reference's consume loop is exactly this pair — each monthly
extract is compared/merged against the standing state. Both keys
derive two deterministic snapshots from the orders table (drop-10% as
"old", drop-1/7th with price bumps as "new") so the full-outer-join
semantics are DuckDB-replayable and hash-checked.

Registered after queries/corpus.py — the first 50 registry slots stay
reserved for keys awaiting their first external verification row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.operators.relational import merge_upsert, snapshot_diff
from flirt_consume_spark.queries.base import query, t

_OLD_SQL = """
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 0
"""
_NEW_SQL = """
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 7 <> 0
"""


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.filter(F.col("o_orderkey") % 10 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")),
    )
    return old, new


@query(
    "snapshot_diff",
    oracle=f"""
    WITH old AS ({_OLD_SQL}), new AS ({_NEW_SQL})
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                 AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
)
def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month diff: every order key classified added /
    removed / changed / unchanged between two snapshots — the
    reference's schedule-comparison semantic as one co-partitioned
    full-outer join (operators/relational.snapshot_diff). At scale
    both sides are pruned month partitions of the same sink."""
    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


@query(
    "sink_merge",
    oracle=f"""
    WITH old AS ({_OLD_SQL}), new AS ({_NEW_SQL})
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
           COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus
    FROM old t FULL OUTER JOIN new s ON t.o_orderkey = s.o_orderkey
    """,
)
def sink_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE (upsert): the new snapshot updates matching
    rows and inserts unmatched ones while unmatched standing rows
    survive — WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT computed
    as a full-outer join with source-wins coalescing
    (operators/relational.merge_upsert)."""
    old, new = _snapshots(spark, sf_dir)
    return merge_upsert(old, new, ["o_orderkey"])
