"""Headroom probe: times the heavy operator pipelines at Nx the
largest local scale factor by self-multiplying inputs (union of N
copies with shifted keys — preserves key cardinality ratios and
group counts, so plans face N× rows AND N× distinct keys).

This is the local stand-in for "would the plan survive a 100×
scale-up": if wall-time grows ~linearly in N while the plan shape
stays fixed (same audit output), the operator scales by adding
executors; superlinear growth or a plan flip marks a bottleneck.

Usage: python tools/probe_scale.py [--sf DIR] [--mult N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.session import get_spark


def multiply(df: DataFrame, key_cols: list[str], n: int, stride: int) -> DataFrame:
    """N copies with all key columns shifted by copy*stride — distinct
    keys scale with rows, as they would in real data."""
    copies = []
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * stride))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def timed(name: str, df: DataFrame) -> dict:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return {"probe": name, "sec": round(time.time() - t0, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    n = args.mult
    spark = get_spark("probe-scale")

    li = load_table(spark, args.sf, "lineitem")
    od = load_table(spark, args.sf, "orders")
    docs = load_table(spark, args.sf, "documents")
    # warm-up
    for d in (li, od, docs):
        d.count()

    li_n = multiply(li, ["l_orderkey"], n, 10_000_000)
    od_n = multiply(od, ["o_orderkey", "o_custkey"], n, 10_000_000)
    docs_n = multiply(docs, ["doc_id"], n, 10_000_000)

    results = [
        # Q1-shape aggregation: two-phase hash agg, fixed group count.
        timed(
            f"agg_q1_x{n}",
            li_n.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sq"),
                F.count(F.lit(1)).alias("cnt"),
            ),
        ),
        # Fact-fact join: shuffle join on N-times-larger key domain.
        timed(
            f"join_fact_x{n}",
            od_n.join(li_n, od_n["o_orderkey"] == li_n["l_orderkey"]).groupBy(
                "o_orderstatus"
            ).agg(F.count(F.lit(1)).alias("cnt")),
        ),
        # Distributed top-k over the multiplied fact table.
        timed(
            f"topk_x{n}",
            li_n.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
            .limit(100),
        ),
        # The shingle/MinHash LSH pipeline end-to-end on N-times docs.
        timed(f"minhash_lsh_x{n}", _lsh(docs_n)),
        # Zero-shuffle quality signal: must scale embarrassingly.
        timed(f"repetition_x{n}", _rep(docs_n)),
        # Batch sessionization: one shuffle on user_id, window + agg.
        timed(f"sessionize_x{n}", _sess(multiply(
            load_table(spark, args.sf, "events"), ["event_id", "user_id"],
            n, 10_000_000))),
        # Context chunking: zero-shuffle, must scale embarrassingly.
        timed(f"chunk_x{n}", _chunk(docs_n)),
        # Contamination probe: broadcast benchmark grams vs N× stream.
        timed(f"contaminate_x{n}", _contam(docs_n)),
        # Bloom semi join: KB bitmap broadcast, fact side never
        # shuffles non-candidates — must scale with the fact scan.
        timed(f"bloom_x{n}", _bloom(li_n, od_n)),
        # Snapshot diff / MERGE: one co-partitioned shuffle each.
        timed(f"snapdiff_x{n}", _snapdiff(od_n)),
        timed(f"merge_x{n}", _merge(od_n)),
        # Z-order layout: one tiny bounds agg + range partition + sort.
        timed(f"zorder_x{n}", _zorder(od_n)),
    ]
    base = [
        timed("agg_q1_x1", li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sq"),
            F.count(F.lit(1)).alias("cnt"),
        )),
        timed("join_fact_x1", od.join(li, od["o_orderkey"] == li["l_orderkey"])
              .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))),
        timed("topk_x1", li.orderBy(
            F.desc("l_extendedprice"), "l_orderkey", "l_linenumber").limit(100)),
        timed("minhash_lsh_x1", _lsh(docs)),
        timed("repetition_x1", _rep(docs)),
        timed("sessionize_x1", _sess(load_table(spark, args.sf, "events"))),
        timed("chunk_x1", _chunk(docs)),
        timed("contaminate_x1", _contam(docs)),
        timed("bloom_x1", _bloom(li, od)),
        timed("snapdiff_x1", _snapdiff(od)),
        timed("merge_x1", _merge(od)),
        timed("zorder_x1", _zorder(od)),
    ]
    for r in results + base:
        print(json.dumps(r))
    by = {r["probe"]: r["sec"] for r in results + base}
    for stem in ("agg_q1", "join_fact", "topk", "minhash_lsh",
                 "repetition", "sessionize", "chunk", "contaminate",
                 "bloom", "snapdiff", "merge", "zorder"):
        hi, lo = by[f"{stem}_x{n}"], max(by[f"{stem}_x1"], 0.01)
        print(json.dumps({"probe": f"{stem}_scaling", "ratio_vs_linear":
                          round(hi / lo / n, 2)}))


def _lsh(docs: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators import dedup as D

    return D.lsh_candidate_pairs(D.minhash_signatures(D.shingle_stream(docs)))


def _rep(docs: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.text import repetition_signal

    return repetition_signal(docs)


def _chunk(docs: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.text import tokens

    step = docs.select("doc_id", tokens("text").alias("_tok"))
    ch = step.select(
        "doc_id", "_tok",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.size("_tok") - 1) / 48).cast("int"))
        ).alias("k"),
    )
    piece = F.slice(F.col("_tok"), F.col("k") * 48 + 1, 64)
    return ch.select(
        "doc_id", F.col("k").alias("chunk_id"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )


def _contam(docs: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.dedup import shingle_table

    sh = shingle_table(docs, n=3)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    train = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def _bloom(li: DataFrame, od: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.scale import bloom_semi_join

    sel = od.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    return bloom_semi_join(li, sel, "l_orderkey", "o_orderkey").groupBy(
        "l_returnflag"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def _snapdiff(od: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.relational import snapshot_diff

    old = od.filter(F.col("o_orderkey") % 10 != 0)
    new = od.filter(F.col("o_orderkey") % 10 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


def _merge(od: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.relational import merge_upsert

    src = od.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    return merge_upsert(od, src, ["o_orderkey"])


def _zorder(od: DataFrame) -> DataFrame:
    from flirt_consume_spark.operators.scale import zorder_layout

    return zorder_layout(
        od.select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_custkey",
        "o_totalprice",
    )


def _sess(ev: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id", "ts",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


if __name__ == "__main__":
    main()
