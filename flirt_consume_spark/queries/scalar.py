"""Scalar-function query keys (SURVEY.md §2.H, F1–F7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.functions import haversine_km, synth_coord
from flirt_consume_spark.queries.base import query, t


@query(
    "str_normalize",
    oracle="""
    SELECT c_custkey,
           upper(trim(c_mktsegment)) AS segment,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           concat_ws('/', c_name, c_mktsegment) AS tagged,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
)
def str_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: trim/upper/lpad/concat/substring — IATA & carrier code
    normalization in the reference's parser."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper(F.trim("c_mktsegment")).alias("segment"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("tagged"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@query(
    "str_regex",
    oracle=r"""
    SELECT o_orderkey,
           regexp_extract(o_orderpriority, '^(\d)-(\w+)$', 1) AS pri_num,
           regexp_extract(o_orderpriority, '^(\d)-(\w+)$', 2) AS pri_word,
           regexp_replace(o_orderpriority, '[0-9]+', '#') AS masked
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^[0-9]-')
    """,
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: regex extract/validate/replace — code-format validation in
    the reference's parser ('^(\\d)-(\\w+)$' over priority codes)."""
    orders = t(spark, sf_dir, "orders")
    pat = r"^(\d)-(\w+)$"
    return orders.filter(F.col("o_orderpriority").rlike(r"^[0-9]-")).select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", pat, 1).alias("pri_num"),
        F.regexp_extract("o_orderpriority", pat, 2).alias("pri_word"),
        F.regexp_replace("o_orderpriority", "[0-9]+", "#").alias("masked"),
    )


@query(
    "math_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice / nullif(l_quantity, 0)) * 1e6) / 1e6
             AS unit_price,
           round(pow(l_discount, 2), 6) AS disc_sq,
           round(ln(l_extendedprice), 6) AS log_price,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           abs(l_discount - l_tax) AS rate_gap
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def math_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math scalars incl. null-safe division — the seat-weighted
    edge probabilities of the FLIRT simulator (seats/Σseats)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    # unit_price is RATIONAL (2-decimal price / integral qty) — its
    # decimal expansion can end exactly on a rounding tie, where Spark
    # (HALF_UP) and DuckDB disagree; floor-to-unit is tie-free.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.try_divide("l_extendedprice", F.nullif("l_quantity", F.lit(0)))
                * 1e6
            )
            / F.lit(1e6)
        ).alias("unit_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("rate_gap"),
    )


@query(
    "array_ops",
    oracle="""
    SELECT p_partkey,
           CAST(len(words) AS BIGINT) AS n_words,
           words[1] AS first_word,
           array_to_string(list_sort(words), '|') AS sorted_words,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
             AS total_chars,
           list_contains(words, 'green') AS has_green
    FROM (SELECT p_partkey, str_split(p_name, ' ') AS words FROM part)
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: array construction + higher-order functions (day-mask
    arrays / embeddings in the reference's domain) — transform,
    aggregate, sort, contains; scalar outputs for hash stability."""
    part = t(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("total_chars"),
        F.array_contains(words, "green").alias("has_green"),
    )


@query(
    "map_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           json_keys(props)[1] AS first_key
    FROM events
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: map ops over parsed JSON props (from_json -> MapType ->
    map_keys/element_at), scalarized for the oracle."""
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.element_at(F.array_sort(F.map_keys(m)), 1).alias("first_key"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_total,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON path extraction (events.props; Mongo documents are
    JSON-shaped in the reference) + aggregation over extracted values."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(k).alias("k_total"),
        F.max(k).alias("k_max"),
    )


@query(
    "geo_haversine",
    oracle="""
    WITH pts AS (
      SELECT n_nationkey,
             (n_nationkey * 7) % 140 - 70 + 0.25 AS lat,
             (n_nationkey * 131) % 360 - 180 + 0.25 AS lon
      FROM nation
    )
    SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
           round(2 * 6371.0 * asin(least(1.0, sqrt(
             sin(radians(b.lat - a.lat)/2) * sin(radians(b.lat - a.lat)/2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lon - a.lon)/2) * sin(radians(b.lon - a.lon)/2)
           ))), 3) AS dist_km
    FROM pts a JOIN pts b ON a.n_nationkey < b.n_nationkey
    """,
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: great-circle distance between synthesized nation coords
    (airport-to-airport distance in the reference's domain). Pure
    column expression; rounded to 3 decimals (≈1 m) for the oracle."""
    nation = t(spark, sf_dir, "nation")
    pts = nation.select(
        "n_nationkey",
        synth_coord(F.col("n_nationkey"), 7, 140, 0.25).alias("lat"),
        synth_coord(F.col("n_nationkey"), 131, 360, 0.25).alias("lon"),
    )
    a = pts.select(
        F.col("n_nationkey").alias("key_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = pts.select(
        F.col("n_nationkey").alias("key_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return pairs.select("key_a", "key_b", F.round(dist, 3).alias("dist_km"))
