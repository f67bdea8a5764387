"""Gate entries for the relational operator inventory (SURVEY.md §2)
over the TPC-H-ish testdata tables.  Each entry name is prefixed with
the SURVEY operator id it evidences; the paired DuckDB SQL lives in
ORACLES below.

Determinism rules used throughout:
- any top-N is cut by an explicit total order (tie-break on a key);
- any float output is rounded (4-6 dp) on BOTH sides;
- sampling is hash-based (md5), never RNG.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------------------ F class

def f1_regex_filter(spark, sf_dir):
    """F1: regex accept/reject set (URL_IGNORE / URL_MUST_CONTAIN,
    reference src/reddit_dump.rs:58-97) -> rlike chain."""
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").rlike("(ECONOMY|SMALL)") & ~F.col("p_name").rlike("^s")
    ).select("p_partkey", "p_name", "p_type")


def f2_compound_predicates(spark, sf_dir):
    """F2: boolean field predicates (reddit_dump.rs:159-162)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        | ((F.col("l_discount") < 0.02) & (F.col("l_linestatus") == "O"))
    ).select("l_orderkey", "l_linenumber")


def f4_ts_highwater(spark, sf_dir):
    """F4: resume high-water-mark timestamp filter (reddit_dump.rs:164-172)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("ts") > F.lit("2024-01-25 00:00:00")).select(
        "event_id", "ts"
    )


def f6_hash_sample(spark, sf_dir):
    """F6: deterministic (hash-based) Bernoulli sample — the seeded-rng
    sample of dump_processor.rs:154 made reproducible across engines."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return li.filter(F.substring(F.md5(key.cast("binary")), 1, 1) == "0").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def f12_regex_rewrite(spark, sf_dir):
    """F12: ordered regex rewrite rules (reddit_dump.rs:106-118)."""
    cu = _t(spark, sf_dir, "customer")
    name = F.regexp_replace(F.col("c_name"), "Customer#?", "cust-")
    name = F.regexp_replace(name, "0+([0-9])", "$1")
    return cu.select("c_custkey", name.alias("c_name_rewritten"))


def f13_regexp_extract(spark, sf_dir):
    """F13: regex capture extraction (reddit_dump.rs:120-124)."""
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "([0-9]+)$", 1).alias("trailing_digits"),
    )


# ------------------------------------------------------------------ J class

def j1_left_join_counts(spark, sf_dir):
    """J1: LEFT JOIN work detection (mse.py:95) — customers with their
    order count, including zero."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def j2_broadcast_dim_join(spark, sf_dir):
    """J2: hash-map lookup join (main.rs:696-752) -> broadcast hash join
    of the small dim table."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def j4_positional_zip(spark, sf_dir):
    """J4: positional zip join (distances x labels, main.rs:904-906) ->
    posexplode of the embedding array."""
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val")
    )


def j6_anti_join(spark, sf_dir):
    """J6/U1: set-difference via left_anti (GC of deleted files,
    main.rs:769-794) — customers with no orders."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_anti"
    ).select("c_custkey")


def j6_semi_join(spark, sf_dir):
    """J6: set-membership via left_semi (seen-set, mse.py:237-243)."""
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return su.join(li, su.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# ------------------------------------------------------------------ A class

def a2_global_counters(spark, sf_dir):
    """A2: min/max/count/sum counters (dump_processor.rs:155-158)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


def a3_histogram(spark, sf_dir):
    """A3: fixed-width histogram (dump_processor.rs:78-107) — discount
    into 1%-wide buckets."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket", F.floor(F.col("l_discount") * 100).cast("int")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def a4_quantiles(spark, sf_dir):
    """A4: quantile/CDF aggregation (compute_cdf.py:64-74) — exact
    interpolated percentiles.

    Hash-stable across engines by construction: both sides evaluate the
    SAME interpolation expression ``v[lo] + frac * (v[lo+1] - v[lo])``
    on the SAME input doubles, then emit fixed-point integers
    (floor(x*1e4 + 0.5)), so no engine-specific interpolation order or
    decimal-rounding rule can flip the value hash.  (Spark's built-in
    ``percentile`` is the scale path — an exact streaming aggregate —
    but its interpolation differs from DuckDB's quantile_cont by 1 ulp,
    which survives round(x, 4); see VERDICT r01 §wrong-1.)"""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.sort_array(F.collect_list("l_extendedprice")).alias("v"),
        F.count("l_extendedprice").alias("n"),
    )

    def q(p: float, name: str):
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        lo = F.floor(pos).cast("long")
        frac = pos - lo.cast("double")
        vlo = F.element_at("v", (lo + F.lit(1)).cast("int"))
        vhi = F.element_at(
            "v", F.least(lo + F.lit(2), F.col("n")).cast("int")
        )
        val = vlo + frac * (vhi - vlo)
        return F.floor(val * F.lit(10000.0) + F.lit(0.5)).cast("long").alias(name)

    return agg.select(
        q(0.25, "q25_e4"), q(0.5, "q50_e4"), q(0.75, "q75_e4"), q(0.95, "q95_e4")
    )


def a5_summary_stats(spark, sf_dir):
    """A5: summary stats per group (query_disk_index.rs:214-221)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_v"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
        F.round(F.stddev_samp("value"), 4).alias("sd_v"),
    )


def a7_argmax(spark, sf_dir):
    """A7: arg-max by score (medioid/shard select, lib.rs:65-68) —
    deterministic: max totalprice per status, smallest key on ties."""
    od = _t(spark, sf_dir, "orders")
    # single-pass argmax: max over (price, -orderkey) struct — exact
    # tie-break without a self-join
    best = od.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.max(
            F.struct(
                F.col("o_totalprice").alias("p"),
                (-F.col("o_orderkey")).alias("nk"),
            )
        ).alias("b")
    )
    return best.select(
        "status",
        (-F.col("b.nk")).alias("best_orderkey"),
        F.round(F.col("b.p"), 2).alias("max_price"),
    )


def a8_grouped_counts(spark, sf_dir):
    """A8: grouped accumulation (per-shard counts, dump_processor.rs:452-457)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


def a9_bincount(spark, sf_dir):
    """A9: bincount of cluster assignments (kmeans.py:88-90)."""
    em = _t(spark, sf_dir, "embeddings")
    return em.groupBy("label").agg(F.count("*").alias("n"))


def a10_grouped_median_pandas(spark, sf_dir):
    """A10: ensemble median via grouped pandas UDF
    (meme_pipeline.py:63-72) — the UDAF surface (D-class)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")

    def median(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "median_v": [round(float(pdf["value"].median()), 6)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        median, "event_type string, median_v double"
    )


# ------------------------------------------------------------------ W class

def w2_first_per_group(spark, sf_dir):
    """W2: first-per-group (first video frame, main.rs:909-917)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


def w3_topn_per_group(spark, sf_dir):
    """W3: per-row top-N ranking (top-2 centroids, dump_processor.rs:438-455)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "rn", "p_partkey", "p_retailprice")
    )


def w4_moving_avg(spark, sf_dir):
    """W4: moving average over preceding rows (crawler.py:54-57)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 6).alias("mavg")
    )


def w5_rank_per_group(spark, sf_dir):
    """W5: rank assignment (eval rank, query_disk_index.rs:271-272)."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        od.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey")
    )


# ------------------------------------------------------------------ T class

def t5_orderby_limit(spark, sf_dir):
    """T5: ORDER BY ... LIMIT (library_processing_server.py:22) with a
    total order — distributed TakeOrderedAndProject."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ------------------------------------------------------------------ U class

def u1_except(spark, sf_dir):
    """U1: set difference (db - disk GC, main.rs:769-794) — nations with
    no high-balance BUILDING customer; ``subtract`` = EXCEPT DISTINCT.
    Also carries U2 (array-valued set difference: pending-work =
    out_formats - formats, thumbnailer.py:117) as a second column —
    distinct non-stopword comment-token count via array_except — so one
    registry entry gates both U ops (keeps the registry <= the driver's
    50-entry run budget)."""
    from .index.build import tokens_col

    stop = ["united", "of", "the"]
    na = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    cu = (
        _t(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    kept = na.subtract(cu)
    toks = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"),
        F.size(
            F.array_except(
                F.array_distinct(tokens_col(F.col("n_name"))),
                F.array(*[F.lit(s) for s in stop]),
            )
        ).alias("n_content_terms"),
    )
    return kept.join(F.broadcast(toks), "nationkey")


def u4_union_distinct(spark, sf_dir):
    """U4: union of segment streams (dump_processor.rs:117-131)."""
    od = _t(spark, sf_dir, "orders")
    a = od.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    b = od.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.union(b).distinct()


# ----------------------------------------------------- scalar functions §2.8

def sf_string_date_math(spark, sf_dir):
    """§2.8: string/date/math scalar surface (path ops, ts parsing,
    concat_ws — reference sites in SURVEY table)."""
    od = _t(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.concat_ws("/", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_path"
        ),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 1.1 + 7.0, 4).alias("adj_price"),
    )


def sf_json_extract(spark, sf_dir):
    """§2.8: JSON parse (sonic-rs line parse, reddit_dump.rs:152)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def sf_hash_functions(spark, sf_dir):
    """§2.8: stable hashing (seahash/FNV sites) -> md5/sha2 parity."""
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


def sf_base64(spark, sf_dir):
    """§2.8: base64 codec (url-safe b64 ids, common.rs:226)."""
    pa_ = _t(spark, sf_dir, "part")
    return pa_.select(
        "p_partkey", F.base64(F.col("p_name").cast("binary")).alias("name_b64")
    )


# --------------------------------------------------------- streaming shapes

def st_tumbling_window(spark, sf_dir):
    """§2.9: tumbling event-time window aggregation (batch semantics;
    the streaming variant with watermark is tested in pytest with the
    same expected output)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total"
        )
    )


def st_sessionization(spark, sf_dir):
    """§2.9: sessionization — lag + cumulative gap counter (the
    adaptive-poll-interval shape of crawler.py:23-57).

    Gap math is timezone-independent: microsecond-exact
    ``timestampdiff`` on TIMESTAMP_NTZ (never unix_timestamp, whose
    NTZ interpretation shifts with the session timezone — the r01
    driver-hash failure) mirrored by DuckDB date_diff('microsecond')."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    ev = ev.withColumn("_prev_ts", prev)
    sess = F.sum(
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


# ------------------------------------------------------------------ oracles

ORACLES: dict[str, str] = {
    "f1_regex_filter": """
        SELECT p_partkey, p_name, p_type FROM part
        WHERE regexp_matches(p_type, '(ECONOMY|SMALL)')
          AND NOT regexp_matches(p_name, '^s')
    """,
    "f2_compound_predicates": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE (l_quantity > 45 AND l_returnflag = 'R')
           OR (l_discount < 0.02 AND l_linestatus = 'O')
    """,
    "f4_ts_highwater": """
        SELECT event_id, ts FROM events WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    """,
    "f6_hash_sample": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
    """,
    "f12_regex_rewrite": """
        SELECT c_custkey,
               regexp_replace(regexp_replace(c_name, 'Customer#?', 'cust-', 'g'),
                              '0+([0-9])', '\\1', 'g') AS c_name_rewritten
        FROM customer
    """,
    "f13_regexp_extract": """
        SELECT c_custkey,
               coalesce(regexp_extract(c_name, '([0-9]+)$', 1), '') AS trailing_digits
        FROM customer
    """,
    "j1_left_join_counts": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "j2_broadcast_dim_join": """
        SELECT p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "j4_positional_zip": """
        SELECT vec_id, CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
               round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
        FROM embeddings WHERE vec_id < 5
    """,
    "j6_anti_join": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "j6_semi_join": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
    """,
    "a2_global_counters": """
        SELECT count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts,
               round(sum(value), 4) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
    """,
    "a3_histogram": """
        SELECT CAST(floor(l_discount * 100) AS INTEGER) AS bucket, count(*) AS n
        FROM lineitem GROUP BY 1
    """,
    # same interpolation expression as the Spark side, fixed-point out
    "a4_quantiles": """
        WITH s AS (
          SELECT list_sort(list(l_extendedprice)) AS v,
                 count(l_extendedprice) AS n
          FROM lineitem
        )
        SELECT
          CAST(floor((v[CAST(floor(0.25*(n-1)) AS BIGINT)+1]
               + (0.25*(n-1) - floor(0.25*(n-1)))
                 * (v[least(CAST(floor(0.25*(n-1)) AS BIGINT)+2, n)]
                    - v[CAST(floor(0.25*(n-1)) AS BIGINT)+1])) * 10000.0 + 0.5)
               AS BIGINT) AS q25_e4,
          CAST(floor((v[CAST(floor(0.5*(n-1)) AS BIGINT)+1]
               + (0.5*(n-1) - floor(0.5*(n-1)))
                 * (v[least(CAST(floor(0.5*(n-1)) AS BIGINT)+2, n)]
                    - v[CAST(floor(0.5*(n-1)) AS BIGINT)+1])) * 10000.0 + 0.5)
               AS BIGINT) AS q50_e4,
          CAST(floor((v[CAST(floor(0.75*(n-1)) AS BIGINT)+1]
               + (0.75*(n-1) - floor(0.75*(n-1)))
                 * (v[least(CAST(floor(0.75*(n-1)) AS BIGINT)+2, n)]
                    - v[CAST(floor(0.75*(n-1)) AS BIGINT)+1])) * 10000.0 + 0.5)
               AS BIGINT) AS q75_e4,
          CAST(floor((v[CAST(floor(0.95*(n-1)) AS BIGINT)+1]
               + (0.95*(n-1) - floor(0.95*(n-1)))
                 * (v[least(CAST(floor(0.95*(n-1)) AS BIGINT)+2, n)]
                    - v[CAST(floor(0.95*(n-1)) AS BIGINT)+1])) * 10000.0 + 0.5)
               AS BIGINT) AS q95_e4
        FROM s
    """,
    "a5_summary_stats": """
        SELECT event_type, round(avg(value), 4) AS avg_v,
               round(min(value), 4) AS min_v, round(max(value), 4) AS max_v,
               round(stddev_samp(value), 4) AS sd_v
        FROM events GROUP BY event_type
    """,
    "a7_argmax": """
        WITH mx AS (
          SELECT o_orderstatus, max(o_totalprice) AS max_price
          FROM orders GROUP BY o_orderstatus
        )
        SELECT o.o_orderstatus AS status, min(o.o_orderkey) AS best_orderkey,
               round(any_value(mx.max_price), 2) AS max_price
        FROM orders o JOIN mx
          ON o.o_orderstatus = mx.o_orderstatus AND o.o_totalprice = mx.max_price
        GROUP BY o.o_orderstatus
    """,
    "a8_grouped_counts": """
        SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
        FROM events GROUP BY event_type
    """,
    "a9_bincount": """
        SELECT label, count(*) AS n FROM embeddings GROUP BY label
    """,
    "a10_grouped_median_pandas": """
        SELECT event_type, round(median(value), 6) AS median_v
        FROM events GROUP BY event_type
    """,
    "w2_first_per_group": """
        SELECT user_id, event_id, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
    "w3_topn_per_group": """
        SELECT p_brand,
               CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn,
               p_partkey, p_retailprice
        FROM part
        QUALIFY rn <= 2
    """,
    "w4_moving_avg": """
        SELECT event_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
        FROM events
    """,
    "w5_rank_per_group": """
        SELECT o_custkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk,
               o_orderkey
        FROM orders
        QUALIFY rnk <= 3
    """,
    "t5_orderby_limit": """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "u1_except": """
        WITH kept AS (
            SELECT n_nationkey AS nationkey FROM nation
            EXCEPT
            SELECT c_nationkey AS nationkey FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
        ),
        d AS (
            SELECT n_nationkey AS nationkey,
                   list_filter(regexp_split_to_array(
                       lower(strip_accents(n_name)), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
            FROM nation
        )
        SELECT k.nationkey,
               CAST(len(list_filter(list_distinct(d.toks),
                    x -> x NOT IN ('united','of','the')))
                    AS INTEGER) AS n_content_terms
        FROM kept k JOIN d ON d.nationkey = k.nationkey
    """,
    "u4_union_distinct": """
        SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        UNION
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "sf_string_date_math": """
        SELECT o_orderkey, upper(substr(o_orderpriority, 1, 3)) AS prio3,
               o_orderstatus || '/' || o_orderpriority AS status_path,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               round(o_totalprice * 1.1 + 7.0, 4) AS adj_price
        FROM orders
    """,
    "sf_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events
    """,
    "sf_hash_functions": """
        SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
        FROM customer
    """,
    "sf_base64": """
        SELECT p_partkey, to_base64(encode(p_name)) AS name_b64 FROM part
    """,
    "st_tumbling_window": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               count(*) AS n, round(sum(value), 4) AS total
        FROM events GROUP BY 1, 2
    """,
    "st_sessionization": """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('microsecond', lag(ts) OVER w, ts)
                           > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g
        )
        SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id
    """,
}

_FNS = {
    "f1_regex_filter": f1_regex_filter,
    "f2_compound_predicates": f2_compound_predicates,
    "f4_ts_highwater": f4_ts_highwater,
    "f6_hash_sample": f6_hash_sample,
    "f12_regex_rewrite": f12_regex_rewrite,
    "f13_regexp_extract": f13_regexp_extract,
    "j1_left_join_counts": j1_left_join_counts,
    "j2_broadcast_dim_join": j2_broadcast_dim_join,
    "j4_positional_zip": j4_positional_zip,
    "j6_anti_join": j6_anti_join,
    "j6_semi_join": j6_semi_join,
    "a2_global_counters": a2_global_counters,
    "a3_histogram": a3_histogram,
    "a4_quantiles": a4_quantiles,
    "a5_summary_stats": a5_summary_stats,
    "a7_argmax": a7_argmax,
    "a8_grouped_counts": a8_grouped_counts,
    "a9_bincount": a9_bincount,
    "a10_grouped_median_pandas": a10_grouped_median_pandas,
    "w2_first_per_group": w2_first_per_group,
    "w3_topn_per_group": w3_topn_per_group,
    "w4_moving_avg": w4_moving_avg,
    "w5_rank_per_group": w5_rank_per_group,
    "t5_orderby_limit": t5_orderby_limit,
    "u1_except": u1_except,
    "u4_union_distinct": u4_union_distinct,
    "sf_string_date_math": sf_string_date_math,
    "sf_json_extract": sf_json_extract,
    "sf_hash_functions": sf_hash_functions,
    "sf_base64": sf_base64,
    "st_tumbling_window": st_tumbling_window,
    "st_sessionization": st_sessionization,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_FNS)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
