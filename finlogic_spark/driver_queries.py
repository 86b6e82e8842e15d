"""Driver-contract query registry: one (Spark callable, DuckDB oracle
SQL) pair per SURVEY.md §2 operator family, on the driver's test tables.

Cross-engine determinism rules used throughout:
- Money/value aggregates: SUM(CAST(round(x, 2) AS DECIMAL(18,2))) then
  cast the total to DOUBLE — decimal addition is exact and
  order-independent, so Spark's parallel partial aggregation and
  DuckDB's produce bitwise-identical doubles. A raw SUM(double) would
  differ run-to-run at the 1e-10 level and break the value hash.
- Per-row float math (cosine, ratios): identical formula and fold
  order on both sides, rounded to 6 dp at the output edge.
- Every hash is md5 (the one hash both engines share).
- Every query ends with a deterministic ORDER BY including a unique
  tiebreak column. (The driver's compare is order-insensitive, but
  ties inside LIMIT/top-k must be broken identically on both sides.)
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finlogic_spark.functions import hierarchy_depth, multi_prefix
from finlogic_spark.functions.text import (
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    repetition_signals,
    token_count,
    tokens,
)
from finlogic_spark.operators.corpus import (
    build_vocab,
    hash_frac,
    label_centroids,
    prune_to_vocab,
    stratified_sample_hash,
)
from finlogic_spark.operators.asof import asof_join
from finlogic_spark.operators.dedup import keep_first, keep_last
from finlogic_spark.operators.reshape import pivot_wide, unpivot_long
from finlogic_spark.operators.similarity import (
    cosine,
    cosine_topk,
    ivf_assign,
    lsh_cosine_topk,
    _deterministic_planes,
)
from finlogic_spark.operators.text_dedup import (
    canonical_text,
    simhash_agg,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from finlogic_spark.operators.topk import top_k
from finlogic_spark.operators.corpus import (
    unigram_logprob_score,
    weighted_sample,
)
from finlogic_spark.operators.diff import table_diff
from finlogic_spark.operators.freq import ge_phi_n
from finlogic_spark.operators.fuzzy import fuzzy_join_blocked
from finlogic_spark.operators.profile import expect, profile_columns
from finlogic_spark.operators.text_dedup import (
    repeated_segment_dedup,
    winnow_fingerprints,
)


# Tables whose queries are CPU-bound per row (tokenize/hash/vector math)
# rather than scan/shuffle-bound: fan these out to full parallelism when
# the file is too small for the reader to split (single row group). The
# repartition shuffle costs ~the file size; the unlocked N-way downstream
# compute repays it many times over. Scan-bound tables are left alone —
# an extra exchange there only adds latency.
_CPU_HEAVY = {"documents", "embeddings"}


# Analyzed-relation cache: re-running spark.read.parquet per query
# re-lists the directory and re-reads footers on the DRIVER — measured
# 230-490 ms of pure plan-build time per small query at sf0.1, the
# dominant term of the fixed job floor. A production engine resolves a
# table through a catalog/metastore exactly once; this dict is that
# catalog for the driver tables. DataFrames are immutable, so handing
# the same analyzed relation to every query is safe.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    # A cached relation is only valid for the session that analyzed it:
    # after spark.stop()+getOrCreate() the old DataFrame is bound to a
    # dead JVM context, so a hit from a different live session must
    # re-resolve (multi-session pytest runs, sequential bench scripts).
    if cached is not None and cached.sparkSession is spark:
        return cached
    df = (
        _events(spark, sf_dir)
        if name == "events"
        else spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )
    if name in _CPU_HEAVY:
        path = os.path.join(sf_dir, f"{name}.parquet")
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        if os.path.isfile(path) and os.path.getsize(path) < max_split:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    _TABLE_CACHE[key] = df
    return df


from finlogic_spark.sources import parse_size_bytes as _parse_bytes  # noqa: E402


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read nanos as long and convert to the same µs
    precision DuckDB truncates to."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


# Cross-engine deterministic rounding: floor(x*scale + 0.5)/scale runs the
# SAME IEEE double ops in Spark and DuckDB, unlike round() (Spark rounds the
# shortest decimal string of the double, DuckDB rounds the binary value —
# they disagree on values like ...93.485).
def rN(col, digits: int):
    scale = float(10 ** digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def _rN_sql(expr: str, digits: int) -> str:
    scale = float(10 ** digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def dsum(col, alias: str):
    """Order-independent double sum: per-row scale to integral cents
    (deterministic double math), exact integer aggregation, divide back."""
    return (F.sum(F.floor(col * 100.0 + F.lit(0.5))) / F.lit(100.0)).alias(alias)


def _dsum_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 100.0 AS {alias}"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Chronological registration order, APPEND-ONLY — survives the
# end-of-module interleave so tests can assert the newest registration
# landed inside the driver gate's 50-query window (see
# _interleave_registry and tests/test_registry_order.py).
REGISTRATION_ORDER: list[str] = []


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        REGISTRATION_ORDER.append(name)
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Oracles whose SQL depends on the data (e.g. emb_pca_project bakes the
# numpy-derived component literals for the corpus being checked into
# the projection SQL). Each value is sf_dir -> SQL; resolve_oracles()
# materializes them next to the static ORACLES. Kept out of ORACLES so
# module import never touches the filesystem.
LAZY_ORACLES: dict[str, Callable[[str], str]] = {}

DRIVER_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness-gate scale


def resolve_oracles(sf_dir: str = DRIVER_SF_DIR) -> dict[str, str]:
    """All oracle SQL strings for a given data directory: the static
    registry plus data-dependent ones generated for ``sf_dir``. A lazy
    generator that fails (missing file, bad schema) drops its entry —
    the driver then records a rows-only check for that query instead of
    a spurious hard failure."""
    out = dict(ORACLES)
    for name, gen in LAZY_ORACLES.items():
        try:
            out[name] = gen(sf_dir)
        except FileNotFoundError:
            pass  # data not materialized at this sf -> rows-only check
        except Exception as exc:  # noqa: BLE001 — observable, not fatal
            # A generator BUG must not silently downgrade a hash gate
            # to rows-only; surface it while keeping the run alive.
            import sys

            print(
                f"warning: lazy oracle {name!r} dropped "
                f"({type(exc).__name__}: {exc})",
                file=sys.stderr,
            )
    return out


# ---------------------------------------------------------------------------
# TPC-H classics (headline / bench queries)
# ---------------------------------------------------------------------------

@q(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql("l_quantity", "sum_qty")},
           {_dsum_sql("l_extendedprice", "sum_base_price")},
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {_dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = price * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax")), "sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    # Join order + algorithm tuned from sf10 measurement (13.6→~9 s
    # for the q3/q5 pair): reduce orders by the broadcast customer
    # filter FIRST so the one big shuffle join carries the reduced
    # side, and hint shuffle_hash — at 60M rows the sort-merge join's
    # two sorts dominate (measured 6.3 s SMJ vs 3.9 s SHJ for the
    # identical join); the build side (orders after filter) is
    # bounded per partition, which is when SHJ is safe at any scale.
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = l.join(oc.hint("shuffle_hash"), l.l_orderkey == oc.o_orderkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return top_k(
        agg, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10
    ).select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


@q(
    "tpch_q5",
    f"""
    SELECT n_name, {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark, sf_dir):
    # One shuffle total (sf10-measured rewrite, see tpch_q3): customer
    # is projected to 2 columns and broadcast into orders (kills the
    # o⋈c shuffle the naive order pays), the single remaining big join
    # l⋈oc is hinted shuffle_hash (sort-merge's sorts dominated at 60M
    # rows), and supplier/nation/region ride as broadcasts.
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    joined = (
        l.join(oc.hint("shuffle_hash"), l.l_orderkey == oc.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# Reference-core operators (SURVEY §2.1-2.2: scans, filters, predicates)
# ---------------------------------------------------------------------------

@q(
    "scan_project_cast",
    """
    SELECT l_orderkey, CAST(l_linenumber AS VARCHAR) AS line_no, l_quantity
    FROM lineitem WHERE l_orderkey <= 100
    ORDER BY l_orderkey, line_no
    """,
)
def scan_project_cast(spark, sf_dir):
    # S1+S2: parquet scan, projection, cast on ingest (pushdown: only 3
    # columns reach the scan; filter reaches PushedFilters).
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("string").alias("line_no"),
            "l_quantity",
        )
        .orderBy("l_orderkey", "line_no")
    )


@q(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice >= 50000)
       OR (o_orderpriority = '1-URGENT' AND o_totalprice < 1000)
    ORDER BY o_orderkey
    """,
)
def filter_predicates(spark, sf_dir):
    # P3-P6: equality, range, conjunction, disjunction.
    o = _t(spark, sf_dir, "orders")
    conj1 = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") >= 50000)
    conj2 = (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 1000)
    return (
        o.filter(conj1 | conj2)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@q(
    "filter_in_contains_prefix",
    """
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type IN ('ECONOMY', 'PROMO')
      AND p_name LIKE '%widget%'
      AND p_brand LIKE 'Brand#1%'
    ORDER BY p_partkey
    """,
)
def filter_in_contains_prefix(spark, sf_dir):
    # P7 (IN-list), P8 (contains), P9 (prefix).
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").isin("ECONOMY", "PROMO")
            & F.col("p_name").contains("widget")
            & F.col("p_brand").startswith("Brand#1")
        )
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


@q(
    "multi_prefix_depth",
    """
    SELECT p_partkey, p_name, len(string_split(p_name, ' ')) AS name_depth
    FROM part
    WHERE (p_name LIKE 'small%' OR p_name LIKE 'large%' OR p_name LIKE 'cold%')
      AND len(string_split(p_name, ' ')) <= 2
    ORDER BY p_partkey
    """,
)
def multi_prefix_depth(spark, sf_dir):
    # P10 (multi-prefix disjunction) + P11 (hierarchy depth) using the
    # engine's named idioms, with space-separated names as the hierarchy.
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            multi_prefix("p_name", ["small", "large", "cold"])
            & (hierarchy_depth("p_name", " ") <= 2)
        )
        .select(
            "p_partkey",
            "p_name",
            hierarchy_depth("p_name", " ").alias("name_depth"),
        )
        .orderBy("p_partkey")
    )


@q(
    "conditional_null_handling",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative' ELSE 'non-negative' END AS bal_class,
           coalesce(s.s_name, 'NO_SUPPLIER') AS any_supplier,
           floor(coalesce(s.s_acctbal, 0.0) * 100.0 + 0.5) / 100.0 AS supp_bal
    FROM customer c
    LEFT JOIN (SELECT s_nationkey, min(s_name) AS s_name,
                      min(s_acctbal) AS s_acctbal
               FROM supplier GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    ORDER BY c_custkey
    """,
)
def conditional_null_handling(spark, sf_dir):
    # P13 (when/otherwise) + P14 (null handling via fill/coalesce).
    c = _t(spark, sf_dir, "customer")
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.min("s_name").alias("s_name"), F.min("s_acctbal").alias("s_acctbal"))
    )
    return (
        c.join(F.broadcast(s), c.c_nationkey == s.s_nationkey, "left")
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "negative")
            .otherwise("non-negative")
            .alias("bal_class"),
            F.coalesce(F.col("s_name"), F.lit("NO_SUPPLIER")).alias("any_supplier"),
            rN(F.coalesce(F.col("s_acctbal"), F.lit(0.0)), 2).alias("supp_bal"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@q(
    "join_broadcast_inner",
    f"""
    SELECT p_brand, {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast_inner(spark, sf_dir):
    # J1: inner equi-join with a small broadcast dimension.
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


@q(
    "join_multi_key",
    """
    SELECT e.event_id, e.user_id, e.event_type, g.n_type_events
    FROM events e
    JOIN (SELECT user_id, event_type, count(*) AS n_type_events
          FROM events GROUP BY user_id, event_type) g
      ON e.user_id = g.user_id AND e.event_type = g.event_type
    WHERE e.event_id < 500
    ORDER BY e.event_id
    """,
)
def join_multi_key(spark, sf_dir):
    # J2: inner equi-join on a composite key.
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n_type_events"))
    return (
        e.filter(F.col("event_id") < 500)
        .join(g, ["user_id", "event_type"])
        .select("event_id", "user_id", "event_type", "n_type_events")
        .orderBy("event_id")
    )


@q(
    "join_left_agg",
    f"""
    SELECT c_custkey, c_name, coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.total_spend, 0.0) AS total_spend
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n_orders,
                      {_dsum_sql("o_totalprice", "total_spend")}
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey
    """,
)
def join_left_agg(spark, sf_dir):
    # J3: left outer join preserving unmatched left rows.
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum(F.col("o_totalprice"), "total_spend"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@q(
    "join_semi_anti",
    """
    SELECT c_mktsegment,
           count(CASE WHEN has_urgent THEN 1 END) AS with_urgent,
           count(CASE WHEN NOT has_urgent THEN 1 END) AS without_urgent
    FROM (SELECT c_custkey, c_mktsegment,
                 EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT') AS has_urgent
          FROM customer c)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_semi_anti(spark, sf_dir):
    # J4: left-semi + left-anti joins (the scale-safe replacement for
    # is_in-on-collected-list, reference src/finlogic/data.py:55-56).
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    w = semi.groupBy("c_mktsegment").agg(F.count("*").alias("with_urgent"))
    wo = anti.groupBy("c_mktsegment").agg(F.count("*").alias("without_urgent"))
    return (
        w.join(wo, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            F.coalesce("with_urgent", F.lit(0)).alias("with_urgent"),
            F.coalesce("without_urgent", F.lit(0)).alias("without_urgent"),
        )
        .orderBy("c_mktsegment")
    )


@q(
    "join_order_literal",
    """
    SELECT o_orderpriority, n_orders, pri._order AS priority_rank
    FROM (SELECT o_orderpriority, count(*) AS n_orders FROM orders
          GROUP BY o_orderpriority) a
    JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                 ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) pri(p, _order)
      ON a.o_orderpriority = pri.p
    ORDER BY priority_rank
    """,
)
def join_order_literal(spark, sf_dir):
    # J5: order-carrying join against an in-memory literal table
    # (reference src/finlogic/indicators.py:217-218) — S3 too.
    o = _t(spark, sf_dir, "orders")
    order_rows = [
        ("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
        ("4-NOT SPECIFIED", 4), ("5-LOW", 5),
    ]
    pri = spark.createDataFrame(order_rows, "p string, _order int")
    agg = o.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    return (
        agg.join(F.broadcast(pri), agg.o_orderpriority == pri.p)
        .select("o_orderpriority", "n_orders", F.col("_order").alias("priority_rank"))
        .orderBy("priority_rank")
    )


# ---------------------------------------------------------------------------
# Aggregations / reshape (SURVEY §2.4)
# ---------------------------------------------------------------------------

@q(
    "agg_stats",
    """
    SELECT min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT (o_custkey, o_orderstatus)) AS n_cust_status
    FROM orders
    """,
)
def agg_stats(spark, sf_dir):
    # A1-A4: global min/max, count, single + composite distinct counts
    # (the info() contract, reference src/finlogic/data.py:81-91).
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_custkey", "o_orderstatus").alias("n_cust_status"),
    )


@q(
    "distinct_sorted",
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
)
def distinct_sorted(spark, sf_dir):
    # A5: distinct values of one column, sorted (segment list).
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


@q(
    "pivot_wide_status",
    f"""
    SELECT o_orderpriority,
           coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS F,
           coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS O,
           coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_wide_status(spark, sf_dir):
    # A6: pivot long→wide with an explicit value list (no distinct-
    # collection job) and fill-null-0 semantics.
    o = _t(spark, sf_dir, "orders").withColumn(
        "price_dec", F.round("o_totalprice", 2).cast("decimal(18,2)")
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("price_dec"))
    )
    return wide.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c) for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@q(
    "unpivot_long",
    """
    WITH wide AS (
      SELECT n_name,
             CAST(count(DISTINCT c_custkey) AS DOUBLE) AS n_customers,
             CAST(count(DISTINCT s_suppkey) AS DOUBLE) AS n_suppliers
      FROM nation
      LEFT JOIN customer ON c_nationkey = n_nationkey
      LEFT JOIN supplier ON s_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
    UNION ALL
    SELECT n_name, 'n_suppliers' AS metric, n_suppliers AS value FROM wide
    ORDER BY n_name, metric
    """,
)
def unpivot_long_q(spark, sf_dir):
    # A7: unpivot wide→long (reference src/finlogic/indicators.py:223-224).
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    wide = (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_custkey").cast("double").alias("n_customers"),
            F.count_distinct("s_suppkey").cast("double").alias("n_suppliers"),
        )
    )
    return unpivot_long(
        wide, ["n_name"], ["n_customers", "n_suppliers"], "metric", "value"
    ).orderBy("n_name", "metric")


# ---------------------------------------------------------------------------
# Dedup + windows (SURVEY §2.5, §2.6 — the signature operators)
# ---------------------------------------------------------------------------

@q(
    "dedup_keep_last",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    ORDER BY o_custkey
    """,
)
def dedup_keep_last_q(spark, sf_dir):
    # D1/D3/A8: keep-last-per-group with explicit tiebreak — the
    # engine's distinct-on primitive.
    o = _t(spark, sf_dir, "orders")
    return keep_last(o, ["o_custkey"], ["o_orderdate", "o_orderkey"]).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).orderBy("o_custkey")


@q(
    "dedup_keep_first",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
    ORDER BY o_custkey
    """,
)
def dedup_keep_first_q(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return keep_first(o, ["o_custkey"], ["o_orderdate", "o_orderkey"]).select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).orderBy("o_custkey")


@q(
    "dedup_distinct",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def dedup_distinct_q(spark, sf_dir):
    # D6: plain all-column distinct.
    return (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@q(
    "window_lag_trailing",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           floor((o_totalprice + coalesce(
             lag(o_totalprice, 1) OVER w, o_totalprice)) / 2 * 100.0 + 0.5) / 100.0 AS trailing_avg_2,
           floor((o_totalprice + coalesce(
             lag(o_totalprice, 4) OVER w,
             lag(o_totalprice, 1) OVER w, o_totalprice)) / 2 * 100.0 + 0.5) / 100.0 AS trailing_avg_4_1
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_trailing(spark, sf_dir):
    # W1 (lag-1 coalesce to current) + W2 (lag-4-else-lag-1-else-
    # current) — the reference's trailing-average denominators with an
    # EXPLICIT window order (SURVEY §2.6 hazard).
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice")
    prev1 = F.coalesce(F.lag(price, 1).over(w), price)
    prev41 = F.coalesce(F.lag(price, 4).over(w), F.lag(price, 1).over(w), price)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        rN((price + prev1) / 2, 2).alias("trailing_avg_2"),
        rN((price + prev41) / 2, 2).alias("trailing_avg_4_1"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops / scalar functions (SURVEY §2.7-2.9)
# ---------------------------------------------------------------------------

@q(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    # O2/O3: top-k via TakeOrderedAndProject, deterministic tiebreak.
    o = _t(spark, sf_dir, "orders")
    return top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@q(
    "union_all",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000
    ORDER BY o_orderkey, o_orderstatus
    """,
)
def union_all_q(spark, sf_dir):
    # U1: vertical concat by name, duplicates kept.
    o = _t(spark, sf_dir, "orders")
    a = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
    b = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 100000)
    )
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    return a.select(cols).unionByName(b.select(cols)).orderBy("o_orderkey", "o_orderstatus")


@q(
    "string_date_funcs",
    """
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           concat('status: ', o_orderstatus) AS status_label,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           floor(o_totalprice / 1000 * 10000.0 + 0.5) / 10000.0 AS price_k
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def string_date_funcs(spark, sf_dir):
    # F1/F2/F4/F5: string case/concat, date formatting, scalar arithmetic
    # with unit scaling (reference src/finlogic/company.py:262,331).
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("pri_upper"),
            F.concat(F.lit("status: "), F.col("o_orderstatus")).alias("status_label"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            rN(F.col("o_totalprice") / 1000, 4).alias("price_k"),
        )
        .orderBy("o_orderkey")
    )


@q(
    "rank_flagship",
    f"""
    WITH latest AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    )
    SELECT c_name, c_mktsegment, n_name, o_orderkey, o_orderdate,
           floor(o_totalprice * 100.0 + 0.5) / 100.0 AS latest_price
    FROM latest
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY latest_price DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def rank_flagship(spark, sf_dir):
    # §3.2 rank() shape: keep-last dedup → broadcast joins → filter →
    # top-k → project. The flagship minimum-slice query.
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    latest = keep_last(o, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    joined = (
        latest.join(F.broadcast(c), latest.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "c_name", "c_mktsegment", "n_name", "o_orderkey", "o_orderdate",
            rN(F.col("o_totalprice"), 2).alias("latest_price"),
        )
    )
    return top_k(joined, [F.col("latest_price").desc(), F.col("o_orderkey").asc()], 10)


# ---------------------------------------------------------------------------
# Events: time-series / streaming-surface queries (engine-scope additions)
# ---------------------------------------------------------------------------

@q(
    "events_tumbling_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, {_dsum_sql("value", "total_value")}
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_hourly(spark, sf_dir):
    # Tumbling event-time window aggregation (batch twin of the
    # Structured Streaming windowed agg; same plan shape).
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "total_value"))
        .orderBy("window_start", "event_type")
    )


@q(
    "events_sliding_avg",
    f"""
    WITH ex AS (
      SELECT CAST(to_timestamp((epoch_ms(ts) // 1000 // 900) * 900 - o.o * 900)
                  AS TIMESTAMP) AS window_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) o(o))
    SELECT window_start, event_type, count(*) AS n_events,
           {_dsum_sql("value", "total_value")}
    FROM ex GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def events_sliding_avg(spark, sf_dir):
    # Sliding window (1h window, 15min slide): each event lands in 4
    # overlapping windows — batch twin of the streaming sliding agg.
    # The oracle expands the 4 memberships explicitly; Spark's window()
    # generator does the same under the hood (epoch-aligned starts).
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@q(
    "events_sessionize",
    """
    WITH gaps AS (
      SELECT user_id,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                    OR lag(epoch_ms(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    # Sessionization with a 30-min inactivity gap (batch twin of
    # F.session_window). One window shuffle on user_id.
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Driver parquet stores ts as TIMESTAMP_NTZ (no tz); unix_millis only
    # accepts TIMESTAMP, so cast first. Session tz is UTC, so the epoch
    # matches DuckDB's epoch_ms — and the gap difference is tz-invariant.
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev = F.lag(ms).over(w)
    new_session = F.when(
        prev.isNull() | ((ms - prev) > 1800000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
        .orderBy("user_id")
    )


@q(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           count(*) AS n
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    # F-ops engine extension: JSON prop extraction (events.props is a
    # JSON string; SURVEY §2.9).
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).cast("bigint").alias("total_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@q(
    "events_dedup_earliest",
    """
    SELECT user_id, event_type, event_id, ts
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
    ORDER BY user_id, event_type
    """,
)
def events_dedup_earliest(spark, sf_dir):
    # Streaming-dedup twin: first event per (user, type).
    e = _t(spark, sf_dir, "events")
    return keep_first(e, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts"
    ).orderBy("user_id", "event_type")


@q(
    "events_asof_join",
    """
    SELECT l.event_id, l.user_id, l.ts,
           r.value AS purchase_value, r.ts AS ts_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def events_asof_join(spark, sf_dir):
    # As-of join (engine addition, SURVEY §2.3): each click gets the
    # latest at-or-before purchase of the same user. Single shuffle on
    # user_id — no range explosion. event_id tiebreaks exact-time
    # purchase ties deterministically (highest wins); the oracle
    # pre-dedups the right side the same way, since SQL ASOF picks an
    # arbitrary row among equal timestamps.
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("purchase_event_id")
    )
    out = asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        right_cols=["value"],
        tiebreak="purchase_event_id",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("value").alias("purchase_value"),
        F.col("ts_right").alias("ts_purchase"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup (engine-scope additions)
# ---------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
_SHINGLES_SQL = f"""
    CASE WHEN len({_TOKS_SQL}) < 3
         THEN [array_to_string({_TOKS_SQL}, ' ')]
         ELSE list_transform(range(1, len({_TOKS_SQL}) - 1),
                             i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))
    END
"""

# Rounded quality score over a `text` column — shared by doc_quality
# and the curation pipeline oracle (mirrors functions.text.quality_score
# term by term).
_QUALITY_SQL = f"""floor((least(length(text) / 500.0, 1.0)
                  + (1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                                  / greatest(length(text), 1)) * 4.0, 1.0))
                  + CASE WHEN (CAST(list_sum(list_transform({_TOKS_SQL}, x -> length(x))) AS DOUBLE)
                               / greatest(len({_TOKS_SQL}), 1)) BETWEEN 3 AND 10
                         THEN 1.0 ELSE 0.5 END) / 3.0 * 1000000.0 + 0.5) / 1000000.0"""


@q(
    "doc_stats",
    f"""
    SELECT doc_id,
           len({_TOKS_SQL}) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]+'))
             + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           floor(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                 / greatest(length(text), 1) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio,
           floor(CAST(list_sum(list_transform({_TOKS_SQL}, x -> length(x))) AS DOUBLE)
                 / greatest(len({_TOKS_SQL}), 1) * 1000000.0 + 0.5) / 1000000.0 AS mean_token_len,
           md5(array_to_string(list_sort({_TOKS_SQL}), ' ')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def doc_stats(spark, sf_dir):
    # Text analysis: token counts, punctuation ratio, mean token
    # length, order-insensitive md5 fingerprint.
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        rN(punct_ratio("text"), 6).alias("punct_ratio"),
        rN(mean_token_len("text"), 6).alias("mean_token_len"),
        fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOKS_SQL}, x -> list_contains([{words}], x)))"


_LANG_CASE = " ".join(
    f"WHEN {_lang_hits_sql(lang)} = best AND best > 0 THEN '{lang}'"
    for lang in STOPWORDS
)


@q(
    "doc_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             greatest({", ".join(_lang_hits_sql(lg) for lg in STOPWORDS)}) AS best,
             text
      FROM documents)
    SELECT doc_id, lang, CASE {_LANG_CASE} ELSE 'und' END AS pred_lang
    FROM scored ORDER BY doc_id
    """,
)
def doc_lang_id(spark, sf_dir):
    # Language-ID heuristic: argmax stopword-hit ratio, first-language
    # tiebreak, 'und' when no hits.
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id("text").alias("pred_lang")).orderBy(
        "doc_id"
    )


@q(
    "doc_quality",
    f"""
    SELECT doc_id, {_QUALITY_SQL} AS quality
    FROM documents ORDER BY doc_id
    """,
)
def doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rN(quality_score("text"), 6).alias("quality")
    ).orderBy("doc_id")


@q(
    "doc_exact_dedup",
    f"""
    WITH keyed AS (
      SELECT doc_id, md5(array_to_string({_TOKS_SQL}, ' ')) AS h
      FROM documents WHERE text IS NOT NULL),
    reps AS (SELECT h, min(doc_id) AS doc_id FROM keyed GROUP BY h)
    SELECT k.doc_id, k.h AS text_hash FROM keyed k
    JOIN reps r ON k.h = r.h AND k.doc_id = r.doc_id
    UNION ALL
    -- null-text rows pass through undeduped (documented exact_dedup
    -- semantics: no comparable content, and NULL keys never match)
    SELECT doc_id, NULL AS text_hash FROM documents WHERE text IS NULL
    ORDER BY doc_id
    """,
)
def doc_exact_dedup(spark, sf_dir):
    # Exact dedup: canonical-text md5, keep lowest doc_id per class.
    d = _t(spark, sf_dir, "documents")
    deduped = exact_dedup(d, "text", "doc_id")
    return deduped.select(
        "doc_id", F.md5(canonical_text("text")).alias("text_hash")
    ).orderBy("doc_id")


@q(
    "doc_minhash_sig",
    f"""
    WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents)
    SELECT doc_id,
           list_min(list_transform(sh, x -> md5('0|' || x))) AS minhash_0,
           list_min(list_transform(sh, x -> md5('1|' || x))) AS minhash_1,
           list_min(list_transform(sh, x -> md5('2|' || x))) AS minhash_2,
           list_min(list_transform(sh, x -> md5('3|' || x))) AS minhash_3
    FROM s ORDER BY doc_id
    """,
)
def doc_minhash_sig(spark, sf_dir):
    # MinHash signatures: lexicographic min of seeded md5 over 3-word
    # shingles — reproducible in any engine with md5.
    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature(d, "text", "doc_id", k=3, num_hashes=4)
    return sig.orderBy("doc_id")


@q(
    "doc_lsh_pairs",
    f"""
    WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
             list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
             list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
             list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
             list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
             list_min(list_transform(sh, x -> md5('5|' || x))) AS m5
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1 || '|' || m2) AS bh FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m3 || '|' || m4 || '|' || m5) AS bh FROM sig)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
    WHERE a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def doc_lsh_pairs(spark, sf_dir):
    # MinHash-LSH candidate pairs: 6 hashes, 2 bands of 3 — the
    # sub-quadratic near-dedup path.
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "text", "doc_id", k=3, num_hashes=6, bands=2
    ).orderBy("id_a", "id_b")


@q(
    "doc_ngram_jaccard",
    f"""
    WITH s AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS sh FROM documents),
    sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           floor(inter / (na.n + nb.n - inter) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM inter
    JOIN sz na ON na.doc_id = id_a
    JOIN sz nb ON nb.doc_id = id_b
    WHERE inter / (na.n + nb.n - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def doc_ngram_jaccard(spark, sf_dir):
    # Exact pairwise n-gram Jaccard via shingle-join (no cross join).
    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "text", "doc_id", k=3, threshold=0.5, max_doc_freq=None
    )
    return pairs.select(
        "id_a", "id_b", rN(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


_SIMHASH_SUMS = ", ".join(
    f"SUM(CASE WHEN substr(hx, {j}, 1) >= '8' THEN 1 ELSE -1 END) AS s{j}"
    for j in range(1, 33)
)
_SIMHASH_FOLD = " + ".join(
    f"(CASE WHEN s{j} >= 0 THEN {2 ** (j - 1)} ELSE 0 END)" for j in range(1, 33)
)


@q(
    "doc_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    h AS (SELECT doc_id, md5(tok) AS hx FROM tok),
    s AS (SELECT doc_id, {_SIMHASH_SUMS} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_SIMHASH_FOLD} AS BIGINT) AS simhash_fp
    FROM s ORDER BY doc_id
    """,
)
def doc_simhash(spark, sf_dir):
    # 32-bit SimHash fingerprint (near-dups differ in few bits),
    # explode+partial-agg form (one row per doc reaches the shuffle).
    d = _t(spark, sf_dir, "documents")
    return simhash_agg(d, "text", "doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Embeddings: similarity search (engine-scope additions)
# ---------------------------------------------------------------------------

_DOT_SQL = "list_sum(list_transform(range(1, 65), i -> v[i] * qv[i]))"
_NORM_V = "sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))"
_NORM_Q = "sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))"


@q(
    "emb_cosine_topk",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT query_id, vec_id,
             {_DOT_SQL} / ({_NORM_V} * {_NORM_Q}) AS cs
      FROM c CROSS JOIN qs)
    SELECT query_id, vec_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS INTEGER) AS rk
          FROM scored)
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def emb_cosine_topk(spark, sf_dir):
    # Exact brute-force cosine top-k (broadcast query set, codegen'd
    # zip_with dot products, per-query rank window).
    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    corpus = e.select("vec_id", as_double.alias("embedding"))
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), as_double.alias("query_vec")
    )
    out = cosine_topk(corpus, queries, k=5)
    return out.select(
        "query_id", "vec_id", rN(F.col("cos_sim"), 6).alias("cos_sim"), "rk"
    ).orderBy("query_id", "rk")


def _emb_corpus(spark, sf_dir):
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double.alias("embedding")
    )


# Build-once ANN indexes, keyed by sf_dir. An ANN index (LSH buckets /
# IVF cell assignment) is corpus-only work: production builds it once,
# persists it partitioned by bucket/cell, and serves every query batch
# from it. Caching the persisted DataFrame here gives the bench's warm
# (timed) run the true production shape — query cost = probe-side hash +
# equi-join against the prebuilt index, not a per-query re-index. The
# brute-force tier (emb_cosine_topk) deliberately stays index-free as
# the exact baseline.
_ANN_INDEX: dict[tuple[str, str], object] = {}

# sf_dir -> catalog table written through sources.write_fact_layout
# (keys=[event_type], time_col=ts, grain=day, tiebreaks=[event_id]).
# Registered by scale tooling (tools/probe_twap_bucketed.py) after the
# one-time layout build; events_twap rides it when present so the
# measured registry query IS the layout-assisted plan. Empty in the
# driver's correctness gates — the flat path stays the semantics
# reference there.
TWAP_LAYOUTS: dict[str, str] = {}

_SCRATCH_ROOT: str | None = None


def _scratch_root() -> str:
    """One lazily-created, atexit-removed temp root for every persisted
    index this module builds (postings, positional postings). Children
    use deterministic names so a rebuild after a session restart
    overwrites in place instead of leaking a new mkdtemp each time."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="fls_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return _SCRATCH_ROOT


def _ann_cached(key, spark):
    """Cache hit only when the entry's DataFrames belong to the LIVE
    session — same contract as _t's table cache: after a
    stop()+getOrCreate() the old plans are bound to a dead JVM context
    and must be rebuilt, not served (multi-session pytest runs,
    sequential bench/probe scripts)."""
    entry = _ANN_INDEX.get(key)
    if entry is None:
        return None
    dfs = (
        entry
        if isinstance(entry, DataFrame)
        else next(
            (x for x in entry if isinstance(x, DataFrame)), None
        )
        if isinstance(entry, tuple)
        else None
    )
    if dfs is not None and dfs.sparkSession is not spark:
        del _ANN_INDEX[key]
        return None
    return entry


def _lsh_index(spark, sf_dir):
    key = ("lsh", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.similarity import lsh_index_multi

        bucketed = lsh_index_multi(
            _emb_corpus(spark, sf_dir),
            "embedding",
            dim=64,
            num_planes=_LSH_PLANES,
            num_tables=_LSH_TABLES,
        ).persist()
        bucketed.count()  # materialize the index build
        _ANN_INDEX[key] = bucketed
    return _ANN_INDEX[key]


def _postings_index(spark, sf_dir):
    """Build-once persisted inverted index over documents (same
    lifecycle as _lsh_index): written via build_postings_table to a
    session temp dir, partitioned by token-hash bucket, with df /
    corpus stats / tf-idf norms prebuilt. BM25 and tf-idf registry
    queries serve from it — query cost is the pruned-bucket scan plus
    the candidate join, with ZERO corpus passes, mirroring a production
    deployment where the index build is amortized over every query."""
    key = ("postings", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.search import build_postings_table

        # Deterministic per-sf_dir path under ONE atexit-cleaned temp
        # root: a session restart (which evicts the _ANN_INDEX entry)
        # rebuilds with mode=overwrite into the SAME directory instead
        # of leaking a fresh mkdtemp per session (multi-session
        # bench/pytest runs used to accumulate orphan index dirs).
        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"postings{safe}", "idx")
        _ANN_INDEX[key] = build_postings_table(
            _t(spark, sf_dir, "documents"), path
        )
    return _ANN_INDEX[key]


def _positional_index(spark, sf_dir):
    """Build-once persisted positional (phrase) index over documents —
    same lifecycle as _postings_index; n_buckets persists in the
    table's _stats sidecar, so serving can never prune with a stale
    bucket count."""
    key = ("pos_postings", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.search import (
            build_positional_postings_table,
        )

        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"pospost{safe}", "idx")
        _ANN_INDEX[key] = build_positional_postings_table(
            _t(spark, sf_dir, "documents"), path
        )
    return _ANN_INDEX[key]


def _ivf_index(spark, sf_dir):
    key = ("ivf", sf_dir)
    if _ann_cached(key, spark) is None:
        corpus = _emb_corpus(spark, sf_dir)
        rows = corpus.filter(F.col("vec_id") < 8).collect()
        cents = [
            (int(r["vec_id"]), list(map(float, r["embedding"]))) for r in rows
        ]
        cells = ivf_assign(corpus, cents, "embedding", "__cell").persist()
        cells.count()
        _ANN_INDEX[key] = (cents, cells)
    return _ANN_INDEX[key]


def _planes_sql(dim: int = 64, num_planes: int = 6) -> str:
    planes = _deterministic_planes(dim, num_planes)
    rows = ", ".join(
        f"({p}, [{', '.join(repr(v) for v in vec)}]::DOUBLE[])"
        for p, vec in enumerate(planes)
    )
    return f"(VALUES {rows}) planes(p, pl)"


# Shipped ANN-LSH defaults: 8 planes x 8 tables x Hamming-1 probing.
# Measured at sf0.1 against exact cosine (tools/measure_recall.py):
# recall@5 = 0.80 at ~28% expected corpus scan; the old single-table
# single-probe 6-plane default measured 0.24.
# Shipped ANN-LSH defaults, chosen from the measured recall-vs-cost
# frontier (tools/lsh_frontier.py, 36 configs at sf0.1 + sf1): 12
# planes x 16 tables x Hamming-2 probes scans the SAME fraction of a
# uniform corpus as the old 8x8x1 default (0.29 vs 0.27, stable across
# a 10x corpus growth) while lifting recall@5 from 0.80 to 0.94. The
# extra cost is index rows (16 tables vs 8 — build-once) and probe
# fan-out (1264 vs 296 tiny probe rows/query), not candidates scored.
_LSH_PLANES, _LSH_TABLES, _LSH_RADIUS = 12, 16, 2


def _multi_planes_sql(
    dim: int = 64,
    num_planes: int = _LSH_PLANES,
    num_tables: int = _LSH_TABLES,
) -> str:
    rows = []
    for t in range(num_tables):
        for p, vec in enumerate(_deterministic_planes(dim, num_planes, t)):
            vals = ", ".join(repr(v) for v in vec)
            rows.append(f"({t}, {p}, [{vals}]::DOUBLE[])")
    return f"(VALUES {', '.join(rows)}) planes(t, p, pl)"


def _masks_sql(
    num_planes: int = _LSH_PLANES, radius: int = _LSH_RADIUS
) -> str:
    from finlogic_spark.operators.similarity import probe_masks

    vals = ", ".join(f"({m})" for m in probe_masks(num_planes, radius))
    return f"(VALUES {vals}) masks(mask)"


@q(
    "emb_lsh_topk",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
    cb AS (
      SELECT t, vec_id, v, CAST(sum(CASE WHEN
               list_sum(list_transform(range(1, 65), i -> v[i] * pl[i])) >= 0
             THEN power(2, p)::BIGINT ELSE 0 END) AS BIGINT) AS bucket
      FROM c CROSS JOIN {_multi_planes_sql()} GROUP BY t, vec_id, v),
    qb0 AS (
      SELECT t, query_id, qv, CAST(sum(CASE WHEN
               list_sum(list_transform(range(1, 65), i -> qv[i] * pl[i])) >= 0
             THEN power(2, p)::BIGINT ELSE 0 END) AS BIGINT) AS bucket
      FROM qs CROSS JOIN {_multi_planes_sql()} GROUP BY t, query_id, qv),
    qb AS (
      SELECT t, query_id, qv, xor(bucket, mask) AS bucket
      FROM qb0 CROSS JOIN {_masks_sql()}),
    scored AS (
      SELECT query_id, vec_id,
             max({_DOT_SQL} / ({_NORM_V} * {_NORM_Q})) AS cs
      FROM cb JOIN qb USING (t, bucket)
      GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS INTEGER) AS rk
          FROM scored)
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def emb_lsh_topk(spark, sf_dir):
    # Approximate top-k via multi-table multi-probe hyperplane LSH
    # (equi-join on (table, bucket) — the sub-linear 100 TB path). The
    # bucketed corpus is a build-once persisted index (_lsh_index);
    # per-query-batch work is the tiny query-side hash x probe fan-out
    # + broadcast join. Defaults measured: recall@5 0.94 at sf0.1 at a
    # ~29% uniform-corpus scan (see _LSH_PLANES comment /
    # tools/lsh_frontier.py / tools/measure_recall.py).
    corpus = _lsh_index(spark, sf_dir)
    queries = _emb_corpus(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = lsh_cosine_topk(
        corpus,
        queries,
        k=5,
        dim=64,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
        probe_radius=_LSH_RADIUS,
        corpus_bucketed=True,
        local_query_probes=True,
    )
    return out.select(
        "query_id", "vec_id", rN(F.col("cos_sim"), 6).alias("cos_sim"), "rk"
    ).orderBy("query_id", "rk")


_PAIR_DOT = "list_sum(list_transform(range(1, 65), i -> va[i] * vb[i]))"
_PAIR_NA = "sqrt(list_sum(list_transform(range(1, 65), i -> va[i] * va[i])))"
_PAIR_NB = "sqrt(list_sum(list_transform(range(1, 65), i -> vb[i] * vb[i])))"


@q(
    "emb_cosine_neardup",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT vec_id, v, CAST(sum(CASE WHEN
               list_sum(list_transform(range(1, 65), i -> v[i] * pl[i])) >= 0
             THEN power(2, p)::BIGINT ELSE 0 END) AS BIGINT) AS bucket
      FROM c CROSS JOIN {_planes_sql()} GROUP BY vec_id, v),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.v AS va, b.v AS vb
      FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b,
           floor({_PAIR_DOT} / ({_PAIR_NA} * {_PAIR_NB}) * 1000000.0 + 0.5)
             / 1000000.0 AS cos_sim
    FROM pairs
    WHERE {_PAIR_DOT} / ({_PAIR_NA} * {_PAIR_NB}) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def emb_cosine_neardup(spark, sf_dir):
    # Embedding-cosine near-dup pairs: LSH-bucket candidates + exact
    # cosine threshold — the vector-space dedup tier.
    from finlogic_spark.operators.similarity import cosine_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    vecs = e.select("vec_id", as_double.alias("embedding"))
    out = cosine_neardup_pairs(vecs, threshold=0.4, dim=64, num_planes=6)
    return out.select(
        "id_a", "id_b", rN(F.col("cos_sim"), 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Additional coverage: cube/rollup, window frames, pivot-first w/ dedup,
# set ops, approx aggregates
# ---------------------------------------------------------------------------

@q(
    "cube_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def cube_rollup(spark, sf_dir):
    # Grouping sets (absent from the reference, free in Spark —
    # SURVEY §2.4): full cube with ALL-labelled subtotal rows.
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@q(
    "window_running_rank",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_rank(spark, sf_dir):
    # rank + running sum with an explicit rows frame (window-frame
    # coverage beyond the reference's lags).
    o = _t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w_rank).cast("int").alias("price_rank"),
        (F.sum(cents).over(w_run).cast("double") / 100.0).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@q(
    "pivot_first_dedup",
    """
    WITH dedup AS (
      SELECT user_id, event_type, value
      FROM events
      QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id,
           coalesce(MAX(CASE WHEN event_type = 'click' THEN value END), 0.0) AS click,
           coalesce(MAX(CASE WHEN event_type = 'purchase' THEN value END), 0.0) AS purchase,
           coalesce(MAX(CASE WHEN event_type = 'view' THEN value END), 0.0) AS view
    FROM dedup GROUP BY user_id
    ORDER BY user_id
    """,
)
def pivot_first_dedup(spark, sf_dir):
    # The reference's exact pivot idiom (SURVEY §2.4 A6/A9 + D5):
    # dedupe to one row per logical key FIRST so pivot's first() is
    # deterministic, then pivot with an explicit value list + fill 0.
    e = _t(spark, sf_dir, "events")
    dedup = keep_last(
        e.select("user_id", "event_type", "value", "ts", "event_id"),
        ["user_id", "event_type"],
        ["ts", "event_id"],
    )
    return pivot_wide(
        dedup.select("user_id", "event_type", "value"),
        index=["user_id"],
        on="event_type",
        values="value",
        pivot_values=["click", "purchase", "view"],
        agg="first",
        fill=0.0,
    ).orderBy("user_id")


@q(
    "set_intersect_except",
    """
    SELECT 'both' AS bucket, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'only_f' AS bucket, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY bucket, c_custkey
    """,
)
def set_intersect_except(spark, sf_dir):
    # intersect / except (absent from the reference; SURVEY §2.8).
    o = _t(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = f_cust.intersect(o_cust).select(F.lit("both").alias("bucket"), "c_custkey")
    only_f = f_cust.subtract(o_cust).select(
        F.lit("only_f").alias("bucket"), "c_custkey"
    )
    return both.unionByName(only_f).orderBy("bucket", "c_custkey")


@q(
    "agg_quantiles",
    """
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 100.0 + 0.5) / 100.0 AS median_price,
           floor(quantile_cont(l_extendedprice, 0.9) * 100.0 + 0.5) / 100.0 AS p90_price,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_quantiles(spark, sf_dir):
    # Exact interpolated percentiles (median/p90) per group: both
    # engines use the same linear-interpolation definition, so values
    # match exactly. At 100 TB swap percentile() for approx_percentile
    # (t-digest, one pass, mergeable) — same call shape.
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            rN(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("median_price"),
            rN(F.percentile("l_extendedprice", F.lit(0.9)), 2).alias("p90_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "window_range_frame",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS trailing_30d_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_frame(spark, sf_dir):
    # RANGE frame over event time: per customer, trailing-30-day order
    # total. rangeBetween on epoch seconds — value-based frames (peers
    # by time distance), not row-based.
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("trailing_30d_total"),
    ).orderBy("o_custkey", "o_orderkey")


@q(
    "correlated_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R' AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def correlated_exists(spark, sf_dir):
    # TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates it to a
    # left-semi hash join (no per-row subquery execution). Exercises the
    # SQL surface end-to-end via temp views.
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R' AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@q(
    "stream_user_profiles",
    """
    SELECT user_id,
           count(*) AS n_events,
           CAST(COALESCE(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)), 0)
                AS DOUBLE) / 100.0 AS value_sum,
           CAST(count(DISTINCT CASE WHEN event_type IN
                  ('click', 'view', 'purchase', 'signup', 'error')
                THEN event_type ELSE '(other)' END) AS INTEGER) AS n_event_types,
           FALSE AS expired
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_user_profiles(spark, sf_dir):
    # applyInPandasWithState keyed-state operator, drained through a
    # bounded file-source stream (availableNow) into a memory sink.
    # The per-user profile is batch-SQL-expressible, so the oracle is
    # its batch twin: the stateful op accumulates exact integer cents
    # (order-independent), making the value hash comparable. keep_last
    # collapses multi-batch update-mode emissions to each user's final
    # profile (n_events is monotonic), so the result is independent of
    # micro-batch boundaries.
    from finlogic_spark.streaming import read_events_stream, drain_stream_to_df
    from finlogic_spark.streaming.stateful import user_profile_stream

    stream = read_events_stream(spark, sf_dir)
    # scale-safe drain (see stream_resample_ffill): executor-side
    # parquet per batch instead of driver-accumulating memory sink
    profiles = drain_stream_to_df(
        user_profile_stream(stream), output_mode="update"
    )
    return keep_last(profiles, ["user_id"], ["n_events"]).orderBy("user_id")


@q(
    "media_feature_extract",
    """
    -- The oracle reconstructs the generator's metadata formulas from
    -- range(64): Spark's values come from DECODING the binary header
    -- inside mapInPandas, so a hash match proves the binary round-trip
    -- (header layout + byte order) end to end. The embedding itself is
    -- md5-derived (not SQL-expressible); its checked invariants are
    -- dimensionality and the documented [-1, 1) component range.
    SELECT CAST(i AS BIGINT) AS media_id,
           CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(64 + (i % 4) * 32 AS INTEGER) AS width,
           CAST(48 + (i % 3) * 16 AS INTEGER) AS height,
           CAST(CASE WHEN i % 3 = 0 THEN 1 ELSE 25 + i % 10 END
                AS INTEGER) AS n_frames,
           CAST(148 AS INTEGER) AS byte_len,
           CAST(8 AS INTEGER) AS emb_dim,
           TRUE AS emb_in_range
    FROM range(64) t(i) ORDER BY media_id
    """,
)
def media_feature_extract(spark, sf_dir):
    # Multimodal column pipeline: opaque binary payloads + typed
    # metadata → Arrow-batched mapInPandas decode/feature-extract.
    # The codec is a deterministic stub (container libs absent here);
    # the Spark plumbing — schema, batching, binary-in/struct-out — is
    # the production shape. Round-trips through parquet to exercise the
    # binary column end-to-end.
    from finlogic_spark.operators.multimodal import extract_features, make_fake_media

    media = make_fake_media(spark, n=64)
    feats = extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_frames",
        "byte_len",
        F.size("embedding").alias("emb_dim"),
        F.forall(
            "embedding", lambda x: (x >= F.lit(-1.0)) & (x < F.lit(1.0))
        ).alias("emb_in_range"),
    ).orderBy("media_id")


@q(
    "approx_distinct",
    """
    -- Property-style oracle: HLL sketch VALUES are engine-specific by
    -- design, but the estimate's documented error bound is checkable —
    -- the *_ok flags assert |approx - exact| / exact <= 6% (rsd 0.02,
    -- 3 sigma). Spark's HLL++ is deterministic for fixed input, so the
    -- flags are stable; a regression breaking the sketch flips a flag
    -- and fails the value hash. Exact counts are compared directly.
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS approx_parts_ok,
           TRUE AS approx_orders_ok
    FROM lineitem
    """,
)
def approx_distinct(spark, sf_dir):
    # A4 at scale: approx_count_distinct (HLL++) next to the exact
    # count — the 100 TB variant of n_unique (SURVEY §2.4).
    l = _t(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (
        F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.06
    )
    return (
        l.agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        )
        .select(
            "exact_parts",
            "exact_orders",
            within("approx_parts", "exact_parts").alias("approx_parts_ok"),
            within("approx_orders", "exact_orders").alias("approx_orders_ok"),
        )
    )


_CENT_DOT = "list_sum(list_transform(range(1, 65), i -> v[i] * cv[i]))"
_CENT_NORM = "sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))"
_QCENT_DOT = "list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))"


@q(
    "emb_ivf_topk",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
    cells AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 {_CENT_DOT} / ({_NORM_V} * {_CENT_NORM}) DESC, cid ASC) AS rk
        FROM c CROSS JOIN cent) WHERE rk = 1),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT query_id, qv, cid,
               row_number() OVER (PARTITION BY query_id ORDER BY
                 {_QCENT_DOT} / ({_NORM_Q} * {_CENT_NORM}) DESC, cid ASC) AS rk
        FROM qs CROSS JOIN cent) WHERE rk <= 2),
    scored AS (
      SELECT query_id, vec_id,
             {_DOT_SQL} / ({_NORM_V} * {_NORM_Q}) AS cs
      FROM cells JOIN probes USING (cid))
    SELECT query_id, vec_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS INTEGER) AS rk
          FROM scored)
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def emb_ivf_topk(spark, sf_dir):
    # IVF approximate top-k: 8 seed-vector centroids, n_probe=2 — the
    # third similarity tier (brute force / LSH / IVF). Centroid collect
    # and corpus cell assignment are a build-once persisted index
    # (_ivf_index); query time is cell-probe + equi-join only.
    from finlogic_spark.operators.similarity import ivf_topk

    cents, cells = _ivf_index(spark, sf_dir)
    queries = _emb_corpus(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_topk(cells, queries, cents, k=5, n_probe=2, corpus_assigned=True)
    return out.select(
        "query_id", "vec_id", rN(F.col("cos_sim"), 6).alias("cos_sim"), "rk"
    ).orderBy("query_id", "rk")


# ---------------------------------------------------------------------------
# Training-data pipeline: vocabulary, splits, sequence packing, dedup clusters
# ---------------------------------------------------------------------------

@q(
    "doc_topk_tokens",
    f"""
    SELECT token, n FROM (
      SELECT token, count(*) AS n
      FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents)
      GROUP BY token)
    ORDER BY n DESC, token ASC LIMIT 20
    """,
)
def doc_topk_tokens(spark, sf_dir):
    # Corpus vocabulary building: explode tokens → partial-agg count →
    # TakeOrderedAndProject top-k. The shuffle carries one row per
    # distinct token per partition (map-side combine), not one per
    # token occurrence — the 100 TB vocab-count shape.
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@q(
    "sample_split_hash",
    """
    SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train' ELSE 'val' END AS split
    FROM documents ORDER BY doc_id
    """,
)
def sample_split_hash(spark, sf_dir):
    # Deterministic train/val split: hash the stable id, compare the
    # first hex byte ('e6' → 230/256 ≈ 89.8% train). Engine-independent
    # (md5 is md5 everywhere), reshuffle-proof (no RNG, no row order
    # dependence), and a narrow map — the only correct way to split at
    # 100 TB where "random with a seed" is irreproducible across
    # partitionings.
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6",
            "train",
        )
        .otherwise("val")
        .alias("split"),
    ).orderBy("doc_id")


@q(
    "doc_pack_sequences",
    f"""
    WITH sized AS (
      SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM sized)
    SELECT doc_id, shard, n_tokens,
           CAST(floor((cum - n_tokens) / 2048.0) AS INTEGER) AS seq_id
    FROM packed ORDER BY doc_id
    """,
)
def doc_pack_sequences(spark, sf_dir):
    # Concat-and-chunk sequence packing (the LLM-pretraining batching
    # step): per shard, a running token count assigns each document the
    # training sequence its first token lands in (seq_id = start_offset
    # div budget). Packing is PER SHARD, not global: a single global
    # cumulative sum would serialize on one partition at 100 TB; the
    # shard hash keeps the window shuffle balanced and each shard's
    # sequences independent.
    d = _t(spark, sf_dir, "documents")
    budget = 2048
    sized = d.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / float(budget))
            .cast("int")
            .alias("seq_id"),
        )
        .orderBy("doc_id")
    )


@q(
    "doc_epoch_order",
    f"""
    WITH toks AS (
      SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    ord AS (
      SELECT doc_id, n_tokens,
             md5('7:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
                                  1, 4))::BIGINT % 8 AS INTEGER) AS shard
      FROM toks),
    pos AS (
      SELECT doc_id, shard, n_tokens,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS position
      FROM ord),
    spans AS (
      SELECT doc_id, shard, position, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY position)
                  AS BIGINT) AS e
      FROM pos),
    seg AS (
      SELECT doc_id, shard, position, e - n_tokens AS s, e
      FROM spans WHERE n_tokens > 0)
    SELECT doc_id, shard, position,
           CAST(sq AS INTEGER) AS seq_id,
           CAST(greatest(sq * 2048, s) - s AS BIGINT) AS doc_offset,
           CAST(least((sq + 1) * 2048, e) - greatest(sq * 2048, s)
                AS BIGINT) AS seg_len
    FROM seg,
         LATERAL (SELECT unnest(generate_series(s // 2048, (e - 1) // 2048))
                  AS sq)
    ORDER BY doc_id, seq_id
    """,
)
def doc_epoch_order(spark, sf_dir):
    # Deterministic epoch ordering + shard assignment (r14 verdict
    # item 3), composed with pack_segments so the emitted segment
    # table CARRIES the loader order: each doc's epoch key is
    # md5(seed:doc_id) (reshuffle-proof, engine-independent — no RNG),
    # its shard the key's hex bucket, its position the key's rank
    # within the shard (per-shard sort, never a global TakeOrdered),
    # and the concat-and-chunk segmentation runs in POSITION order —
    # the exact (shard, seq, offset) map a reproducible training
    # loader replays, identical on any cluster for the same seed.
    from finlogic_spark.operators.corpus import epoch_order, pack_segments

    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    ordered = epoch_order(sized, "doc_id", seed=7, n_shards=8)
    segs = pack_segments(
        ordered,
        id_col="position",
        shard_col="shard",
        len_col="n_tokens",
        budget=2048,
        carry_cols=["doc_id"],
    )
    return segs.select(
        "doc_id", "shard", "position", "seq_id", "doc_offset", "seg_len"
    ).orderBy("doc_id", "seq_id")


@q(
    "doc_length_batches",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents),
    nz AS (
      SELECT doc_id, n,
             md5('9:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(('0x' || substr(md5('9:' || CAST(doc_id AS VARCHAR)),
                                  1, 4))::BIGINT % 8 AS INTEGER) AS shard,
             CAST(length(bin(n)) AS INTEGER) AS len_class
      FROM t WHERE n > 0),
    rk AS (
      SELECT doc_id, n, shard, len_class,
             row_number() OVER (PARTITION BY shard, len_class
                                ORDER BY k, doc_id) AS r
      FROM nz),
    b AS (SELECT doc_id, n, shard, len_class,
                 CAST((r - 1) // 32 AS BIGINT) AS batch_id FROM rk)
    SELECT shard, len_class, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n) AS BIGINT) AS max_len,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           floor((1.0 - CAST(sum(n) AS DOUBLE) / (count(*) * max(n)))
                 * 1000000.0 + 0.5) / 1000000.0 AS pad_ratio
    FROM b GROUP BY 1, 2, 3
    ORDER BY shard, len_class, batch_id
    """,
)
def doc_length_batches(spark, sf_dir):
    # Length-bucketed batch manifest (operators/corpus.length_batches):
    # the padded-batch loader shape fine-tuning uses — docs batch with
    # others of the same token-count BIT LENGTH (exact integer class
    # via length(bin(n)); floor(log2) through floating log flips at
    # exact powers of two across libms), assignment seeded and
    # reshuffle-proof like epoch_order. Within a batch lengths differ
    # at most 2x by construction, so the reported per-batch padding
    # waste 1 - sum/(count*max) is < 50% worst-case. One (shard,
    # len_class) window exchange + the manifest aggregate.
    from finlogic_spark.operators.corpus import length_batches

    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    lb = length_batches(
        sized, "doc_id", "n_tokens", seed=9, n_shards=8, batch_size=32
    )
    return (
        lb.groupBy("shard", "len_class", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "shard",
            "len_class",
            "batch_id",
            "n_docs",
            "max_len",
            "sum_tokens",
            (
                F.floor(
                    (
                        F.lit(1.0)
                        - F.col("sum_tokens").cast("double")
                        / (F.col("n_docs") * F.col("max_len"))
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("pad_ratio"),
        )
        .orderBy("shard", "len_class", "batch_id")
    )


def _curriculum_oracle_sql(sf_dir: str) -> str:
    from finlogic_spark.operators.quality_model import MICRO, N_BUCKETS

    w, b = _qclf_params(sf_dir)
    w_sql = "[" + ", ".join(str(v) for v in w) + "]"
    return f"""
    -- learned curriculum: same baked weights as doc_quality_classifier,
    -- same batch arithmetic as doc_length_batches; per-batch mean logit
    -- via exact integer micro sums, per-shard easy-first rank
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
    nz AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
    s AS (SELECT doc_id, n,
            CAST(list_sum(list_transform(ts,
              t -> ({w_sql})[
                ('0x' || substr(md5(t), 1, 4))::BIGINT % {N_BUCKETS} + 1
              ])) AS BIGINT)
            + CAST(n AS BIGINT) * CAST({b} AS BIGINT) AS raw
          FROM nz),
    scored AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n,
             floor(CAST(raw AS DOUBLE) / (CAST(n AS DOUBLE) * {MICRO}.0)
                   * 1000000.0 + 0.5) / 1000000.0 AS logit
      FROM s),
    lb AS (
      SELECT doc_id, n, logit,
             md5('9:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(('0x' || substr(md5('9:' || CAST(doc_id AS VARCHAR)),
                                  1, 4))::BIGINT % 8 AS INTEGER) AS shard,
             CAST(length(bin(n)) AS INTEGER) AS len_class
      FROM scored),
    rk AS (
      SELECT doc_id, logit, shard, len_class,
             row_number() OVER (PARTITION BY shard, len_class
                                ORDER BY k, doc_id) AS r
      FROM lb),
    bt AS (SELECT doc_id, logit, shard, len_class,
                  CAST((r - 1) // 32 AS BIGINT) AS batch_id FROM rk),
    m AS (
      SELECT shard, len_class, batch_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             floor(CAST(sum(CAST(floor(logit * 1000000.0 + 0.5) AS BIGINT))
                        AS DOUBLE) / count(*) + 0.5) / 1000000.0
               AS mean_logit
      FROM bt GROUP BY 1, 2, 3)
    SELECT shard, len_class, batch_id, n_docs, mean_logit,
           CAST(row_number() OVER (PARTITION BY shard
                  ORDER BY mean_logit DESC, len_class, batch_id)
                AS INTEGER) AS curriculum_pos
    FROM m ORDER BY shard, curriculum_pos
    """


LAZY_ORACLES["doc_curriculum_order"] = _curriculum_oracle_sql


@q("doc_curriculum_order")  # data-dependent oracle: LAZY_ORACLES above.
def doc_curriculum_order(spark, sf_dir):
    # Learned curriculum schedule (the loader-family capstone):
    # length-bucketed batches (doc_length_batches arithmetic verbatim)
    # ranked easy-first WITHIN EACH SHARD by the batch's mean learned
    # quality — the quality classifier's logit, averaged in exact
    # integer micro-units so the schedule is partition-order
    # independent. Per-shard rank, never a global TakeOrdered (shards
    # are the loader's parallel unit); ties broken by integer batch
    # keys. One classifier scan + one (shard, len_class) window + one
    # manifest aggregate + one |batches|-sized shard window.
    from pyspark.sql import Window

    from finlogic_spark.operators.corpus import length_batches
    from finlogic_spark.operators.quality_model import classify_quality

    w, b = _qclf_params(sf_dir)
    d = _t(spark, sf_dir, "documents")
    scored = classify_quality(d, "text", "doc_id", w, b).select(
        "doc_id", "n_tokens", "logit"
    )
    lb = length_batches(
        scored, "doc_id", "n_tokens", seed=9, n_shards=8, batch_size=32
    )
    manifest = lb.groupBy("shard", "len_class", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.floor(
                F.sum(
                    F.floor(F.col("logit") * F.lit(1e6) + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("mean_logit"),
    )
    rank_w = Window.partitionBy("shard").orderBy(
        F.col("mean_logit").desc(), "len_class", "batch_id"
    )
    return (
        manifest.withColumn(
            "curriculum_pos", F.row_number().over(rank_w)
        )
        .orderBy("shard", "curriculum_pos")
    )


@q(
    "doc_dedup_clusters",
    f"""
    WITH RECURSIVE s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
             list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
             list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
             list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
             list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
             list_min(list_transform(sh, x -> md5('5|' || x))) AS m5
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1 || '|' || m2) AS bh FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m3 || '|' || m4 || '|' || m5) AS bh FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id),
    e2 AS (SELECT id_a AS es, id_b AS ed FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e2.ed, reach.r FROM reach JOIN e2 ON e2.es = reach.id)
    SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id
    ORDER BY doc_id
    """,
)
def doc_dedup_clusters(spark, sf_dir):
    # Near-dup CLUSTERING: LSH emits candidate pairs; keeping one
    # representative per duplicate class needs the transitive closure.
    # Iterative min-label propagation (operators/graph.py) labels every
    # doc with its component's smallest doc_id — the canonical
    # representative a filter can then keep. The oracle computes the
    # same closure with a recursive CTE.
    from finlogic_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2)
    # 'auto' is shape-aware (r8): above 10M candidate edges it goes
    # star-FIRST — measured on the real 117.9M-edge sf100 dup graph
    # (tools/probe_r8.py, identical 2.15M clusters): star-only 107.1 s
    # in 4 rounds vs label-then-star 157.7 s. Below the threshold the
    # label fast path wins (bench scale: ~2x faster than star-only).
    cc = connected_components(
        pairs, d.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    return cc.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster")
    ).orderBy("doc_id")


@q("doc_cluster_split")  # oracle composed below from the component SQL
def doc_cluster_split(spark, sf_dir):
    # Leakage-safe train/val split (r14 verdict item 2): the classic
    # eval-contamination bug is hashing the DOC id, so near-duplicates
    # straddle train/val and the model is graded on paraphrases of its
    # training set. Compose the owned halves: LSH pairs → connected-
    # component cluster labels (doc_dedup_clusters) → md5-hash split ON
    # THE CANONICAL LABEL — every member of a duplicate class lands on
    # the same side by construction (pinned in
    # tests/test_round15_props.py: no LSH pair straddles splits).
    # Scale shape: the split itself is a narrow map over the cluster
    # column; all heavy lifting is the already-graded LSH + CC plan.
    from finlogic_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2)
    cc = connected_components(
        pairs, d.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster"),
        F.when(
            F.substring(F.md5(F.col("label").cast("string")), 1, 2) < "e6",
            "train",
        )
        .otherwise("val")
        .alias("split"),
    ).orderBy("doc_id")


# oracle composition (the emb_lsh_recall / doc_hybrid_search precedent):
# the component's recursive-CTE closure SQL verbatim in a derived table,
# the split applied on its cluster label — same md5 threshold as
# sample_split_hash, but keyed on the CLUSTER.
ORACLES["doc_cluster_split"] = f"""
    SELECT doc_id, cluster,
           CASE WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train' ELSE 'val' END AS split
    FROM ({ORACLES["doc_dedup_clusters"]}) t
    ORDER BY doc_id
    """


def _closure_split_sql(where: str) -> str:
    """The LSH → closure → cluster-hashed split, parameterized by a
    documents filter — generated, not hand-copied, so the two legs of
    doc_split_drift stay structurally identical to each other (and to
    the doc_dedup_clusters closure shape)."""
    return f"""
    WITH RECURSIVE base AS (SELECT doc_id, text FROM documents {where}),
    s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM base),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
             list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
             list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
             list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
             list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
             list_min(list_transform(sh, x -> md5('5|' || x))) AS m5
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1 || '|' || m2) AS bh
      FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m3 || '|' || m4 || '|' || m5) AS bh
      FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id),
    e2 AS (SELECT id_a AS es, id_b AS ed FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM base
      UNION
      SELECT e2.ed, reach.r FROM reach JOIN e2 ON e2.es = reach.id)
    SELECT id AS doc_id, min(r) AS cluster,
           CASE WHEN substring(md5(CAST(min(r) AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train' ELSE 'val' END AS split
    FROM reach GROUP BY id
    """


@q("doc_split_drift")  # oracle composed below from two closure legs
def doc_split_drift(spark, sf_dir):
    # Split STABILITY under ingest — the production hazard
    # doc_cluster_split introduces: cluster labels are min-ids over
    # near-dup components, so a batch of new documents can MERGE
    # components, change a cluster's canonical label, and silently flip
    # surviving documents across the train/val boundary (leakage that
    # accrues over time, the incremental sibling of the contamination
    # bug the split fixes at a point in time). This query measures it:
    # recompute the split on yesterday's corpus (the deterministic
    # doc_id%2 half — the doc_exact_dedup_incremental fixture shape)
    # and on today's full corpus, and report every old document's
    # (old, new) cluster/side with a flipped flag — the drift table an
    # ingest pipeline alerts on. Scale shape: two runs of the graded
    # LSH+CC plan + one id-keyed join; nothing new exchanges.
    from finlogic_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")

    def cluster_split(docs):
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", k=3, num_hashes=6, bands=2
        )
        cc = connected_components(
            pairs, docs.select("doc_id"), src="id_a", dst="id_b",
            id_col="doc_id",
        )
        return cc.select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster"),
            F.when(
                F.substring(F.md5(F.col("label").cast("string")), 1, 2)
                < "e6",
                "train",
            )
            .otherwise("val")
            .alias("split"),
        )

    old = cluster_split(d.filter(F.col("doc_id") % 2 == 0)).select(
        "doc_id",
        F.col("cluster").alias("old_cluster"),
        F.col("split").alias("old_split"),
    )
    new = cluster_split(d).select(
        "doc_id",
        F.col("cluster").alias("new_cluster"),
        F.col("split").alias("new_split"),
    )
    return (
        old.join(new, "doc_id")
        .select(
            "doc_id",
            "old_cluster",
            "new_cluster",
            "old_split",
            "new_split",
            (F.col("old_split") != F.col("new_split")).alias("flipped"),
        )
        .orderBy("doc_id")
    )


ORACLES["doc_split_drift"] = f"""
    SELECT o.doc_id, o.cluster AS old_cluster, n.cluster AS new_cluster,
           o.split AS old_split, n.split AS new_split,
           o.split <> n.split AS flipped
    FROM ({_closure_split_sql("WHERE doc_id % 2 = 0")}) o
    JOIN ({_closure_split_sql("")}) n USING (doc_id)
    ORDER BY o.doc_id
    """


@q("doc_split_assign_sticky")  # oracle composed below
def doc_split_assign_sticky(spark, sf_dir):
    # The FIX for the drift doc_split_drift measures
    # (operators/graph.sticky_split_assign): frozen history sides are
    # inherited by new near-duplicates, components whose stored
    # members straddle both sides quarantine their new docs, and
    # fully-new components fall back to the cluster-hash rule — so an
    # incremental pipeline keeps the no-pair-straddles guarantee
    # WITHOUT ever reassigning a trained-on document. History here is
    # the deterministic doc_id%2 half's cluster split (the
    # doc_exact_dedup_incremental fixture shape); production persists
    # the store and appends, exactly like the fingerprint store.
    from finlogic_spark.operators.graph import (
        connected_components,
        sticky_split_assign,
    )

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 2 == 0)
    old_pairs = minhash_lsh_pairs(
        old, "text", "doc_id", k=3, num_hashes=6, bands=2
    )
    old_cc = connected_components(
        old_pairs, old.select("doc_id"), src="id_a", dst="id_b",
        id_col="doc_id",
    )
    stored = old_cc.select(
        F.col("id").alias("doc_id"),
        F.when(
            F.substring(F.md5(F.col("label").cast("string")), 1, 2) < "e6",
            "train",
        )
        .otherwise("val")
        .alias("split"),
    )
    full_pairs = minhash_lsh_pairs(
        d, "text", "doc_id", k=3, num_hashes=6, bands=2
    )
    return sticky_split_assign(
        full_pairs, d.select("doc_id"), stored
    ).orderBy("doc_id")


ORACLES["doc_split_assign_sticky"] = f"""
    WITH stored AS (
      SELECT doc_id, split AS stored_split
      FROM ({_closure_split_sql("WHERE doc_id % 2 = 0")})),
    fc AS (
      SELECT doc_id, cluster
      FROM ({_closure_split_sql("")})),
    j AS (
      SELECT fc.doc_id, fc.cluster, s.stored_split
      FROM fc LEFT JOIN stored s USING (doc_id)),
    per AS (
      SELECT cluster, count(DISTINCT stored_split) AS ns,
             max(stored_split) AS side
      FROM j GROUP BY 1)
    SELECT j.doc_id, j.cluster,
           COALESCE(j.stored_split,
                    CASE WHEN p.ns >= 2 THEN 'quarantine'
                         WHEN p.ns = 1 THEN p.side
                         ELSE CASE WHEN substring(md5(
                                CAST(j.cluster AS VARCHAR)), 1, 2) < 'e6'
                              THEN 'train' ELSE 'val' END
                    END) AS split
    FROM j JOIN per p USING (cluster)
    ORDER BY j.doc_id
    """


@q("doc_training_export")  # oracle composed below from the pieces
def doc_training_export(spark, sf_dir):
    # The end-to-end loader-shard export a pretraining run actually
    # consumes, in ONE query: leakage-safe TRAIN side (near-dup
    # clusters hashed on the canonical label, so no LSH pair straddles
    # the eval boundary) -> seeded epoch permutation + shard
    # assignment -> concat-and-chunk segment map in epoch order.
    # Output rows are exactly what a reproducible training loader
    # replays: (doc_id, shard, position, seq_id, doc_offset, seg_len).
    # Scale shape: the LSH+CC legs are the already-graded candidate
    # plans; the split/order/pack tail adds one narrow map + one
    # per-shard window — no new data-sized exchange beyond the
    # components'.
    from finlogic_spark.operators.corpus import epoch_order, pack_segments
    from finlogic_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2)
    cc = connected_components(
        pairs, d.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    )
    train = cc.filter(
        F.substring(F.md5(F.col("label").cast("string")), 1, 2) < "e6"
    ).select(F.col("id").alias("doc_id"))
    sized = d.join(train, "doc_id", "left_semi").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    ordered = epoch_order(sized, "doc_id", seed=7, n_shards=8)
    segs = pack_segments(
        ordered,
        id_col="position",
        shard_col="shard",
        len_col="n_tokens",
        budget=2048,
        carry_cols=["doc_id"],
    )
    return segs.select(
        "doc_id", "shard", "position", "seq_id", "doc_offset", "seg_len"
    ).orderBy("doc_id", "seq_id")


# composition: the cluster-split oracle picks the train docs; the epoch
# order/pack SQL is the doc_epoch_order oracle restricted to them.
ORACLES["doc_training_export"] = f"""
    WITH train AS (
      SELECT doc_id FROM ({ORACLES["doc_cluster_split"]}) s
      WHERE split = 'train'),
    toks AS (
      SELECT d.doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents d JOIN train USING (doc_id)),
    ord AS (
      SELECT doc_id, n_tokens,
             md5('7:' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
                                  1, 4))::BIGINT % 8 AS INTEGER) AS shard
      FROM toks),
    pos AS (
      SELECT doc_id, shard, n_tokens,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS BIGINT) AS position
      FROM ord),
    spans AS (
      SELECT doc_id, shard, position, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY position)
                  AS BIGINT) AS e
      FROM pos),
    seg AS (
      SELECT doc_id, shard, position, e - n_tokens AS s, e
      FROM spans WHERE n_tokens > 0)
    SELECT doc_id, shard, position,
           CAST(sq AS INTEGER) AS seq_id,
           CAST(greatest(sq * 2048, s) - s AS BIGINT) AS doc_offset,
           CAST(least((sq + 1) * 2048, e) - greatest(sq * 2048, s)
                AS BIGINT) AS seg_len
    FROM seg,
         LATERAL (SELECT unnest(generate_series(s // 2048, (e - 1) // 2048))
                  AS sq)
    ORDER BY doc_id, seq_id
    """


@q(
    "events_interval_join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts,
           count(p.ts) AS n_purchases,
           CAST(COALESCE(SUM(CAST(floor(p.value * 100.0 + 0.5) AS BIGINT)), 0)
                AS DOUBLE) / 100.0 AS purchase_total
    FROM clicks c LEFT JOIN purch p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
    GROUP BY c.event_id, c.user_id, c.ts
    ORDER BY c.event_id
    """,
)
def events_interval_join(spark, sf_dir):
    # Interval join (engine addition, SURVEY §2.3): every purchase in
    # the 30 minutes before each click, aggregated per click. The
    # operator is a bucketized equi-join (operators/rangejoin.py) — the
    # oracle's theta-join formulation would be a nested-loop join in
    # Spark and is exactly what the operator exists to avoid.
    from finlogic_spark.operators.rangejoin import interval_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pairs = interval_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        lower=-1800 * 1_000_000,  # 30 min in µs
        upper=0,
        right_cols=["value"],
    )
    per_click = pairs.groupBy("event_id").agg(
        F.count("ts_right").alias("n_purchases"),
        (
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5))).cast("double")
            / 100.0
        ).alias("purchase_total"),
    )
    return (
        clicks.join(per_click, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_total", F.lit(0.0)).alias("purchase_total"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Corpus curation: repetition filter, stratified sample, vocab prune,
# label centroids — plus TPC-H q18 (having + semi-join on aggregate)
# ---------------------------------------------------------------------------

_DR_SQL = _rN_sql(
    "CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)", 6
)
_TBF_SQL = _rN_sql(
    "CAST(list_max(list_transform(list_distinct(bg), "
    "x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)"
    " / CAST(len(bg) AS DOUBLE)",
    6,
)


@q(
    "doc_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    b AS (SELECT doc_id, toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END AS bg
          FROM t)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           {_DR_SQL} AS distinct_ratio,
           {_TBF_SQL} AS top_bigram_frac,
           COALESCE(({_TBF_SQL}) > 0.3 OR ({_DR_SQL}) < 0.5, FALSE)
             AS is_repetitive
    FROM b ORDER BY doc_id
    """,
)
def doc_repetition(spark, sf_dir):
    # Gopher-style repetition quality gate: distinct-token ratio + top-
    # bigram share, expression-only (zero shuffles — the explode→groupBy
    # alternative would shuffle every bigram occurrence of the corpus).
    d = _t(spark, sf_dir, "documents")
    out = d.select("doc_id", repetition_signals("text").alias("s")).select(
        "doc_id",
        F.col("s.n_tokens").alias("n_tokens"),
        rN(F.col("s.distinct_ratio"), 6).alias("distinct_ratio"),
        rN(F.col("s.top_bigram_frac"), 6).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "is_repetitive",
        F.coalesce(
            (F.col("top_bigram_frac") > 0.3) | (F.col("distinct_ratio") < 0.5),
            F.lit(False),
        ),
    ).orderBy("doc_id")


_SMP_THR_SQL = (
    "CASE lang WHEN 'en' THEN 'g0' WHEN 'de' THEN '80' "
    "WHEN 'fr' THEN '80' ELSE '40' END"
)


@q(
    "doc_stratified_sample",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 2)
          < {_SMP_THR_SQL}
    ORDER BY doc_id
    """,
)
def doc_stratified_sample(spark, sf_dir):
    # Deterministic per-language downsampling (keep all en, ~50% de/fr,
    # ~25% rest): md5-threshold filter — reshuffle-proof, no RNG, narrow
    # map; the only reproducible sampling at 100 TB.
    d = _t(spark, sf_dir, "documents")
    sampled = stratified_sample_hash(
        d, "lang", {"en": "g0", "de": "80", "fr": "80"},
        id_col="doc_id", default_rate="40",
    )
    return sampled.select("doc_id", "lang", "source").orderBy("doc_id")


@q(
    "doc_vocab_prune",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    counts AS (SELECT token, count(*) AS n
               FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token),
    vocab AS (SELECT list(token) AS vl FROM
              (SELECT token FROM counts ORDER BY n DESC, token ASC LIMIT 20))
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> NOT list_contains(vl, x)))
                AS BIGINT) AS n_oov,
           array_to_string(list_transform(toks,
             x -> CASE WHEN list_contains(vl, x) THEN x ELSE '<unk>' END),
             ' ') AS text_pruned
    FROM t CROSS JOIN vocab
    WHERE len(toks) > 0
    ORDER BY doc_id
    """,
)
def doc_vocab_prune(spark, sf_dir):
    # Vocabulary-constrained retokenization: build the top-20 vocab,
    # broadcast it, replace OOV tokens with <unk>, rebuild text. The
    # explode→broadcast-join→sorted-collect shape is the scale path; a
    # driver-side dict in a UDF is what it replaces.
    d = _t(spark, sf_dir, "documents")
    vocab = build_vocab(d, tokens("text"), size=20)
    return prune_to_vocab(d, tokens("text"), vocab, id_col="doc_id").orderBy(
        "doc_id"
    )


@q(
    "emb_label_centroids",
    f"""
    WITH ex AS (
      SELECT label, CAST(i AS INTEGER) AS pos, embedding[i+1]::DOUBLE AS val
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
    SELECT label, pos,
           {_rN_sql(
               "(CAST(SUM(CAST(floor(val * 1000000.0 + 0.5) AS BIGINT)) "
               "AS DOUBLE) / count(*)) / 1000000.0",
               6,
           )} AS c,
           CAST(count(*) AS BIGINT) AS n
    FROM ex GROUP BY label, pos ORDER BY label, pos
    """,
)
def emb_label_centroids(spark, sf_dir):
    # Distributed per-label mean vector (the k-means-update shape):
    # posexplode keys the shuffle by (label, pos) — 640 even cells —
    # and scaled-integer sums make the aggregate order-independent.
    e = _t(spark, sf_dir, "embeddings")
    return (
        label_centroids(e, "label", "embedding")
        .select("label", "pos", rN(F.col("c"), 6).alias("c"), "n")
        .orderBy("label", "pos")
    )


@q(
    "tpch_q18_big_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def tpch_q18_big_orders(spark, sf_dir):
    # TPC-H Q18 shape: semi-join on a HAVING aggregate, join pyramid,
    # exact-cents quantity sum, top-k by price. The big-orders set is
    # tiny by construction → broadcast semi-join, no orders shuffle.
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    j = (
        orders.join(F.broadcast(big), "o_orderkey", "left_semi")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_MINHASH_PAIRS_SQL = f"""
    s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM ded),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
             list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
             list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
             list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
             list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
             list_min(list_transform(sh, x -> md5('5|' || x))) AS m5
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1 || '|' || m2) AS bh FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m3 || '|' || m4 || '|' || m5) AS bh FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id)
"""


@q(
    "doc_decontaminate",
    f"""
    WITH t AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents
               WHERE text IS NOT NULL),
    e AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM t),
    tot AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
    rare AS (SELECT s FROM e CROSS JOIN tot
             GROUP BY s, tot.n HAVING count(*) <= tot.n * 0.05),
    val_sh AS (
      SELECT DISTINCT s FROM e
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e6'),
    hits AS (
      SELECT e.doc_id, e.s FROM e
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6')
    SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM hits h
    JOIN val_sh v ON h.s = v.s
    JOIN rare r ON h.s = r.s
    GROUP BY h.doc_id ORDER BY h.doc_id
    """,
)
def doc_decontaminate(spark, sf_dir):
    # Train/test decontamination: flag TRAIN documents sharing a rare
    # 3-shingle with any VAL document (the md5-hash split of
    # sample_split_hash). Stop-shingles (doc frequency > 5% of the
    # corpus) are excluded first — without the cap every doc "matches"
    # through boilerplate, and the join degenerates. Shapes: distinct
    # per-doc shingles → shingle-keyed semi-joins (the LSH-pair shape);
    # the 5% threshold comes from a broadcast scalar agg, not a
    # driver-side count.
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(shingles("text"))).alias("s")
    )
    total = d.agg(F.count("*").alias("__n"))
    rare = (
        sh.groupBy("s")
        .agg(F.count("*").alias("__nd"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__nd") <= F.col("__n") * 0.05)
        .select("s")
    )
    is_val = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= "e6"
    val_sh = sh.filter(is_val).select("s").distinct()
    hits = sh.filter(~is_val)
    return (
        hits.join(val_sh, "s", "left_semi")
        .join(rare, "s", "left_semi")
        .groupBy("doc_id")
        # (doc_id, s) is distinct by construction (array_distinct), and
        # semi-joins never duplicate — count(*) == count(DISTINCT s).
        .agg(F.count("*").alias("n_shared"))
        .orderBy("doc_id")
    )


@q(
    "doc_curation_pipeline",
    f"""
    WITH base AS (
      SELECT doc_id, lang, source, text, {_TOKS_SQL} AS toks
      FROM documents WHERE text IS NOT NULL),
    b2 AS (
      SELECT *, CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END AS bg
      FROM base),
    gated AS (
      SELECT doc_id, lang, source, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             md5(array_to_string(toks, ' ')) AS h
      FROM b2
      WHERE len(toks) >= 20
        AND NOT COALESCE(({_TBF_SQL}) > 0.3 OR ({_DR_SQL}) < 0.5, FALSE)
        AND ({_QUALITY_SQL}) >= 0.55),
    reps AS (SELECT h, min(doc_id) AS mid FROM gated GROUP BY h),
    ded AS (SELECT g.* FROM gated g
            JOIN reps r ON g.h = r.h AND g.doc_id = r.mid),
    {_MINHASH_PAIRS_SQL}
    SELECT doc_id, lang, source, n_tokens FROM ded
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
      AND substring(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 2)
          < {_SMP_THR_SQL}
    ORDER BY doc_id
    """,
)
def doc_curation_pipeline(spark, sf_dir):
    # End-to-end corpus curation flagship — the composed pipeline a
    # training-data run actually executes, every stage an operator this
    # engine already oracle-checks individually:
    #   1. drop null text            4. exact dedup (keep min doc_id)
    #   2. length / repetition /     5. near-dup removal (MinHash-LSH
    #      quality gates                 pairs, drop the higher id)
    #   3. (gates use the ROUNDED    6. deterministic stratified
    #      6dp values, mirroring        downsampling by language
    #      doc_repetition/quality)
    # Stage order matters and is mirrored exactly in the oracle: dedup
    # representatives depend on the gated survivor set, LSH buckets on
    # the deduped set, sampling runs last.
    from pyspark.storagelevel import StorageLevel

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = d.select(
        "doc_id", "lang", "source", "text",
        repetition_signals("text").alias("__s"),
    )
    gated = (
        sig.withColumn("__dr", rN(F.col("__s.distinct_ratio"), 6))
        .withColumn("__tbf", rN(F.col("__s.top_bigram_frac"), 6))
        .withColumn("__q", rN(quality_score("text"), 6))
        .filter(
            (F.col("__s.n_tokens") >= 20)
            & ~F.coalesce(
                (F.col("__tbf") > 0.3) | (F.col("__dr") < 0.5), F.lit(False)
            )
            & (F.col("__q") >= 0.55)
        )
        .select(
            "doc_id", "lang", "source", "text",
            F.col("__s.n_tokens").alias("n_tokens"),
        )
        # r17 barrier (the curation_learned pattern): the gate subtree
        # re-tokenizes every doc for repetition_signals + quality_score
        # and is consumed by both exact_dedup sides and the downstream
        # joins — lazy checkpoint so the per-row fold runs once
        # (stage decomposition: the gated projection alone is ~2.0 s of
        # the ~3.4 s row; probed 3.3-4.5 -> 2.7-3.4 s with the ded
        # barrier below, BENCH_r17_probes.json)
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    ded = exact_dedup(gated, "text", "doc_id").localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    pairs = minhash_lsh_pairs(ded, "text", "doc_id", k=3, num_hashes=6, bands=2)
    kept = ded.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    final = stratified_sample_hash(
        kept, "lang", {"en": "g0", "de": "80", "fr": "80"},
        id_col="doc_id", default_rate="40",
    )
    return final.select("doc_id", "lang", "source", "n_tokens").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Embedding quantization (storage tier for vector search at 100 TB)
# ---------------------------------------------------------------------------

# Shared recon expression: code_i = floor(v[i]*127/s + 0.5) (half-toward-
# +inf — reproduces bit-for-bit in both engines, unlike round()); recon_i
# = code_i * s / 127. s = 0 (all-zero vector) short-circuits to 0.0.
_SQ_RECON_SQL = """
      CASE WHEN s > 0.0 THEN
        list_transform(range(1, 65),
                       i -> floor(v[i] * 127.0 / s + 0.5) * s / 127.0)
      ELSE list_transform(range(1, 65), i -> 0.0) END
"""


@q(
    "emb_scalar_quantize",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS s FROM v),
    r AS (SELECT vec_id, v, s, {_SQ_RECON_SQL} AS rec FROM s)
    SELECT vec_id,
           {_rN_sql('s', 6)} AS q_scale,
           {_rN_sql('list_max(list_transform(range(1, 65), i -> abs(v[i] - rec[i])))', 6)}
             AS max_abs_err,
           {_rN_sql('''list_sum(list_transform(range(1, 65), i -> v[i] * rec[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
                * sqrt(list_sum(list_transform(range(1, 65), i -> rec[i] * rec[i]))))''', 6)}
             AS cos_recon
    FROM r ORDER BY vec_id
    """,
)
def emb_scalar_quantize(spark, sf_dir):
    # int8 scalar quantization: 4 bytes/dim -> 1 byte/dim + one scale.
    # The query verifies the full encode->decode loop: per-vector scale,
    # worst-component reconstruction error (bounded by scale/254 + FP),
    # and cosine(original, reconstruction) — the metric ANN serving
    # actually cares about. Served by the Arrow/numpy report tier:
    # the expression formulation (scalar_quantize + scalar_dequantize +
    # cosine) is ~10 interpreted HOF passes per row and measured 7.94 s
    # / 4.05x DuckDB at sf100 (BENCH_sf100.json r11); the numpy tier is
    # bit-identical by construction (every IEEE op + fold order
    # reproduced — pinned in tests/test_quantize_parity.py) and one
    # vectorized kernel per metric. Still a narrow map, zero exchanges.
    from finlogic_spark.operators.quantize import quantize_report

    corpus = _emb_corpus(spark, sf_dir)
    return (
        quantize_report(corpus, "vec_id", "embedding")
        .select(
            "vec_id",
            rN(F.col("q_scale"), 6).alias("q_scale"),
            rN(F.col("max_abs_err"), 6).alias("max_abs_err"),
            rN(F.col("cos_recon"), 6).alias("cos_recon"),
        )
        .orderBy("vec_id")
    )


def _pq_codebooks():
    from finlogic_spark.operators.quantize import deterministic_codebooks

    return deterministic_codebooks(m=8, k=16, width=8, scale=0.1)


def _pq_cb_values_sql() -> str:
    """The PQ codebooks as DuckDB VALUES rows (s, c, cv) — both engines
    inline identical seeded-md5 constants."""
    cbs = _pq_codebooks()
    return ", ".join(
        f"({s}, {c}, [" + ", ".join(repr(x) for x in cb[c]) + "]::DOUBLE[])"
        for s, cb in enumerate(cbs)
        for c in range(len(cb))
    )


def _pq_oracle_sql() -> str:
    """DuckDB twin of pq_encode/pq_decode over the SAME codebook
    constants (seeded md5 — both engines inline identical literals).

    Relational formulation: the codebook unnests to (s, c, cv) rows,
    distances come from one vector × codebook join (each distance
    computed exactly once — a scalar per-centroid expression list made
    DuckDB re-evaluate every distance ~16×, turning the oracle into a
    3-minute query), the per-subspace first-min row is the code (ties →
    lowest c, matching Spark's struct-min), recon is the ordered
    concatenation of chosen rows, and sq_err mirrors the full-vector
    zip_with fold."""
    rows = _pq_cb_values_sql()
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT * FROM (VALUES {rows}) t(s, c, cv)),
    d AS (
      SELECT vec_id, s, c, cv,
             list_sum(list_transform(range(1, 9),
               j -> (v[s * 8 + j] - cv[j]) * (v[s * 8 + j] - cv[j]))) AS d
      FROM v CROSS JOIN cb),
    pick AS (
      SELECT vec_id, s, c, cv FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY d, c) AS rk FROM d)
      WHERE rk = 1),
    agg AS (
      SELECT vec_id,
             string_agg(CAST(c AS VARCHAR), '|' ORDER BY s) AS pq_code,
             flatten(list(cv ORDER BY s)) AS rec
      FROM pick GROUP BY vec_id)
    SELECT vec_id, pq_code,
           {_rN_sql('list_sum(list_transform(range(1, 65), i -> (v[i] - rec[i]) * (v[i] - rec[i])))', 6)}
             AS sq_err
    FROM agg JOIN v USING (vec_id) ORDER BY vec_id
    """


@q("emb_pq_encode", _pq_oracle_sql())
def emb_pq_encode(spark, sf_dir):
    # Product quantization: 64-dim float32 -> 8 one-byte codes (32x
    # smaller). Encode is a shuffle-free per-subspace argmin with the
    # codebooks folded into the plan as literals; decode reconstructs
    # from codebook rows for approximate re-scoring. The query returns
    # the code word and the reconstruction's squared error — the
    # quantity a PQ-IVF serving stack scores with.
    from finlogic_spark.operators.quantize import pq_decode, pq_encode

    cbs = _pq_codebooks()
    corpus = _emb_corpus(spark, sf_dir)
    enc = pq_encode(corpus, cbs, "embedding", "pq_code")
    v = F.col("embedding")
    return (
        enc.withColumn("__rec", pq_decode(cbs, "pq_code"))
        .select(
            "vec_id",
            F.concat_ws(
                "|", F.transform("pq_code", lambda x: x.cast("string"))
            ).alias("pq_code"),
            rN(
                F.aggregate(
                    F.zip_with(v, F.col("__rec"), lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("sq_err"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# TPC-H breadth: q4 (exists + grouped count), q6 (tight scan-agg),
# q10 (returned-item revenue top-k), q14 (conditional revenue share)
# ---------------------------------------------------------------------------

@q(
    "tpch_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    # Q4 shape (adapted: this lineitem has no commit/receipt dates —
    # the late-shipment predicate keeps the correlated-EXISTS form):
    # date-sliced orders, left-semi join against qualifying lineitems,
    # grouped count. The semi-join shuffles only orderkeys, and the
    # shipdate predicate is pushed into the lineitem scan.
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpch_q6",
    f"""
    SELECT {_dsum_sql("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    # Q6: the canonical scan-bound query — every predicate reaches the
    # parquet reader (PushedFilters), projection prunes to 4 columns,
    # and the agg is a two-phase partial sum with no grouped shuffle.
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@q(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    # Q10: returned-item revenue. Fact-fact join shuffles on orderkey;
    # customer and nation ride in as broadcasts; top-20 is
    # TakeOrderedAndProject, never a global sort.
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return top_k(agg, [F.col("revenue").desc(), F.col("c_custkey").asc()], 20).select(
        "c_custkey", "c_name", "revenue", "n_name"
    )


@q(
    "tpch_q14",
    f"""
    SELECT {_rN_sql('''100.0 *
        (CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN
            CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
          ELSE 0 END) AS DOUBLE) / 100.0)
        / (CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
            AS BIGINT)) AS DOUBLE) / 100.0)''', 6)} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14(spark, sf_dir):
    # Q14 shape (promo share -> ECONOMY share; this part table's type
    # column is single-valued, not 'PROMO BURNISHED...'): conditional
    # aggregate over a broadcast dimension join, one output row. Both
    # sums use the exact-cents trick so the ratio is order-independent.
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + F.lit(0.5)
    )
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        rN(
            (
                F.lit(100.0)
                * (
                    F.sum(
                        F.when(F.col("p_type") == "ECONOMY", rev_cents).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                    / 100.0
                )
                / (F.sum(rev_cents).cast("double") / 100.0)
            ),
            6,
        ).alias("promo_revenue_pct")
    )


@q(
    "window_distribution",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0
             AS pct_rank,
           floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cume,
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, quartile, o_orderkey
    """,
)
def window_distribution(spark, sf_dir):
    # Distribution window functions (ntile / percent_rank / cume_dist)
    # — the ranking family beyond row_number: one hash-partitioned
    # window pass, all three functions share the same sort.
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            rN(F.percent_rank().over(w), 6).alias("pct_rank"),
            rN(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderpriority", "quartile", "o_orderkey")
    )


@q(
    "merge_upsert_orders",
    """
    WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS status,
                      o_totalprice AS price FROM orders),
    c AS (SELECT CASE WHEN o_orderkey % 5 = 2
                      THEN o_orderkey + 100000000 ELSE o_orderkey END AS k,
                 CASE WHEN o_orderkey % 5 = 0 THEN 'UPDATED'
                      WHEN o_orderkey % 5 = 2 THEN 'NEW' END AS status,
                 CASE WHEN o_orderkey % 5 = 2 THEN 1.0 END AS price,
                 o_orderkey % 5 = 1 AS is_deleted
          FROM orders WHERE o_orderkey % 5 IN (0, 1, 2)),
    merged AS (
      SELECT COALESCE(t.k, c.k) AS k,
             CASE WHEN c.k IS NOT NULL THEN COALESCE(c.status, t.status)
                  ELSE t.status END AS status,
             CASE WHEN c.k IS NOT NULL THEN COALESCE(c.price, t.price)
                  ELSE t.price END AS price,
             COALESCE(c.is_deleted, FALSE) AS del,
             c.k IS NOT NULL AS m
      FROM t FULL JOIN c ON t.k = c.k)
    SELECT k, status, price FROM merged WHERE NOT (m AND del) ORDER BY k
    """,
)
def merge_upsert_orders(spark, sf_dir):
    # MERGE INTO as a dataflow: snapshot = orders, changeset derived
    # from it deterministically — updates (partial: null price keeps the
    # target's), deletes (flag column), inserts (fresh keys). One
    # full-outer shuffle on the key; at scale both sides would be
    # bucketed on k making this shuffle-free.
    from finlogic_spark.operators.merge import merge_upsert

    o = _t(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    m5 = F.col("o_orderkey") % 5
    changes = (
        o.filter(m5.isin(0, 1, 2))
        .select(
            F.when(m5 == 2, F.col("o_orderkey") + 100000000)
            .otherwise(F.col("o_orderkey"))
            .alias("k"),
            F.when(m5 == 0, F.lit("UPDATED"))
            .when(m5 == 2, F.lit("NEW"))
            .alias("status"),
            F.when(m5 == 2, F.lit(1.0)).alias("price"),
            (m5 == 1).alias("is_deleted"),
        )
    )
    return merge_upsert(target, changes, ["k"], delete_col="is_deleted").orderBy("k")


@q(
    "events_funnel",
    """
    WITH t1s AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t1,
             list_sort(list(ts) FILTER (WHERE event_type = 'click')) AS l2,
             list_sort(list(ts) FILTER (WHERE event_type = 'purchase')) AS l3
      FROM events GROUP BY user_id),
    t2s AS (SELECT user_id, t1,
                   CASE WHEN t1 IS NOT NULL
                        THEN list_filter(l2, x -> x > t1)[1] END AS t2, l3
            FROM t1s),
    t3s AS (SELECT user_id, t1, t2,
                   CASE WHEN t2 IS NOT NULL
                        THEN list_filter(l3, x -> x > t2)[1] END AS t3
            FROM t2s),
    wide AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM t3s)
    SELECT step, step_name, n_users,
           floor(n_users / greatest(n1, 1) * 1000000.0 + 0.5) / 1000000.0
             AS conversion
    FROM (
      SELECT 1 AS step, 'view' AS step_name, n1 AS n_users, n1 FROM wide
      UNION ALL SELECT 2, 'click', n2, n1 FROM wide
      UNION ALL SELECT 3, 'purchase', n3, n1 FROM wide)
    ORDER BY step
    """,
)
def events_funnel(spark, sf_dir):
    # Ordered funnel view -> click -> purchase: step i counts only
    # strictly after the user's step i-1 time. One shuffle total — the
    # sequential semantics live in sorted arrays + filter()[0], not in
    # per-step re-joins of the fact table.
    from finlogic_spark.operators.funnel import funnel_counts

    e = _t(spark, sf_dir, "events")
    return funnel_counts(e, ["view", "click", "purchase"]).orderBy("step")


@q(
    "events_scd2",
    """
    WITH marked AS (
      SELECT user_id, event_type AS state, ts,
             CASE WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
                  THEN 0 ELSE 1 END AS nw
      FROM events
      WHERE user_id < 25
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, state
                              ROWS UNBOUNDED PRECEDING) AS iv
      FROM marked),
    intervals AS (
      SELECT user_id, iv, min(state) AS state, min(ts) AS valid_from
      FROM numbered GROUP BY user_id, iv)
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY iv)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY iv) IS NULL
             AS is_current
    FROM intervals
    ORDER BY user_id, valid_from
    """,
)
def events_scd2(spark, sf_dir):
    # SCD type-2 dimension from a change stream: per-user validity
    # intervals of the event_type "state", half-open [from, to), lag
    # change-points + running interval number + lead close — one key
    # shuffle, reused across both windows and the grouped agg. user_id
    # < 25 keeps the oracle comparison focused (full-table runs fine).
    # The oracle numbers intervals ordering by (ts, state): equal-ts
    # rows with equal state collapse anyway and the fixture's (user,
    # ts) pairs are unique, so both orders agree deterministically.
    from finlogic_spark.operators.scd import scd2_build

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    return scd2_build(
        e, "user_id", "event_type", "ts", tiebreak_col="event_id"
    ).withColumnRenamed("event_type", "state").orderBy("user_id", "valid_from")


def _zb_sql(col: str, lo: float, hi: float, bits: int) -> str:
    n = (1 << bits) - 1
    return (
        f"least(greatest(floor((CAST({col} AS DOUBLE) - {float(lo)!r})"
        f" / {float(hi - lo)!r} * {float(n + 1)!r}), 0), {n})::BIGINT"
    )


def _z_sql(cols: list[str], bits: int) -> str:
    n = len(cols)
    terms = [
        f"((({c} >> {b}) % 2) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


@q(
    "events_zorder",
    f"""
    WITH g AS (
      SELECT event_id,
             {_zb_sql('user_id', 0.0, 256.0, 8)} AS ub,
             {_zb_sql('value', 0.0, 20.0, 8)} AS vb
      FROM events)
    SELECT event_id, ub, vb, {_z_sql(['ub', 'vb'], 8)} AS z
    FROM g ORDER BY event_id
    """,
)
def events_zorder(spark, sf_dir):
    # Morton z-values over (user bucket, value bucket) — the layout key
    # zorder_write clusters files by so multi-dimension filters prune
    # on parquet min/max stats. Pure shift/mask codegen expressions;
    # the oracle mirrors the interleave bit for bit.
    from finlogic_spark.operators.zorder import bucketize, z_value

    e = _t(spark, sf_dir, "events")
    g = e.select(
        "event_id",
        bucketize(F.col("user_id"), 0.0, 256.0, 8).alias("ub"),
        bucketize(F.col("value"), 0.0, 20.0, 8).alias("vb"),
    )
    return g.select(
        "event_id", "ub", "vb",
        z_value([F.col("ub"), F.col("vb")], 8).alias("z"),
    ).orderBy("event_id")


@q(
    "events_incremental_agg",
    """
    -- The oracle IS the semantics contract: the incremental path
    -- (snapshot of 3/4 of events + folded-in changeset of the rest)
    -- must equal a from-scratch aggregate over ALL events.
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def events_incremental_agg(spark, sf_dir):
    # Incremental aggregate maintenance: build the snapshot from the
    # "old" partition of events, fold in the "late-arriving" changeset,
    # and return the maintained table. Exact-cents sums make the
    # incremental and recomputed paths bit-identical, so the oracle can
    # be the full recompute.
    from finlogic_spark.operators.incremental import (
        aggregate_cents,
        incremental_apply,
    )

    e = _t(spark, sf_dir, "events")
    old = e.filter(F.col("event_id") % 4 != 0)
    late = e.filter(F.col("event_id") % 4 == 0)
    snap = aggregate_cents(old, ["user_id"], ["value"], count_col="n_rows")
    return (
        incremental_apply(snap, late, ["user_id"], ["value"], count_col="n_rows")
        .withColumnRenamed("value_cents", "value_cents")
        .orderBy("user_id")
    )


@q(
    "approx_quantiles",
    """
    -- Property-style oracle (same pattern as approx_distinct): the
    -- sketch VALUES are engine-specific, but Spark's approx_percentile
    -- with accuracy 10000 carries a documented rank-error bound of
    -- 1/10000; the flags assert the estimate lies within 1% of the
    -- exact interpolated percentile. Exact values compare directly.
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 100.0 + 0.5) / 100.0
             AS exact_median,
           floor(quantile_cont(l_extendedprice, 0.99) * 100.0 + 0.5) / 100.0
             AS exact_p99,
           TRUE AS median_ok,
           TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def approx_quantiles(spark, sf_dir):
    # The one-pass mergeable quantile sketch next to the exact answer —
    # the 100 TB percentile path (exact percentile() buffers each
    # group's values; the sketch is bounded-memory and combinable
    # map-side).
    l = _t(spark, sf_dir, "lineitem")
    within = lambda approx, exact: (
        F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.01
    )
    return (
        l.groupBy("l_returnflag")
        .agg(
            rN(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("exact_median"),
            rN(F.percentile("l_extendedprice", F.lit(0.99)), 2).alias("exact_p99"),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("__am"),
            F.approx_percentile(
                "l_extendedprice", F.lit(0.99), F.lit(10000)
            ).alias("__ap"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            "exact_p99",
            within("__am", "exact_median").alias("median_ok"),
            within("__ap", "exact_p99").alias("p99_ok"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Fused PQ-IVF serving: the production ANN tier (brute force / LSH /
# IVF / PQ-IVF). Index = (vec_id, cell, pq_code) ONLY — ~9 bytes/vector
# instead of 256; serving never reads the original floats.
# ---------------------------------------------------------------------------


def _pq_ivf_index(spark, sf_dir):
    # Build-once persisted serving index (same lifecycle as _lsh_index /
    # _ivf_index): IVF cell assignment + PQ encode, embeddings projected
    # away. Production writes this .partitionBy("__cell") so a probe is
    # a partition-pruned scan of n_probe cells.
    from finlogic_spark.operators.similarity import pq_ivf_index

    key = ("pq_ivf", sf_dir)
    if key not in _ANN_INDEX:
        cents, _ = _ivf_index(spark, sf_dir)
        idx = pq_ivf_index(
            _emb_corpus(spark, sf_dir), cents, _pq_codebooks()
        ).persist()
        idx.count()
        _ANN_INDEX[key] = (cents, idx)
    return _ANN_INDEX[key]


def _pq_ivf_oracle_sql() -> str:
    """DuckDB twin of pq_ivf_topk: cells by cosine argmax to the 8 seed
    centroids (as emb_ivf_topk), per-vector PQ codes by subspace argmin
    (as emb_pq_encode), per-query LUT of subspace distances, adist =
    s-ordered sum of LUT[s][code_s] (list_sum over list(d ORDER BY s)
    matches Spark's left fold bit-for-bit), rank adist ASC."""
    return f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
    cb AS (SELECT * FROM (VALUES {_pq_cb_values_sql()}) t(s, cc, cv)),
    cells AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 {_CENT_DOT} / ({_NORM_V} * {_CENT_NORM}) DESC, cid ASC) AS rk
        FROM c CROSS JOIN cent) WHERE rk = 1),
    codes AS (
      SELECT vec_id, s, cc FROM (
        SELECT d.vec_id, d.s, d.cc,
               row_number() OVER (PARTITION BY d.vec_id, d.s
                                  ORDER BY d.d, d.cc) AS rk
        FROM (SELECT vec_id, s, cc,
                     list_sum(list_transform(range(1, 9),
                       j -> (v[s * 8 + j] - cv[j]) * (v[s * 8 + j] - cv[j]))) AS d
              FROM c CROSS JOIN cb) d) WHERE rk = 1),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT query_id, qv, cid,
               row_number() OVER (PARTITION BY query_id ORDER BY
                 {_QCENT_DOT} / ({_NORM_Q} * {_CENT_NORM}) DESC, cid ASC) AS rk
        FROM qs CROSS JOIN cent) WHERE rk <= 2),
    lut AS (
      SELECT query_id, s, cc,
             list_sum(list_transform(range(1, 9),
               j -> (qv[s * 8 + j] - cv[j]) * (qv[s * 8 + j] - cv[j]))) AS d
      FROM qs CROSS JOIN cb),
    scored AS (
      SELECT p.query_id, ce.vec_id,
             list_sum(list(l.d ORDER BY co.s)) AS adist
      FROM probes p
      JOIN cells ce USING (cid)
      JOIN codes co ON co.vec_id = ce.vec_id
      JOIN lut l ON l.query_id = p.query_id AND l.s = co.s AND l.cc = co.cc
      GROUP BY p.query_id, ce.vec_id)
    SELECT query_id, vec_id,
           floor(adist * 1000000.0 + 0.5) / 1000000.0 AS adist, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS INTEGER) AS rk
          FROM scored)
    WHERE rk <= 5
    ORDER BY query_id, rk
    """


@q("emb_pq_ivf_topk", _pq_ivf_oracle_sql())
def emb_pq_ivf_topk(spark, sf_dir):
    # Fused PQ-IVF serving (asymmetric distance computation): per query,
    # one expression builds the 8x16 LUT of query-to-codeword subspace
    # distances; candidates come from an equi-join on the query's
    # n_probe=2 nearest IVF cells against the persisted (vec_id, cell,
    # pq_code) index; each candidate costs 8 lookups + adds. This is
    # the 100 TB ANN serving shape: sub-linear candidates (IVF) x 32x
    # smaller index (PQ) x O(m) scoring (ADC) - original vectors never
    # read at serve time.
    from finlogic_spark.operators.similarity import pq_ivf_topk

    cents, idx = _pq_ivf_index(spark, sf_dir)
    queries = _emb_corpus(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = pq_ivf_topk(idx, queries, cents, _pq_codebooks(), k=5, n_probe=2)
    return out.select(
        "query_id", "vec_id", rN(F.col("adist"), 6).alias("adist"), "rk"
    ).orderBy("query_id", "rk")


@q(
    "stream_upsert_snapshot",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id, event_type
    """,
)
def stream_upsert_snapshot(spark, sf_dir):
    # Streaming MERGE sink, end to end: the events CDC stream drains
    # through foreachBatch merge_upsert into a versioned keyed snapshot
    # (exactly-once via deterministic batch ids + committed-version
    # reads). The batch-twin oracle is global keep-last per key: the
    # per-batch (dedup -> MERGE) fold must equal the full recompute.
    # The source is split into 3 chronological files so the sink folds
    # REAL multi-batch state. Correctness does NOT depend on the file
    # source's arrival order: the sink's MERGE compares order_cols, so
    # a stale row applied late is a no-op (order-robust), and the split
    # names b1<b2<b3 keep lexicographic == chronological anyway.
    import os
    import tempfile

    from finlogic_spark.streaming import (
        read_upsert_snapshot,
        run_upsert_sink,
        with_event_time,
    )

    e = with_event_time(_events(spark, sf_dir)).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    work = tempfile.mkdtemp(prefix="stream_upsert_")
    src = os.path.join(work, "src")
    # 3 chronological splits via a range repartition: a parallel
    # sample-sort into 3 time ranges (partition id == range order) —
    # no single-partition global window (ntile over an unpartitioned
    # ORDER BY sorts the whole table on one task).
    staged = e.repartitionByRange(3, F.col("ts"), F.col("event_id")).withColumn(
        "__b", F.spark_partition_id()
    )
    staged.persist()
    try:
        for i in (1, 2, 3):
            staged.filter(F.col("__b") == i - 1).drop("__b").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))
    finally:
        staged.unpersist()
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_upsert_sink(
        stream,
        os.path.join(work, "snap"),
        os.path.join(work, "ckpt"),
        keys=["user_id", "event_type"],
        order_cols=["ts", "event_id"],
    )
    return (
        read_upsert_snapshot(spark, os.path.join(work, "snap"))
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (q2/q7-q9/q11-q13/q15-q17/q19-q22, adapted)
#
# The driver's tables are TPC-H-shaped but slimmer: no partsupp, and
# lineitem/orders/customer lack commitdate/receiptdate/shipmode/phone/
# comment. Each query below keeps the ORIGINAL's operator shape (the
# thing being tested: correlated exists, scalar-subquery thresholds,
# disjunctive join predicates, distinct-count over anti-join, window
# min-per-group...) with predicates adapted to the columns that exist.
# partsupp-derived quantities (supplycost, availqty) are derived from
# lineitem instead: unit cost = avg(l_extendedprice / l_quantity) per
# (part, supplier) — same join topology, same cardinality class.
# ---------------------------------------------------------------------------


@q(
    "tpch_q7",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    # Q7 volume shipping: nation-pair trade revenue by ship year. The
    # two nation filters are resolved into supplier/customer BEFORE the
    # fact joins, so the one big l join o shuffle carries only the two
    # nations' rows; the pair disjunction then runs on two broadcast
    # columns. Scale shape: 1 shuffle (l join o), 4 broadcasts.
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "tpch_q8",
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {_rN_sql('''
             (CAST(SUM(CASE WHEN n1.n_name = 'NATION_5' THEN
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)
               ELSE 0 END) AS DOUBLE) / 100.0)
             / (CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                 AS BIGINT)) AS DOUBLE) / 100.0)''', 6)} AS mkt_share
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    # Q8 national market share: NATION_5's share of STANDARD-part
    # revenue sold into ASIA, by order year. Every dimension (part,
    # supplier+nation, customer+nation+region) broadcasts; the only
    # shuffle is l join o. Numerator and denominator both aggregate
    # exact cents so the ratio is order-independent.
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + F.lit(0.5)
    ).cast("bigint")
    joined = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            rN(
                (
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_5", rev_cents
                        ).otherwise(F.lit(0))
                    ).cast("double")
                    / 100.0
                )
                / (F.sum(rev_cents).cast("double") / 100.0),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "tpch_q9",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {_dsum_sql(
               "l_extendedprice * (1 - l_discount)"
               " - 0.6 * p_retailprice * l_quantity",
               "sum_profit",
           )}
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def tpch_q9(spark, sf_dir):
    # Q9 product-type profit (adapted: no partsupp, so unit cost =
    # 0.6 * p_retailprice instead of ps_supplycost). The selective
    # p_name prefix filter broadcasts into lineitem first, shrinking
    # the l join o shuffle ~8x; supplier/nation broadcast.
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(profit, "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@q(
    "tpch_q12",
    """
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_year ORDER BY ship_year
    """,
)
def tpch_q12(spark, sf_dir):
    # Q12 shipping-priority split (adapted: no l_shipmode/receiptdate —
    # "late" = shipped >60 days after order date, grouped by ship year).
    # The shape being tested: fact-fact join with a non-equi residual
    # predicate + conditional counts. One shuffle on orderkey.
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = l.join(
        o.hint("shuffle_hash"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return (
        joined.withColumn("ship_year", F.year("l_shipdate"))
        .groupBy("ship_year")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@q(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    # Q13 customer order-count distribution (adapted: the excluded-
    # comment filter becomes an excluded-priority filter). Instead of
    # the naive big left join, orders pre-aggregates to one (custkey,
    # count) row — map-side partial combine, then the per-customer
    # counts BROADCAST into customer for the outer join (a fact-sized
    # left join becomes a dim-sized broadcast at any scale where
    # customers << lineitems). Missing customers coalesce to 0.
    o_counts = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = c.join(
        o_counts, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@q(
    "tpch_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    # Q15 top supplier: revenue view + scalar-subquery max. The revenue
    # agg reduces lineitem to one row per supplier (partial combine);
    # the max is an agg over that tiny result, broadcast back as a
    # 1-row cross join — no second pass over the fact. Ties all
    # surface (equality on identical exact-cents doubles, not rank).
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    # Q16 supplier count per part attribute (adapted: partsupp ->
    # observed (part, supplier) pairs from lineitem; the complaints
    # NOT IN becomes negative-balance suppliers). Shape: broadcast
    # anti-join for the exclusion, broadcast dim join for the part
    # filter, then distinct-count — which Spark runs as a two-phase
    # expand/partial agg, not a global distinct.
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@q(
    "tpch_q17",
    f"""
    SELECT {_rN_sql(
        "CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))"
        " AS DOUBLE) / 100.0 / 7.0", 2)} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(floor(i.l_quantity * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / count(*) / 100.0
        FROM lineitem i WHERE i.l_partkey = p_partkey)
    """,
)
def tpch_q17(spark, sf_dir):
    # Q17 small-quantity-order revenue: correlated scalar subquery
    # (per-part average quantity) decorrelated into a broadcast
    # threshold join. The per-part averages aggregate the FULL
    # lineitem (the correlation ignores the brand filter), reduced to
    # one row per part — small enough to broadcast at any scale where
    # parts fit a dimension table. Threshold math is exact-cents /
    # count on both sides, so the 0.2x compare is bit-identical.
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem")
    thresholds = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            (
                F.sum(
                    F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("bigint")
                ).cast("double")
                / F.count("*")
                / 100.0
            ).alias("avg_qty")
        )
    )
    small = (
        l.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return small.agg(
        rN(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
            ).cast("double")
            / 100.0
            / 7.0,
            2,
        ).alias("avg_yearly")
    )


@q(
    "tpch_q19",
    f"""
    SELECT {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf_dir):
    # Q19 disjunctive-predicate join: three AND-blocks OR'd across
    # both join sides. The part-only disjuncts (brand+size) are
    # pre-applied as a scan filter on the broadcast side — the
    # equi-join stays a plain broadcast hash join and the residual
    # mixed predicate runs post-join, exactly how Catalyst splits
    # CNF-convertible disjunctions.
    p = _t(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
        )
    ).select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@q(
    "tpch_q20",
    """
    SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 5000)
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    # Q20 promotion candidates (adapted: availqty threshold -> shipped
    # 'red' part volume > 50 units per (supplier, part) in 1997). The
    # IN-subquery decorrelates to groupBy + left-semi join; quantity
    # sums in exact hundredths so the HAVING threshold compares
    # integers on both engines.
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("bigint")
            ).alias("qty_hund")
        )
        .filter(F.col("qty_hund") > 5000)
        .select("l_suppkey")
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


@q(
    "tpch_q21",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def tpch_q21(spark, sf_dir):
    # Q21 suppliers-who-kept-orders-waiting (adapted: late = shipped
    # >90 days after order date; no receipt/commit dates). The two
    # correlated EXISTS decorrelate into per-order windowed distinct
    # counts over the ALREADY order-partitioned join output: a row
    # survives iff its order has >1 distinct supplier (EXISTS) and
    # exactly 1 distinct LATE supplier (NOT EXISTS — the row itself is
    # late, so late-count 1 means nobody else was). One shuffle for
    # l join o; the windows reuse that partitioning (no second
    # exchange); supplier/nation ride in as broadcasts at the end,
    # AFTER the window filter, because the EXISTS scans must see ALL
    # suppliers' lineitems, not just NATION_3's.
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = l.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    w = Window.partitionBy("l_orderkey")
    j = (
        j.withColumn("_all_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "_late_supps",
            F.size(
                F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(late & (F.col("_all_supps") > 1) & (F.col("_late_supps") == 1))
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    waited = j.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    agg = waited.groupBy("s_name").agg(F.count("*").alias("numwait"))
    return top_k(agg, [F.col("numwait").desc(), F.col("s_name").asc()], 10).select(
        "s_name", "numwait"
    )


@q(
    "tpch_q22",
    f"""
    WITH eligible AS (
      SELECT substring(c_name, 18, 1) AS cntrycode, c_custkey, c_acctbal
      FROM customer WHERE substring(c_name, 18, 1) IN ('1', '3', '5')),
    threshold AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) / 100.0 AS avg_bal
      FROM eligible WHERE c_acctbal > 0.0)
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           {_dsum_sql("c_acctbal", "totacctbal")}
    FROM eligible, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-07-01')
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def tpch_q22(spark, sf_dir):
    # Q22 global sales opportunity (adapted: country code = last digit
    # of c_name since there's no c_phone; "no orders" = none since
    # 1999-07 since every customer has SOME order). Shape preserved:
    # scalar-subquery average (exact-cents, broadcast as a 1-row cross
    # join), anti-join against recent orders, grouped count+sum.
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 18, 1)
    ).filter(F.col("cntrycode").isin("1", "3", "5")).select(
        "cntrycode", "c_custkey", "c_acctbal"
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(
                F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
            ).cast("double")
            / F.count("*")
            / 100.0
        ).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-07-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


@q(
    "tpch_q2",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(floor(l_extendedprice / l_quantity * 1000000.0 + 0.5)
                           AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0 AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    candidates AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM cost
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           floor(unit_cost * 1000000.0 + 0.5) / 1000000.0 AS supply_cost
    FROM candidates WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark, sf_dir):
    # Q2 minimum-cost supplier (adapted: no partsupp — supply cost =
    # average observed unit price per (part, supplier) from lineitem).
    # The correlated min-subquery decorrelates to a window min over
    # p_partkey. Scale shape: the cost agg is ONE shuffle over
    # lineitem keyed (part, supp) with map-side combine; the selective
    # part filter + EUROPE suppliers broadcast into the small cost
    # table; the window runs on the few surviving rows. Exact-micros
    # averaging makes the min/equality bit-identical across engines.
    l = _t(spark, sf_dir, "lineitem")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(
                F.floor(
                    F.col("l_extendedprice") / F.col("l_quantity") * 1000000.0
                    + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / F.count("*")
            / 1000000.0
        ).alias("unit_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = cost.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_partkey")
    cand = cand.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    out = cand.select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        rN(F.col("unit_cost"), 6).alias("supply_cost"),
    )
    return top_k(
        out,
        [
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
        100,
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")


@q(
    "tpch_q11",
    """
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS value_cents
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2')
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS part_value
    FROM val
    WHERE CAST(value_cents AS DOUBLE)
          > (SELECT CAST(SUM(value_cents) AS DOUBLE) * 0.001 FROM val)
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11(spark, sf_dir):
    # Q11 important stock (adapted: no partsupp — a part's "value" held
    # by NATION_1/2 suppliers = their shipped revenue of it). Shape
    # preserved: grouped value + scalar-subquery fraction-of-total
    # threshold. Both the per-part values and the grand total stay in
    # exact integer cents until the output edge, so the 0.001x
    # threshold compare cannot split on summation order; the total is
    # a second tiny agg over the grouped result, broadcast back as a
    # 1-row cross join — no second fact pass.
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("value_cents")
        )
    )
    total = val.agg(
        (F.sum("value_cents").cast("double") * 0.001).alias("_threshold")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents").cast("double") > F.col("_threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey"))
    )


# ---------------------------------------------------------------------------
# Curation additions (round 6): PII redaction, normalization, chunking,
# skew-salted join/agg
# ---------------------------------------------------------------------------


@q(
    "doc_pii_redact",
    """
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example.com or http://ex.com/d/'
                        || CAST(doc_id AS VARCHAR)
                        || ' at 10.1.2.3 call 555-123-4567',
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 'https?://[^\\s]+', '<URL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '\\b\\+?\\d[\\d\\- ]{7,}\\d\\b', '<PHONE>', 'g') AS redacted
    FROM documents ORDER BY doc_id
    """,
)
def doc_pii_redact(spark, sf_dir):
    # PII redaction (functions/text_clean.py): emails, URLs, IPv4s and
    # phone-like digit runs masked with typed placeholders. The corpus
    # text carries no planted PII, so the query appends a
    # deterministic PII suffix derived from doc_id before redacting —
    # the regex path is exercised on every row, and both engines build
    # and scrub the identical string. Expression-only scan shape; the
    # patterns are the Java-regex ∩ RE2 subset so Spark and DuckDB
    # replace identically.
    from finlogic_spark.functions.text_clean import pii_redact

    d = _t(spark, sf_dir, "documents")
    augmented = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or http://ex.com/d/"),
        F.col("doc_id").cast("string"),
        F.lit(" at 10.1.2.3 call 555-123-4567"),
    )
    return d.select(
        "doc_id", pii_redact(augmented).alias("redacted")
    ).orderBy("doc_id")


@q(
    "doc_normalize",
    """
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
    FROM documents ORDER BY doc_id
    """,
)
def doc_normalize(spark, sf_dir):
    # Canonical text form (functions/text_clean.py normalize_text):
    # lowercase -> control-char strip -> whitespace collapse -> trim.
    # The oracle omits the control-char strip (this corpus has none;
    # the Spark side still runs it, proving it's a no-op on clean
    # text). Scan-shaped, zero shuffles.
    from finlogic_spark.functions.text_clean import normalize_text

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", normalize_text("text").alias("norm_text")
    ).orderBy("doc_id")


@q(
    "doc_chunk",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           substring(text, CAST(i AS INTEGER) * 150 + 1, 200) AS chunk
    FROM documents
    CROSS JOIN LATERAL (
      SELECT unnest(generate_series(0,
        greatest(1, CAST(ceil((length(text) - 50) / 150.0) AS INTEGER)) - 1))
        AS i)
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk(spark, sf_dir):
    # RAG-ingest chunking (functions/text_clean.py chunk_documents):
    # 200-char chunks, 50-char overlap (step 150), last chunk short but
    # never empty, short docs yield exactly one chunk. sequence() +
    # explode() + substring() — a narrow plan whose output size is
    # known up front; no shuffle, no UDF.
    from finlogic_spark.functions.text_clean import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(
        d, text_col="text", id_cols=("doc_id",), size=200, overlap=50
    ).orderBy("doc_id", "chunk_id")


@q(
    "join_skew_salted",
    f"""
    SELECT s_name, {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY s_name
    """,
)
def join_skew_salted(spark, sf_dir):
    # Salted join (operators/skew.py): lineitem joins the 100-row
    # supplier dim on a low-cardinality key — at 100 TB every suppkey
    # is a hot key. The salt (hash of l_orderkey, which varies within
    # a suppkey) fans each key over 8 sub-keys and replicates the dim
    # 8x, bounding any task to ~1/8 of the hottest key; the result is
    # row-identical to the plain join, which is exactly what the
    # oracle checks.
    from finlogic_spark.operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"),
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    joined = salted_join(l, s, on=["k"], salt_source="l_orderkey", salts=8)
    return (
        joined.groupBy("s_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("s_name")
    )


@q(
    "agg_skew_salted",
    """
    SELECT event_type,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_skew_salted(spark, sf_dir):
    # Two-phase salted aggregation (operators/skew.py): events grouped
    # by a 5-value key — the pathological all-keys-hot case. Partial
    # sums on (key, salt32) then a 32-row-per-key final merge; values
    # aggregate as exact cents so the salted partial order can't
    # change the double. Equals the plain GROUP BY (the oracle).
    from finlogic_spark.operators.skew import salted_agg

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("value_cents"),
    )
    agg = salted_agg(
        e,
        keys=["event_type"],
        salt_source="event_id",
        aggs={"cents": ("sum", "value_cents"), "n_events": ("count", "*")},
        salts=32,
    )
    return agg.select(
        "event_type",
        (F.col("cents").cast("double") / 100.0).alias("total_value"),
        "n_events",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round 6 additions: winnowing fingerprints, corpus repeated-span dedup,
# weighted sampling, unigram LM scoring, snapshot diff (CDC), single-pass
# profiling / expectations, blocked fuzzy join (entity resolution).
# ---------------------------------------------------------------------------

@q(
    "doc_winnow_fp",
    f"""
    WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    h AS (SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM s),
    m AS (SELECT doc_id, list_sort(list_distinct(list_transform(
            range(1, greatest(len(hs) - 3, 1) + 1),
            i -> list_min(hs[i:i+3])))) AS fp FROM h)
    SELECT doc_id, len(fp) AS n_fp, md5(array_to_string(fp, '')) AS fp_digest
    FROM m ORDER BY doc_id
    """,
)
def doc_winnow_fp(spark, sf_dir):
    # Winnowing (MOSS) rolling-hash fingerprints: k=3-token shingle
    # hashes, window-min over w=4 consecutive positions, distinct
    # minima per doc. Expression-only — the whole query is one scan
    # pass with zero shuffles (verified: plan has no Exchange).
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", winnow_fingerprints("text", k=3, w=4).alias("fp")
        )
        .select(
            "doc_id",
            F.size("fp").cast("long").alias("n_fp"),
            F.md5(F.array_join("fp", "")).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )


@q(
    "doc_segment_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    seg AS (SELECT doc_id, i AS pos,
                   array_to_string(toks[((i-1)*8+1):((i-1)*8+8)], ' ') AS seg
            FROM t, unnest(range(1, CAST(ceil(len(toks) / 8.0) AS INT) + 1)) AS u(i)),
    boiler AS (SELECT md5(seg) AS sh FROM seg
               GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
    kept AS (SELECT doc_id, pos, seg FROM seg
             WHERE md5(seg) NOT IN (SELECT sh FROM boiler)),
    agg AS (SELECT doc_id, count(*) AS n_seg_kept,
                   md5(string_agg(seg, ' ' ORDER BY pos)) AS clean_digest
            FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, count(*) AS n_seg_total FROM seg GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(tot.n_seg_total, 0) AS n_seg_total,
           COALESCE(agg.n_seg_kept, 0) AS n_seg_kept,
           COALESCE(agg.clean_digest, md5('')) AS clean_digest
    FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN agg USING (doc_id)
    ORDER BY doc_id
    """,
)
def doc_segment_dedup(spark, sf_dir):
    # C4/Lee-et-al-style repeated-span removal at fixed 8-token
    # segment granularity: segments occurring in >= 3 distinct docs
    # are boilerplate and removed from every document.
    d = _t(spark, sf_dir, "documents")
    return repeated_segment_dedup(d, "text", "doc_id", seg=8, min_docs=3).orderBy(
        "doc_id"
    )


def _hash_u_sql(id_expr: str, salt: str) -> str:
    """SQL twin of operators.corpus.hash_uniform — identical digit
    fold order so the double is bit-identical across engines."""
    h = f"md5('{salt}|' || CAST({id_expr} AS VARCHAR))"
    acc = "0"
    for i in range(1, 7):
        acc = (
            f"(({acc}) * 16 + (instr('0123456789abcdef', substr({h}, {i}, 1)) - 1))"
        )
    return f"((CAST({acc} AS DOUBLE) + 0.5) / 16777216.0)"


@q(
    "sample_weighted",
    f"""
    WITH keyed AS (
      SELECT o_orderkey,
             pow({_hash_u_sql("o_orderkey", "wrs")}, 1.0 / o_totalprice) AS key_raw
      FROM orders WHERE o_totalprice > 0
      ORDER BY key_raw DESC, o_orderkey ASC LIMIT 100)
    SELECT o_orderkey,
           floor(key_raw * 1000000.0 + 0.5) / 1000000.0 AS sample_key
    FROM keyed ORDER BY sample_key DESC, o_orderkey ASC
    """,
)
def sample_weighted_q(spark, sf_dir):
    # Efraimidis-Spirakis A-Res weighted sampling: top-100 orders by
    # key u^(1/totalprice), u hash-derived (reshuffle-proof). Plan is
    # TakeOrderedAndProject — per-partition top-k, no global sort.
    o = _t(spark, sf_dir, "orders")
    return (
        weighted_sample(o, "o_orderkey", "o_totalprice", 100, salt="wrs")
        .select("o_orderkey", "sample_key")
        .orderBy(F.col("sample_key").desc(), F.col("o_orderkey").asc())
    )


@q(
    "doc_unigram_logprob",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    vc AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM vc),
    lp AS (SELECT token, CAST(floor(ln(n / total) * 1000000.0) AS BIGINT) AS lpq
           FROM vc, tot),
    s AS (SELECT doc_id, count(*) AS n_tokens, SUM(lpq) AS slpq
          FROM tok JOIN lp USING (token) GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           floor(slpq / 1000000.0 / n_tokens * 1000000.0 + 0.5) / 1000000.0
             AS logprob_per_token
    FROM s ORDER BY doc_id
    """,
)
def doc_unigram_logprob(spark, sf_dir):
    # CCNet-style cheap LM gate: mean unigram log-probability per
    # token, frequencies from the corpus itself. log p quantized to
    # integer micro-nats per VOCAB row, summed exactly per doc —
    # engine- and partition-order-independent.
    d = _t(spark, sf_dir, "documents")
    return unigram_logprob_score(d, "text", "doc_id").orderBy("doc_id")


@q(
    "snapshot_diff",
    """
    WITH old_t AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    new_t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                 AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                  THEN 'unchanged'
                ELSE 'update' END AS change_type,
           o.o_orderstatus AS old_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus,
           n.o_totalprice AS new_o_totalprice
    FROM old_t o FULL OUTER JOIN new_t n ON o.o_orderkey = n.o_orderkey
    WHERE NOT (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
               AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
    ORDER BY o_orderkey
    """,
)
def snapshot_diff(spark, sf_dir):
    # CDC derivation between two snapshot versions of a keyed table
    # (deterministic synthetic v2: %97 keys deleted, %13 statuses
    # updated, %101 keys re-inserted under shifted ids). One full-outer
    # shuffle join on the key; null-safe per-column compare.
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("o_totalprice"),
            )
        )
    )
    return table_diff(
        o, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    ).orderBy("o_orderkey")


@q(
    "data_profile",
    """
    WITH p AS (
      SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
             count(*) FILTER (c_custkey IS NULL) AS n_nulls,
             count(DISTINCT c_custkey) AS n_distinct FROM customer
      UNION ALL
      SELECT 'c_name', count(*), count(*) FILTER (c_name IS NULL),
             count(DISTINCT c_name) FROM customer
      UNION ALL
      SELECT 'c_nationkey', count(*), count(*) FILTER (c_nationkey IS NULL),
             count(DISTINCT c_nationkey) FROM customer
      UNION ALL
      SELECT 'c_acctbal', count(*), count(*) FILTER (c_acctbal IS NULL),
             count(DISTINCT c_acctbal) FROM customer
      UNION ALL
      SELECT 'c_mktsegment', count(*), count(*) FILTER (c_mktsegment IS NULL),
             count(DISTINCT c_mktsegment) FROM customer)
    SELECT col_name, n_rows, n_nulls, n_distinct,
           floor(CAST(n_nulls AS DOUBLE) / n_rows * 1000000.0 + 0.5) / 1000000.0
             AS frac_null
    FROM p ORDER BY col_name
    """,
)
def data_profile(spark, sf_dir):
    # Single-pass per-column profile: one aggregate computes every
    # column's null/distinct stats (the oracle's 5 UNION ALL scans
    # collapse to ONE table read in Spark), exploded to long form.
    c = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    return profile_columns(c, cols).orderBy("col_name")


@q(
    "data_expectations",
    """
    WITH e AS (
      SELECT 'key_not_null' AS expectation,
             count(*) FILTER (NOT (o_orderkey IS NOT NULL)) AS n_violations,
             count(*) AS n_rows FROM orders
      UNION ALL
      SELECT 'status_in_domain',
             count(*) FILTER (NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)),
             count(*) FROM orders
      UNION ALL
      SELECT 'price_positive',
             count(*) FILTER (NOT COALESCE(o_totalprice > 0, FALSE)),
             count(*) FROM orders
      UNION ALL
      SELECT 'price_below_cap',
             count(*) FILTER (NOT COALESCE(o_totalprice < 400000.0, FALSE)),
             count(*) FROM orders
      UNION ALL
      SELECT 'date_in_range',
             count(*) FILTER (NOT COALESCE(
               o_orderdate >= TIMESTAMP '1992-01-01'
               AND o_orderdate < TIMESTAMP '1999-01-01', FALSE)),
             count(*) FROM orders)
    SELECT expectation, n_violations, n_rows FROM e ORDER BY expectation
    """,
)
def data_expectations(spark, sf_dir):
    # Constraint-violation counts in ONE map-side-combining pass
    # (NULL predicate counts as a violation — three-valued logic must
    # not let NULLs dodge checks). price_below_cap intentionally has
    # real violations in the data.
    o = _t(spark, sf_dir, "orders")
    return expect(
        o,
        {
            "key_not_null": F.col("o_orderkey").isNotNull(),
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "price_positive": F.col("o_totalprice") > 0,
            "price_below_cap": F.col("o_totalprice") < 400000.0,
            "date_in_range": (
                F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp")
            )
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")),
        },
    ).orderBy("expectation")


@q(
    "join_fuzzy_blocked",
    """
    WITH reps AS (
      SELECT p_name, min(p_partkey) AS rep_id FROM part GROUP BY p_name)
    SELECT a.rep_id AS id_a, b.rep_id AS id_b,
           a.p_name AS text_a, b.p_name AS text_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM reps a JOIN reps b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.rep_id < b.rep_id
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def join_fuzzy_blocked_q(spark, sf_dir):
    # Entity resolution two-step: exact-dedup names to one
    # representative each, then blocked fuzzy join (block = the noun
    # token; JVM-side levenshtein only within blocks — never the
    # O(n^2) cross join).
    p = _t(spark, sf_dir, "part")
    reps = p.groupBy("p_name").agg(F.min("p_partkey").alias("rep_id"))
    return fuzzy_join_blocked(
        reps,
        "rep_id",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        max_dist=1,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Round 6b: bloom-pruned join, BM25 search, resample+ffill, robust outliers
# ---------------------------------------------------------------------------

@q(
    "join_bloom_pruned",
    f"""
    SELECT c_nationkey, count(*) AS n_orders,
           {_dsum_sql("o_totalprice", "total_price")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 9000.0
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def join_bloom_pruned(spark, sf_dir):
    # Runtime-filter join: a bloom bit-set built from the selective dim
    # side broadcasts into the fact scan and drops non-matching orders
    # BEFORE the join's exchange — the explicit version of Spark's AQE
    # InjectRuntimeFilter, with no false negatives (the exact join
    # removes bloom false positives), so the oracle is the plain join.
    from finlogic_spark.operators.bloomjoin import bloom_pruned_join

    dim = (
        _t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == "MACHINERY")
            & (F.col("c_acctbal") > 9000.0)
        )
        .select("c_custkey", "c_nationkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        bloom_pruned_join(o, dim, "o_custkey", "c_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("c_nationkey")
    )


@q(
    "doc_bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token, len({_TOKS_SQL}) AS dl
      FROM documents),
    postings AS (
      SELECT token, doc_id, dl, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_dl
      FROM (SELECT doc_id, any_value(dl) AS dl FROM postings GROUP BY doc_id)),
    terms(token) AS (VALUES ('dup'), ('vector'), ('spark')),
    hits AS (SELECT p.* FROM postings p JOIN terms USING (token)),
    dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
    scored AS (
      SELECT h.doc_id,
             CAST(floor(
               ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (h.tf * (1.2 + 1.0))
               / (h.tf + 1.2 * (1.0 - 0.75
                  + 0.75 * h.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))
               * 1000000.0 + 0.5) AS BIGINT) AS score_u
      FROM hits h JOIN dfs f USING (token) CROSS JOIN stats s)
    SELECT doc_id, CAST(sum(score_u) AS DOUBLE) / 1000000.0 AS score,
           count(*) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def doc_bm25_search(spark, sf_dir):
    # Lexical retrieval served from the build-once persisted inverted
    # index (same lifecycle as _lsh_index): the term lookup is a
    # partition-PRUNED scan of the query terms' token-hash buckets with
    # df/corpus stats prebuilt — zero corpus passes at query time, the
    # 100 TB serving shape. Per-term BM25 contributions are quantized
    # to integer micro-units before the per-doc sum, so served scores
    # are bit-identical to a from-scratch bm25_topk(docs, ...).
    from finlogic_spark.operators.search import bm25_topk

    idx = _postings_index(spark, sf_dir)
    return bm25_topk(None, ["dup", "vector", "spark"], k=20, postings=idx)


@q(
    "events_resample_ffill",
    """
    WITH e AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket_ts, value AS v
      FROM events WHERE user_id % 20 = 0),
    hourly AS (
      SELECT key, bucket_ts,
             (CAST(sum(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
              / 100.0) / count(*) AS bucket_val
      FROM e GROUP BY 1, 2),
    bounds AS (
      SELECT key, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM hourly GROUP BY 1),
    grid AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM bounds)
    SELECT g.key, g.bucket_ts,
           floor(last_value(h.bucket_val IGNORE NULLS) OVER (
             PARTITION BY g.key ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1000000.0 + 0.5) / 1000000.0 AS val,
           h.bucket_val IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h USING (key, bucket_ts)
    ORDER BY key, bucket_ts
    """,
)
def events_resample_ffill(spark, sf_dir):
    # Hypertable-style gap-fill: bucket-agg (map-side combine), per-key
    # sequence() grid (no driver loop), forward-fill via running
    # last(ignorenulls) window partitioned by series key — state is one
    # key's grid, never global. Restricted to every 20th user to keep
    # the oracle compare bounded; the plan is key-partitioned either way.
    from finlogic_spark.operators.resample import resample_ffill

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    out = resample_ffill(e, "user_id", "ts", "value", step="1 hour")
    return out.select(
        "key", "bucket_ts", rN(F.col("val"), 6).alias("val"), "is_gap"
    ).orderBy("key", "bucket_ts")


@q(
    "events_outlier_mad",
    """
    WITH med AS (
      -- order-statistics median (same formula as the Spark side: the
      -- <=2 middle rows averaged), NOT quantile_cont — both engines
      -- run the identical arithmetic, and on the Spark side the sort
      -- spills where a percentile agg buffer would hold the group in
      -- memory.
      SELECT event_type,
             floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS grp_median
      FROM (
        SELECT event_type, value AS v,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                 AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL)
      WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
         OR rn = CAST(floor(n / 2.0) AS BIGINT) + 1
      GROUP BY event_type),
    j AS (
      SELECT e.event_id, e.event_type, e.value, m.grp_median
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type,
             floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS grp_mad
      FROM (
        SELECT event_type, abs(value - grp_median) AS v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(value - grp_median)) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM j WHERE abs(value - grp_median) IS NOT NULL)
      WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
         OR rn = CAST(floor(n / 2.0) AS BIGINT) + 1
      GROUP BY event_type)
    SELECT event_id, event_type, value, grp_median, grp_mad,
           floor(0.6745 * (value - grp_median) / nullif(grp_mad, 0.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS mod_z
    FROM j JOIN mad USING (event_type)
    WHERE abs(0.6745 * (value - grp_median) / nullif(grp_mad, 0.0)) > 3.5
    ORDER BY event_id
    """,
)
def events_outlier_mad(spark, sf_dir):
    # Iglewicz–Hoaglin robust outliers per event type: median/MAD via
    # two grouped exact medians + broadcast joins back (rows never
    # shuffle); med/MAD quantized to 6 dp BEFORE the z computation so
    # the flag decision is engine-deterministic. Default strategy is
    # the percentile aggregate (measured 3.8x faster at sf10); pass
    # spill_safe=True for groups that exceed executor memory, or swap
    # approx_percentile when an approximate center suffices.
    from finlogic_spark.operators.profile import robust_outliers

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = robust_outliers(e, "event_type", "value", threshold=3.5)
    return out.select(
        "event_id", "event_type", "value", "grp_median", "grp_mad",
        rN(F.col("mod_z"), 6).alias("mod_z"),
    ).orderBy("event_id")


@q(
    "events_histogram",
    """
    WITH h AS (
      SELECT event_type,
             CAST(greatest(0, least(floor((value - 0.0) / 50.0), 9)) AS INT)
               AS bin,
             count(*) AS n
      FROM events
      -- mirror histogram_fixed's contract: NULL/NaN values are
      -- excluded, not clamped into a bin (DuckDB's least/greatest
      -- SKIP null/NaN operands, so without this filter such a value
      -- would silently land in the top bin here only)
      WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2)
    SELECT event_type, bin, n,
           0.0 + bin * 50.0 AS bin_lo,
           0.0 + (bin + 1) * 50.0 AS bin_hi
    FROM h ORDER BY event_type, bin
    """,
)
def events_histogram(spark, sf_dir):
    # Fixed-bound equi-width histogram per group: ONE map-side-
    # combining aggregate over (group, bin) keys, single pass — the
    # scale shape (data-driven bounds would need a min/max pre-pass).
    from finlogic_spark.operators.profile import histogram_fixed

    e = _t(spark, sf_dir, "events")
    return (
        histogram_fixed(e, "event_type", "value", 0.0, 500.0, 10)
        .select("event_type", "bin", "n", "bin_lo", "bin_hi")
        .orderBy("event_type", "bin")
    )


@q(
    "emb_covariance",
    """
    WITH px AS (
      SELECT vec_id, r.range - 1 AS i,
             CAST(embedding[r.range] AS DOUBLE) AS x,
             CAST(floor(CAST(embedding[r.range] AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS xq
      FROM embeddings, range(1, 65) r),
    sums AS (
      SELECT a.i AS i, b.i AS j,
             sum(CAST(floor(a.x * b.x * 1000000.0 + 0.5) AS BIGINT)) AS sp,
             count(*) AS n
      FROM px a JOIN px b USING (vec_id) GROUP BY 1, 2),
    means AS (SELECT i, sum(xq) AS sx FROM px GROUP BY 1)
    SELECT s.i, s.j,
           floor((CAST(s.sp AS DOUBLE) / 1000000.0 / s.n
                  - (CAST(mi.sx AS DOUBLE) / 1000000.0 / s.n)
                    * (CAST(mj.sx AS DOUBLE) / 1000000.0 / s.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS cov
    FROM sums s JOIN means mi ON mi.i = s.i JOIN means mj ON mj.i = s.j
    ORDER BY s.i, s.j
    """,
)
def emb_covariance(spark, sf_dir):
    # Covariance of the embedding corpus (PCA / OPQ-rotation prep):
    # per-row outer products quantized to integer micro-units, ONE
    # groupBy over d^2 = 4096 keys with map-side combine — shuffle
    # cost O(partitions * d^2), independent of row count. The i/j are
    # 0-based; oracle mirrors via 1-based subscripts minus one.
    from finlogic_spark.operators.linalg import covariance_matrix

    emb = _t(spark, sf_dir, "embeddings")
    cov = covariance_matrix(emb, "embedding", 64)
    return cov.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        rN(F.col("cov"), 6).alias("cov"),
    ).orderBy("i", "j")


@q(
    "doc_tfidf_similar",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    postings AS (
      SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM postings),
    dfs AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM postings GROUP BY 1),
    wtd AS (
      SELECT p.doc_id, p.token,
             p.tf * ln(CAST((SELECT n_docs FROM nd) AS DOUBLE)
                       / CAST(f.df AS DOUBLE)) AS w
      FROM postings p JOIN dfs f USING (token)),
    norms AS (
      SELECT doc_id,
             sqrt(CAST(sum(CAST(floor(w * w * 1000000.0 + 0.5) AS BIGINT))
                       AS DOUBLE) / 1000000.0) AS norm
      FROM wtd GROUP BY 1),
    qp AS (
      SELECT doc_id AS query_id, token, w AS wq
      FROM wtd WHERE doc_id IN (0, 1, 2, 3, 4)),
    dots AS (
      SELECT q.query_id, d.doc_id,
             sum(CAST(floor(q.wq * d.w * 1000000.0 + 0.5) AS BIGINT)) AS dot_u
      FROM wtd d JOIN qp q USING (token)
      WHERE d.doc_id != q.query_id
      GROUP BY 1, 2),
    scored AS (
      SELECT dt.query_id, dt.doc_id,
             floor(CAST(dt.dot_u AS DOUBLE) / 1000000.0
                   / (qn.norm * dn.norm) * 1000000.0 + 0.5) / 1000000.0
               AS cos_sim
      FROM dots dt JOIN norms qn ON qn.doc_id = dt.query_id
                   JOIN norms dn ON dn.doc_id = dt.doc_id)
    SELECT query_id, doc_id, cos_sim, rk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, doc_id ASC)
        AS INTEGER) AS rk
      FROM scored) WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def doc_tfidf_similar(spark, sf_dir):
    # Lexical "more like this" served from the persisted postings
    # index: df / corpus stats / per-doc norms are prebuilt, the query
    # vectors come from a pruned forward-index scan checkpointed ONCE,
    # and the candidate scan reads ONLY the query terms' postings
    # lists (literal bucket partition filter + pushed token IN — r15:
    # the bucket-only pruning degenerated to a full scan because a few
    # query docs' vocabulary hits every bucket). Candidates come from
    # the token equi-join against the 5 broadcast query docs' postings
    # — bounded by |Q| x df, never all-pairs. Micro-unit-quantized
    # dot/norm sums keep the cosine identical across engines,
    # partitionings, AND the two paths.
    from finlogic_spark.operators.search import tfidf_similar

    idx = _postings_index(spark, sf_dir)
    return tfidf_similar(None, [0, 1, 2, 3, 4], k=5, postings=idx).orderBy(
        "query_id", "rk"
    )


def _pca_oracle_sql(sf_dir: str) -> str:
    """Hash-matchable oracle for the full PCA pipeline. The
    eigendecomposition itself isn't SQL-expressible, so the serial twin
    (pca_components_numpy: pyarrow + numpy, zero Spark) derives the
    components/mean from the SAME parquet with the SAME integer
    micro-quantization — bit-identical covariance, hence bit-identical
    eigh output — and this generator bakes them into the projection SQL
    as literals. DuckDB then independently verifies what the cluster
    actually computes at scale: the distributed covariance reduction
    (via the components' data dependence) and the per-row projection
    arithmetic, row by row, to the 6-dp hash."""
    from finlogic_spark.operators.linalg import pca_components_numpy

    comps, mu = pca_components_numpy(
        os.path.join(sf_dir, "embeddings.parquet"), "embedding", 64, 4
    )
    cols = []
    for c in range(4):
        # identical fold order to pca_project's F.aggregate: terms
        # i=0..63 summed left-to-right, each (x_i - mu_i) * comp_ic
        terms = " + ".join(
            f"(CAST(embedding[{i + 1}] AS DOUBLE) - {float(mu[i])!r})"
            f" * {float(comps[i, c])!r}"
            for i in range(64)
        )
        cols.append(f"{_rN_sql(f'({terms})', 6)} AS p{c}")
    return f"""
    SELECT vec_id AS id, {", ".join(cols)}
    FROM embeddings WHERE len(embedding) = 64 ORDER BY id
    """


LAZY_ORACLES["emb_pca_project"] = _pca_oracle_sql


@q("emb_pca_project")  # data-dependent oracle: see LAZY_ORACLES above.
# Invariants (orthonormality, variance ordering, numpy parity) are
# additionally pinned in tests/test_round6b_ops.py.
def emb_pca_project(spark, sf_dir):
    # PCA pipeline end-to-end: cluster-side covariance reduction →
    # bounded 64x64 driver eigh (32 KB, like the k-means centroid
    # collect) → expression-only zero-shuffle projection. Output
    # rounded to 6 dp for stable hashing; the k=4 scores are emitted as
    # scalar columns (p0..p3) — the registry compare stringifies flat
    # values deterministically, arrays aren't portable across engines.
    from finlogic_spark.operators.linalg import pca_project

    emb = _t(spark, sf_dir, "embeddings")
    out = pca_project(emb, "embedding", 64, 4)
    return out.select(
        "id",
        *[rN(F.col("proj")[c], 6).alias(f"p{c}") for c in range(4)],
    ).orderBy("id")


@q(
    "doc_token_pmi",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    n_t AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM toks),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_ab
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2 HAVING count(*) >= 5)
    SELECT tok_a, tok_b, n_ab,
           floor(ln(CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM nd)
                    / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS pmi
    FROM pairs JOIN n_t na ON na.token = tok_a
               JOIN n_t nb ON nb.token = tok_b
    ORDER BY pmi DESC, tok_a ASC, tok_b ASC LIMIT 20
    """,
)
def doc_token_pmi(spark, sf_dir):
    # Collocation mining: document-presence PMI over one doc-keyed
    # self-join (pairs bounded by per-doc distinct tokens, never corpus
    # size) + broadcast unigram counts. All counts exact ints; the pmi
    # double folds them in a fixed order on both engines.
    from finlogic_spark.operators.corpus import token_cooccurrence

    d = _t(spark, sf_dir, "documents")
    return token_cooccurrence(d, min_support=5, k=20)


@q(
    "doc_source_cap",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id)
               AS INTEGER) AS rn
      FROM documents)
    WHERE rn <= 10 ORDER BY source, doc_id
    """,
)
def doc_source_cap(spark, sf_dir):
    # Domain cap: deterministic hash-ranked sample of <=10 docs per
    # source (25/source in the test tables, so the cap binds) —
    # reshuffle-proof (md5, not RNG), one window shuffle on
    # the group key. The curation step that stops one domain from
    # dominating the training mix.
    from finlogic_spark.operators.corpus import cap_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(d, "source", "doc_id", cap=10).orderBy(
        "source", "doc_id"
    )


@q(
    "events_retention_cohorts",
    """
    WITH ua AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w FROM events),
    cohort AS (SELECT u, min(w) AS c FROM ua GROUP BY 1),
    ret AS (
      SELECT c AS cohort_week,
             CAST(datediff('day', CAST(c AS DATE), CAST(w AS DATE)) / 7
                  AS INT) AS week_offset,
             count(DISTINCT ua.u) AS n_active
      FROM ua JOIN cohort ON ua.u = cohort.u GROUP BY 1, 2),
    sz AS (SELECT c AS cohort_week, count(*) AS cohort_size
           FROM cohort GROUP BY 1)
    SELECT cohort_week, week_offset, n_active, cohort_size,
           floor(CAST(n_active AS DOUBLE) / cohort_size * 1000000.0 + 0.5)
             / 1000000.0 AS retention
    FROM ret JOIN sz USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    # Weekly cohort retention: distinct (user, week) presence collapses
    # event volume first; everything after partial-aggregates. The
    # product-analytics staple, one user-keyed join.
    from finlogic_spark.operators.funnel import retention_cohorts

    e = _t(spark, sf_dir, "events")
    return retention_cohorts(e, "user_id", "ts").orderBy(
        "cohort_week", "week_offset"
    )


@q(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_state
      FROM events),
    pairs AS (
      SELECT from_state, to_state, count(*) AS n FROM seq
      WHERE to_state IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_state, sum(n) AS total FROM pairs GROUP BY 1)
    SELECT from_state, to_state, n,
           floor(CAST(n AS DOUBLE) / total * 1000000.0 + 0.5) / 1000000.0 AS p
    FROM pairs JOIN tot USING (from_state)
    ORDER BY from_state, to_state
    """,
)
def events_markov_transitions(spark, sf_dir):
    # Behavioral-flow transition matrix: one lead() window pass per
    # user (deterministic via the event_id tiebreak) + partial-agg
    # counts + broadcast per-state totals.
    from finlogic_spark.operators.funnel import transition_matrix

    e = _t(spark, sf_dir, "events")
    return transition_matrix(
        e, "user_id", "ts", "event_type", "event_id"
    ).orderBy("from_state", "to_state")


@q(
    "stream_resample_ffill",
    """
    WITH e AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket_ts, value AS v
      FROM events WHERE user_id % 20 = 0),
    hourly AS (
      SELECT key, bucket_ts,
             (CAST(sum(CAST(floor(v * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
              / 100.0) / count(*) AS bucket_val
      FROM e GROUP BY 1, 2),
    bounds AS (
      SELECT key, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM hourly GROUP BY 1),
    grid AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM bounds)
    SELECT g.key, g.bucket_ts,
           floor(last_value(h.bucket_val IGNORE NULLS) OVER (
             PARTITION BY g.key ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1000000.0 + 0.5) / 1000000.0 AS val,
           h.bucket_val IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h USING (key, bucket_ts)
    ORDER BY key, bucket_ts
    """,
)
def stream_resample_ffill(spark, sf_dir):
    # Streaming twin of events_resample_ffill: the applyInPandasWithState
    # gap-fill drained through a bounded file stream. State per key is
    # ONE open bucket (3 longs); grid rows are emitted as hours close.
    # keep_last over (key, bucket) by the monotonic n_obs collapses the
    # open bucket's tentative update-mode re-emissions, so the result
    # is micro-batch-boundary independent and equals the batch SQL.
    from finlogic_spark.streaming import read_events_stream, drain_stream_to_df
    from finlogic_spark.streaming.stateful import resample_ffill_stream

    stream = read_events_stream(spark, sf_dir).filter(
        F.col("user_id") % 20 == 0
    )
    # foreachBatch parquet drain, NOT the memory sink: update-mode
    # emissions accumulate in driver memory under a memory sink, which
    # dies on spark.driver.maxResultSize at sf100 (probe-caught)
    rows = drain_stream_to_df(
        resample_ffill_stream(stream), output_mode="update"
    )
    # Batch-twin precondition: the stateful op drops events that arrive
    # below a key's open bucket, while the SQL twin folds ALL events in.
    # Every emitted row carries the key's cumulative dropped count, so
    # equality-with-the-oracle is only meaningful when it is zero —
    # gate loudly instead of letting a hash mismatch point nowhere
    # (the gate itself is pinned by the unordered-input streaming test).
    from finlogic_spark.streaming.stateful import assert_no_late_drops

    assert_no_late_drops(rows)
    final = keep_last(rows, ["key", "bucket_ts"], ["n_obs"])
    return final.select(
        "key", "bucket_ts", rN(F.col("val"), 6).alias("val"), "is_gap"
    ).orderBy("key", "bucket_ts")


# ---------------------------------------------------------------------------
# Round 7b: sliding distinct, SNM dedup, phrase search, bigram LM,
# streaks, grouping sets
# ---------------------------------------------------------------------------

@q(
    "events_sliding_distinct",
    """
    WITH pairs AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, user_id FROM events),
    contrib AS (
      SELECT unnest(generate_series(b, b + INTERVAL 2 HOUR, INTERVAL 1 HOUR))
               AS bucket_ts,
             user_id
      FROM pairs),
    actual AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket_ts FROM events)
    SELECT bucket_ts, count(DISTINCT user_id) AS u_trailing
    FROM contrib JOIN actual USING (bucket_ts)
    GROUP BY bucket_ts ORDER BY bucket_ts
    """,
)
def events_sliding_distinct(spark, sf_dir):
    # Rolling reach: distinct users over the trailing 3 hours, per
    # hour. Exact tier (first-appearance fan-out + plain count — no range
    # join); the fixed-state HLL tier is sliding_distinct_sketch,
    # pinned within its error bound by pytest.
    from finlogic_spark.operators.sliding import sliding_distinct_exact

    e = _t(spark, sf_dir, "events")
    return sliding_distinct_exact(e, "ts", "user_id", width=3, step="1 hour")


@q(
    "doc_sorted_neighborhood",
    """
    WITH base AS (
      SELECT doc_id, lang || '|' || substr(text, 1, 2) AS blk,
             substr(text, 1, 40) AS k, substr(text, 1, 80) AS p
      FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL),
    ord_d AS (
      SELECT doc_id, blk, k, p,
             row_number() OVER (PARTITION BY blk ORDER BY k, doc_id) AS rn
      FROM base)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.p, b.p) AS dist
    FROM ord_d a JOIN ord_d b
      ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 2
    WHERE levenshtein(a.p, b.p) <= 20
    ORDER BY id_a, id_b
    """,
)
def doc_sorted_neighborhood(spark, sf_dir):
    # Sorted-neighborhood dedup pass (ER tier 5): block by (lang,
    # 2-char key prefix), sort by a 40-char text prefix, pair each doc
    # with its next 2 neighbours, verify with edit distance on an
    # 80-char prefix. One shuffle + in-partition sort + lead() —
    # linear; the oracle's rn-difference self-join is the quadratic
    # formulation it avoids. The block key is the PARALLELISM lever
    # (standard SNM: block count >> cores; near-dups share the sort
    # key's prefix, so splitting on it loses almost nothing — pairs
    # split across a prefix boundary are the multi-pass recall case).
    # Verify uses the BANDED levenshtein (threshold arg): O(k·n)
    # instead of O(n²) per pair, -1 for over-threshold pairs —
    # measured 4x on the verify stage at 10x bench scale, exact
    # distances for every emitted row.
    from finlogic_spark.operators.text_dedup import sorted_neighborhood_pairs

    # NULL-key agreement with the oracle: Spark's Window.partitionBy
    # groups NULL block keys into one partition (emitting pairs) and
    # sorts NULL sort keys FIRST, while the oracle's a.blk = b.blk
    # equi-join never matches NULLs and ORDER BY puts NULLs last —
    # filter NULL lang/text on BOTH sides so the engines agree (the
    # block/sort keys below null-propagate from exactly these columns).
    d = _t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    pairs = sorted_neighborhood_pairs(
        d,
        "doc_id",
        sort_key=F.substring("text", 1, 40),
        # F.concat (not concat_ws) null-propagates like the oracle's ||
        block_key=F.concat(
            F.col("lang"), F.lit("|"), F.substring("text", 1, 2)
        ),
        window=2,
        payload=F.substring("text", 1, 80),
        # score= evaluates the banded levenshtein ONCE pre-explode;
        # the filter below touches only the scalar result.
        score=lambda a, b: F.levenshtein(a, b, 20),
    )
    verified = pairs.select(
        "id_a", "id_b", F.col("score").alias("dist")
    ).filter(F.col("dist") >= 0)
    # Survivors are a tiny fraction of candidates: a global orderBy
    # would re-evaluate this whole plan for the range-partitioner
    # sample job (measured ~2x the query). One round-robin exchange +
    # in-partition sort gives the same total order in one evaluation.
    return verified.repartition(1).sortWithinPartitions("id_a", "id_b")


@q(
    "doc_phrase_search",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS pos
             FROM d),
    p0 AS (SELECT doc_id, pos AS start FROM toks WHERE token = 'table'),
    p1 AS (SELECT doc_id, pos - 1 AS start FROM toks WHERE token = 'table')
    SELECT doc_id, count(*) AS n_matches
    FROM p0 JOIN p1 USING (doc_id, start)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_phrase_search(spark, sf_dir):
    # Exact phrase match SERVED from a persisted positional index
    # (build-once, cached like the BM25 postings): literal term
    # filters + static partition pruning to the terms' token-hash
    # buckets + (doc, start) equi-joins for adjacency — never a regex
    # scan of the full corpus. The bucket count is read from the
    # index's _stats sidecar, so a stale caller value can't mis-prune.
    from finlogic_spark.operators.search import phrase_search

    d = _t(spark, sf_dir, "documents")
    return phrase_search(d, ["table", "table"],
                         postings=_positional_index(spark, sf_dir))


@q(
    "doc_bigram_logprob",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS w1, generate_subscripts(l, 1) AS pos
             FROM d),
    big AS (SELECT doc_id, w1,
                   lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks),
    bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS n1 FROM toks GROUP BY 1),
    cu AS (SELECT w1 AS w2, count(*) AS nu FROM toks GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
    lp AS (SELECT w1, w2,
             CAST(floor(ln(CAST(0.75 AS DOUBLE) * n2 / n1
                           + CAST(0.25 AS DOUBLE) * nu / n) * 1000000.0)
                  AS BIGINT) AS lpq
           FROM c2 JOIN c1 USING (w1) JOIN cu USING (w2), tot),
    s AS (SELECT doc_id, count(*) AS n_bigrams, SUM(lpq) AS slpq
          FROM bg JOIN lp USING (w1, w2) GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           floor(slpq / 1000000.0 / n_bigrams * 1000000.0 + 0.5) / 1000000.0
             AS logprob_per_bigram
    FROM s ORDER BY doc_id
    """,
)
def doc_bigram_logprob(spark, sf_dir):
    # Interpolated bigram LM gate (lam=0.75), self-trained on the
    # corpus; micro-nat quantization per bigram TYPE makes the doc
    # mean exact-integer and engine/partition-order independent.
    from finlogic_spark.operators.corpus import bigram_logprob_score

    d = _t(spark, sf_dir, "documents")
    return bigram_logprob_score(d, "text", "doc_id").orderBy("doc_id")


@q(
    "events_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days),
    s AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
    SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def events_streaks(spark, sf_dir):
    # Gaps-and-islands: longest run of consecutive active DAYS per
    # user (date minus row_number is constant within a run). All
    # integer/date arithmetic — exactly hashable; windows partition by
    # user so state is one user's days.
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    s = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").alias("max_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


@q(
    "agg_grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           {_dsum_sql("o_totalprice", "total_price")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def agg_grouping_sets(spark, sf_dir):
    # Explicit GROUPING SETS (vs cube/rollup already covered): three
    # user-chosen granularities in ONE pass with grouping_id
    # disambiguating data-NULL from subtotal-NULL. Spark expands to a
    # single Expand+partial-agg — no re-scan per set.
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@q(
    "doc_canonical_select",
    f"""
    WITH RECURSIVE s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
             list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
             list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
             list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
             list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
             list_min(list_transform(sh, x -> md5('5|' || x))) AS m5
      FROM s),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1 || '|' || m2) AS bh FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m3 || '|' || m4 || '|' || m5) AS bh FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id),
    e2 AS (SELECT id_a AS es, id_b AS ed FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e2.ed, reach.r FROM reach JOIN e2 ON e2.es = reach.id),
    clus AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
    scored AS (
      SELECT c.cluster, c.doc_id, {_QUALITY_SQL} AS quality
      FROM clus c JOIN documents USING (doc_id)),
    ranked AS (
      SELECT cluster, doc_id, quality,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY cluster) AS n_members
      FROM scored)
    SELECT cluster, doc_id, quality, n_members
    FROM ranked WHERE rk = 1 ORDER BY cluster
    """,
)
def doc_canonical_select(spark, sf_dir):
    # The step AFTER dedup clustering: pick each near-dup cluster's
    # BEST representative (highest quality score, doc_id tiebreak) —
    # not the arbitrary min-id the cluster label happens to be. This
    # is the full LSH -> transitive closure -> canonical-keep pipeline
    # as one query; quality is the 6 dp-quantized score (engine-stable
    # ordering). The argmax is a partial-aggregatable max(struct) —
    # lexicographic (quality, -doc_id) — NOT a per-cluster window:
    # map-side combine makes a degenerate giant cluster (an all-dups
    # corpus) a non-event, where a window would sort it on one task.
    from finlogic_spark.functions.text import quality_score
    from finlogic_spark.operators.graph import connected_components
    from finlogic_spark.operators.text_dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=6, bands=2)
    # 'auto' picks star-first above 10M edges by measurement (see
    # doc_dedup_clusters / tools/probe_r8.py) and the label fast path
    # below it.
    cc = connected_components(
        pairs, d.select("doc_id"), src="id_a", dst="id_b", id_col="doc_id"
    ).select(F.col("id").alias("doc_id"), F.col("label").alias("cluster"))
    scored = cc.join(
        d.select("doc_id", rN(quality_score("text"), 6).alias("quality")),
        "doc_id",
    )
    return (
        scored.groupBy("cluster")
        .agg(
            F.max(
                F.struct(
                    F.col("quality"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("__best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster",
            (-F.col("__best.nid")).alias("doc_id"),
            F.col("__best.quality").alias("quality"),
            "n_members",
        )
        .orderBy("cluster")
    )


@q(
    "emb_hard_negatives",
    f"""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS query_id, label AS qlabel,
                  embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT query_id, vec_id,
             {_DOT_SQL} / ({_NORM_V} * {_NORM_Q}) AS cs
      FROM c CROSS JOIN qs
      WHERE c.label <> qs.qlabel)
    SELECT query_id, vec_id,
           floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS INTEGER)
            AS rk
          FROM scored)
    WHERE rk <= 3
    ORDER BY query_id, rk
    """,
)
def emb_hard_negatives(spark, sf_dir):
    # Contrastive-training negative mining: per anchor, the 3 most
    # similar vectors with a DIFFERENT label (the near-misses). The
    # label predicate runs before the cosine, so same-label pairs
    # never pay the dot product.
    from finlogic_spark.operators.similarity import hard_negatives

    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    corpus = e.select("vec_id", as_double.alias("embedding"), "label")
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        as_double.alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives(corpus, queries, k=3)
    return out.select(
        "query_id", "vec_id", rN(F.col("cos_sim"), 6).alias("cos_sim"), "rk"
    ).orderBy("query_id", "rk")


@q(
    "events_psi_drift",
    """
    WITH ref AS (SELECT event_type, value FROM events
                 WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
    cur AS (SELECT event_type, value FROM events
            WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
    hr AS (
      SELECT event_type,
             CAST(greatest(0, least(floor((value - 0.0) / 25.0), 9)) AS INT)
               AS bin,
             count(*) AS nr
      FROM ref WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2),
    hc AS (
      SELECT event_type,
             CAST(greatest(0, least(floor((value - 0.0) / 25.0), 9)) AS INT)
               AS bin,
             count(*) AS nc
      FROM cur WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY 1, 2),
    tr AS (SELECT event_type, SUM(nr) AS tr FROM hr GROUP BY 1),
    tc AS (SELECT event_type, SUM(nc) AS tc FROM hc GROUP BY 1),
    grid AS (
      SELECT event_type, tr, tc, unnest(range(0, 10)) AS bin
      FROM tr JOIN tc USING (event_type)),
    j AS (
      SELECT g.event_type, g.tr, g.tc, g.bin,
             COALESCE(hr.nr, 0) AS nr, COALESCE(hc.nc, 0) AS nc
      FROM grid g
      LEFT JOIN hr ON hr.event_type = g.event_type AND hr.bin = g.bin
      LEFT JOIN hc ON hc.event_type = g.event_type AND hc.bin = g.bin),
    terms AS (
      SELECT event_type, tr, tc,
             CAST(floor((((nc + 1) / (tc + 10)) - ((nr + 1) / (tr + 10)))
                        * ln(((nc + 1) / (tc + 10)) / ((nr + 1) / (tr + 10)))
                        * 1000000.0) AS BIGINT) AS t
      FROM j)
    SELECT event_type, CAST(SUM(t) AS DOUBLE) / 1000000.0 AS psi,
           CAST(MIN(tr) AS BIGINT) AS n_ref, CAST(MIN(tc) AS BIGINT) AS n_cur
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def events_psi_drift(spark, sf_dir):
    # Distribution-drift gate: PSI of the value distribution per
    # event_type, first half of January vs second half, fixed
    # [0, 250)x10 bins, Laplace-smoothed, micro-unit-quantized terms
    # (aggregation-order/engine independent).
    from finlogic_spark.operators.profile import psi_drift

    e = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = e.filter(F.col("ts") < split).select("event_type", "value")
    cur = e.filter(F.col("ts") >= split).select("event_type", "value")
    out = psi_drift(ref, cur, "event_type", "value", lo=0.0, hi=250.0,
                    n_bins=10)
    return out.select(
        "event_type", "psi",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round 8: semantic dedup (SemDeDup) over the embedding corpus
# ---------------------------------------------------------------------------

@q(
    "emb_semantic_dedup",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 8),
    cells AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY
                 {_CENT_DOT} / ({_NORM_V} * {_CENT_NORM}) DESC, cid ASC) AS rk
        FROM c CROSS JOIN cent) WHERE rk = 1),
    dups AS (
      SELECT DISTINCT a.vec_id
      FROM (SELECT vec_id, v AS va, cid FROM cells) a
      JOIN (SELECT vec_id, v AS vb, cid FROM cells) b
        ON a.cid = b.cid AND b.vec_id < a.vec_id
      WHERE {_PAIR_DOT} / ({_PAIR_NA} * {_PAIR_NB}) > 0.35)
    SELECT vec_id, cid AS cell FROM cells
    WHERE vec_id NOT IN (SELECT vec_id FROM dups)
    ORDER BY vec_id
    """,
)
def emb_semantic_dedup(spark, sf_dir):
    # SemDeDup (Abbas et al. 2023): cluster-scoped cosine dedup — the
    # pairwise compare is fenced inside an IVF cell (ONE equi-join on
    # the cell id, |cell|^2 per cell, never corpus-all-pairs), each dup
    # group survives through its min-id member. Serves from the same
    # persisted cell-assigned corpus as emb_ivf_topk (_ivf_index);
    # threshold 0.35 sits at ~p99 of this synthetic corpus's
    # within-cell cosine distribution so the drop set is non-trivial
    # (real deployments run 0.9+ on genuinely duplicated corpora).
    from finlogic_spark.operators.similarity import semantic_dedup

    cents, cells = _ivf_index(spark, sf_dir)
    kept = semantic_dedup(
        cells, cents, threshold=0.35, cell_col="__cell",
        corpus_assigned=True,
    )
    return kept.select(
        "vec_id", F.col("__cell").cast("long").alias("cell")
    ).orderBy("vec_id")


@q(
    "doc_jaccard_prefix",
    f"""
    WITH s AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS sh FROM documents),
    sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           floor(inter / (na.n + nb.n - inter) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
    FROM inter
    JOIN sz na ON na.doc_id = id_a
    JOIN sz nb ON nb.doc_id = id_b
    WHERE inter / (na.n + nb.n - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def doc_jaccard_prefix(spark, sf_dir):
    # PPJoin prefix-filtered exact Jaccard: same results as
    # doc_ngram_jaccard (the oracle IS the plain all-shared-shingle
    # formulation), but candidates come only from each doc's
    # rarest-first prefix — the lossless candidate-reduction that keeps
    # set-similarity joins off the stop-shingle quadratic at corpus
    # scale (a df CAP also avoids it, but by silently undercounting
    # intersections; the prefix filter provably drops nothing).
    from finlogic_spark.operators.text_dedup import jaccard_prefix_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_prefix_pairs(d, "text", "doc_id", k=3, threshold=0.5)
    return pairs.select(
        "id_a", "id_b", rN(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@q(
    "doc_containment_pairs",
    f"""
    WITH s AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS sh
      FROM documents),
    sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    d AS (
      SELECT ia AS id_a, ib AS id_b, inter / na.n AS c
      FROM inter JOIN sz na ON na.doc_id = ia
      UNION ALL
      SELECT ib AS id_a, ia AS id_b, inter / nb.n AS c
      FROM inter JOIN sz nb ON nb.doc_id = ib)
    SELECT id_a, id_b,
           floor(c * 1000000.0 + 0.5) / 1000000.0 AS containment
    FROM d WHERE c >= 0.8 ORDER BY id_a, id_b
    """,
)
def doc_containment_pairs(spark, sf_dir):
    # Directed shingle containment |Sa∩Sb|/|Sa| >= 0.8: the asymmetric
    # near-dup signal (quotes / boilerplate / supersets) that Jaccard
    # dilutes toward zero as the host document grows. The id_a side of
    # each directed edge is the contained -> removal candidate.
    from finlogic_spark.operators.text_dedup import containment_pairs

    d = _t(spark, sf_dir, "documents")
    # max_doc_freq=None for oracle parity: the SQL oracle has no
    # doc-frequency cap, so a capped run silently undercounts
    # intersections the moment any shingle's df exceeds the cap
    # (same reasoning as doc_ngram_jaccard). Corpus-scale users who
    # need the stop-shingle cap should prefer the lossless
    # containment_prefix_pairs (doc_containment_prefix) instead.
    pairs = containment_pairs(
        d, "text", "doc_id", k=3, threshold=0.8, max_doc_freq=None
    )
    return pairs.select(
        "id_a", "id_b", rN(F.col("containment"), 6).alias("containment")
    ).orderBy("id_a", "id_b")


@q(
    "events_trend_slope",
    """
    WITH base AS (
      SELECT user_id, event_type,
             date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS x,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS yq
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
    s AS (
      SELECT user_id, event_type, count(*) AS n,
             SUM(x) AS sx, SUM(yq) AS sy, SUM(x * yq) AS sxy,
             SUM(x * x) AS sxx, SUM(yq * yq) AS syy
      FROM base GROUP BY 1, 2),
    d AS (
      SELECT user_id, event_type, n,
             (n * sxx - sx * sx) AS varx_e, (n * syy - sy * sy) AS vary_e,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) / 100.0 AS syd,
             CAST(sxy AS DOUBLE) / 100.0 AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd,
             CAST(syy AS DOUBLE) / 10000.0 AS syyd
      FROM s WHERE n >= 2 AND (n * sxx - sx * sx) > 0)
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
           floor(((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
                 * 1e12 + 0.5) / 1e12 AS slope,
           floor(((syd - ((nd * sxyd - sxd * syd)
                          / (nd * sxxd - sxd * sxd)) * sxd) / nd)
                 * 1000000.0 + 0.5) / 1000000.0 AS intercept,
           CASE WHEN vary_e > 0 THEN
             floor((((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
                    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)))
                   * 1000000.0 + 0.5) / 1000000.0
           END AS r2
    FROM d ORDER BY user_id, event_type
    """,
)
def events_trend_slope(spark, sf_dir):
    # Per-(user, event_type) OLS drift monitor: one fully
    # map-side-combinable aggregate computes the five sufficient
    # statistics as EXACT integer/decimal sums (y quantized to cents, x
    # integer seconds from a fixed epoch), so the shuffle carries six
    # numbers per key and the result is aggregation-order independent —
    # the per-key regression you can afford over billions of keys.
    from finlogic_spark.operators.profile import trend_slope

    e = _t(spark, sf_dir, "events")
    # unix_timestamp handles both TIMESTAMP and TIMESTAMP_NTZ ts
    # columns (a plain cast-to-long is illegal on NTZ); any session-tz
    # offset cancels in the subtraction.
    x = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    out = trend_slope(e, ["user_id", "event_type"], x, F.col("value"))
    return out.select(
        "user_id",
        "event_type",
        "n",
        rN(F.col("slope"), 12).alias("slope"),
        rN(F.col("intercept"), 6).alias("intercept"),
        F.when(
            F.col("r2").isNotNull(), rN(F.col("r2"), 6)
        ).alias("r2"),
    ).orderBy("user_id", "event_type")


@q(
    "events_ewma",
    """
    WITH p AS (
      SELECT user_id, event_id, ts, value,
             lag(value, 1) OVER w AS l1,
             lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
            AND NOT isnan(value)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           floor(((0.0 + value * 0.5
                   + CASE WHEN l1 IS NOT NULL THEN l1 * 0.25 ELSE 0.0 END
                   + CASE WHEN l2 IS NOT NULL THEN l2 * 0.125 ELSE 0.0 END
                   + CASE WHEN l3 IS NOT NULL THEN l3 * 0.0625 ELSE 0.0 END)
                  / (0.0 + 0.5
                     + CASE WHEN l1 IS NOT NULL THEN 0.25 ELSE 0.0 END
                     + CASE WHEN l2 IS NOT NULL THEN 0.125 ELSE 0.0 END
                     + CASE WHEN l3 IS NOT NULL THEN 0.0625 ELSE 0.0 END))
                 * 1000000.0 + 0.5) / 1000000.0 AS ewma
    FROM p ORDER BY user_id, event_id
    """,
)
def events_ewma(spark, sf_dir):
    # Finite-horizon EWMA (alpha=0.5, 4 taps) of purchase values per
    # user: horizon truncation turns the classically-sequential EWMA
    # into `horizon` lag() columns over ONE shared window spec — one
    # shuffle on the group key, weights renormalized over the lags that
    # exist so early rows don't bias toward zero.
    from finlogic_spark.operators.windows import ewma

    e = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & ~F.isnan("value")
    )
    out = e.withColumn(
        "ewma",
        ewma("value", ["user_id"], ["ts", "event_id"], alpha=0.5, horizon=4),
    )
    return out.select(
        "user_id", "event_id", rN(F.col("ewma"), 6).alias("ewma")
    ).orderBy("user_id", "event_id")


@q(
    "orders_pareto_frontier",
    """
    WITH g AS (
      SELECT o_orderdate AS x, max(o_totalprice) AS y
      FROM orders GROUP BY 1)
    SELECT x AS o_orderdate, y AS best_price
    FROM g p
    WHERE NOT EXISTS (SELECT 1 FROM g q WHERE q.x > p.x AND q.y >= p.y)
    ORDER BY o_orderdate
    """,
)
def orders_pareto_frontier(spark, sf_dir):
    # 2-D skyline: order dates whose best price beats every later
    # date's best — dominance within a date is a partial-aggregatable
    # max (the only data-sized shuffle); cross-date dominance is one
    # running max over the compacted |dates| rows.
    from finlogic_spark.operators.topk import pareto_frontier_2d

    o = _t(spark, sf_dir, "orders")
    return (
        pareto_frontier_2d(o, "o_orderdate", "o_totalprice")
        .select(
            "o_orderdate", F.col("o_totalprice").alias("best_price")
        )
        .orderBy("o_orderdate")
    )


@q(
    "doc_source_divergence",
    f"""
    WITH gt AS (
      SELECT source AS g, unnest({_TOKS_SQL}) AS t FROM documents),
    gc AS (SELECT g, t, count(*) AS c FROM gt GROUP BY 1, 2),
    corpus AS (SELECT t, SUM(c) AS ct FROM gc GROUP BY 1),
    totals AS (SELECT g, SUM(c) AS tg FROM gc GROUP BY 1),
    tot AS (SELECT SUM(ct) AS tt FROM corpus),
    j AS (
      SELECT gc.g, gc.c, tg, tt, ct
      FROM gc JOIN corpus USING (t) JOIN totals USING (g) CROSS JOIN tot),
    terms AS (
      SELECT g, tg, tt, ct,
        CAST(floor((
               (CAST(c AS DOUBLE) / CAST(tg AS DOUBLE))
               * ln((CAST(c AS DOUBLE) / CAST(tg AS DOUBLE))
                    / (((CAST(c AS DOUBLE) / CAST(tg AS DOUBLE))
                        + (CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)))
                       / 2.0)) / 2.0
             + (CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
               * ln((CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
                    / (((CAST(c AS DOUBLE) / CAST(tg AS DOUBLE))
                        + (CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)))
                       / 2.0)) / 2.0) * 1000000.0) AS BIGINT) AS term
      FROM j),
    per_g AS (
      SELECT g, SUM(term) AS sp, SUM(ct) AS sg,
             MIN(tg) AS tg, MIN(tt) AS tt
      FROM terms GROUP BY g)
    SELECT g AS source,
           CAST(sp + CAST(floor(ln(2.0) / 2.0
                 * (CAST(tt - sg AS DOUBLE) / CAST(tt AS DOUBLE))
                 * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS js_nats,
           CAST(tg AS BIGINT) AS n_tokens
    FROM per_g ORDER BY source
    """,
)
def doc_source_divergence(spark, sf_dir):
    # Jensen-Shannon divergence of each source's token distribution vs
    # the whole corpus — "which shard reads differently". One
    # corpus-sized count shuffle; absent-token mass in closed form
    # (0.5*ln2*(1 - sum Q over the source's own vocab), exact integer
    # sums) so nothing |sources|x|vocab| is ever materialized;
    # micro-nat quantized terms keep the sum engine/order independent.
    from finlogic_spark.functions.text import tokens
    from finlogic_spark.operators.profile import js_divergence

    d = _t(spark, sf_dir, "documents")
    out = js_divergence(d, "source", tokens("text"))
    return out.orderBy("source")


@q(
    "doc_dup_spans",
    f"""
    WITH sp AS (
      SELECT doc_id, unnest(list_distinct(list_filter(list_transform(
        range(1, greatest(length(text) - 39, 1) + 1, 1),
        i -> md5(substr(text, i, 40))),
        h -> right(h, 1) = '0'))) AS h
      FROM documents),
    per AS (SELECT doc_id, count(*) AS n FROM sp GROUP BY 1),
    sd AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
    dup AS (SELECT doc_id, count(*) AS ndup
            FROM sp JOIN sd USING (h) GROUP BY 1)
    SELECT p.doc_id, CAST(n AS BIGINT) AS n_spans,
           CAST(COALESCE(ndup, 0) AS BIGINT) AS n_dup_spans,
           floor(COALESCE(ndup, 0) / n * 1000000.0 + 0.5) / 1000000.0
             AS dup_ratio
    FROM per p LEFT JOIN dup USING (doc_id) ORDER BY p.doc_id
    """,
)
def doc_dup_spans(spark, sf_dir):
    # Cross-document exact substring duplication: content-keyed
    # (mod-p) sampled 40-char spans — selection rides on the span's own
    # md5, so duplicated regions keep identical spans in every copy
    # regardless of alignment (a fixed stride silently misses copies at
    # different residues). Linear in kept-span count — no pair
    # expansion, so a license block in a million docs costs a million
    # rows, not 10^12 pairs.
    from finlogic_spark.operators.text_dedup import dup_spans

    d = _t(spark, sf_dir, "documents")
    out = dup_spans(d, "text", "doc_id", span_len=40, sel_nibbles=1)
    return out.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        "dup_ratio",
    ).orderBy("doc_id")


@q(
    "doc_substring_excise",
    """
    WITH sp AS (
      SELECT doc_id, u.s AS s, u.h AS h
      FROM (SELECT doc_id, unnest(list_filter(list_transform(
              range(1, greatest(length(text) - 39, 1) + 1, 1),
              i -> {'s': i, 'h': md5(substr(text, i, 40))}),
              x -> right(x.h, 1) = '0')) AS u
            FROM documents)),
    sd AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp)
           GROUP BY h HAVING count(*) >= 2),
    so AS (SELECT doc_id, s FROM sp JOIN sd USING (h)),
    brk AS (SELECT doc_id, s,
             CASE WHEN s <= MAX(s + 40) OVER (PARTITION BY doc_id
                    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS b
            FROM so),
    grp AS (SELECT doc_id, s, SUM(b) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM brk),
    iv AS (SELECT doc_id, min(s) AS s, max(s) + 40 AS e
           FROM grp GROUP BY doc_id, g),
    stats AS (SELECT doc_id, count(*) AS n_intervals,
                     sum(e - s) AS excised_chars FROM iv GROUP BY 1),
    pre AS (SELECT doc_id,
             COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s),
                      CAST(1 AS BIGINT)) AS ks,
             s AS ke FROM iv),
    tl AS (SELECT doc_id, max(e) AS ks, CAST(NULL AS BIGINT) AS ke
           FROM iv GROUP BY 1),
    segs AS (SELECT * FROM pre UNION ALL SELECT * FROM tl),
    reb AS (SELECT s.doc_id,
             string_agg(substr(d.text, CAST(s.ks AS BIGINT),
                        greatest(COALESCE(s.ke, length(d.text) + 1) - s.ks,
                                 0)),
                        '' ORDER BY s.ks) AS new_text
            FROM segs s JOIN documents d USING (doc_id) GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(st.n_intervals, 0) AS BIGINT) AS n_intervals,
           CAST(COALESCE(st.excised_chars, 0) AS BIGINT) AS excised_chars,
           CASE WHEN st.doc_id IS NOT NULL THEN r.new_text
                ELSE d.text END AS new_text
    FROM documents d LEFT JOIN stats st USING (doc_id)
    LEFT JOIN reb r USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def doc_substring_excise(spark, sf_dir):
    # Repeated-substring EXCISION (r14 verdict item 7) — detection
    # existed (doc_dup_spans); this is the removal: coalesce each doc's
    # cross-document sampled spans into maximal intervals, cut them
    # out, rebuild the text (the Lee-et-al/C4 boilerplate treatment at
    # document granularity — the doc survives, the shared block does
    # not). Exact integer span arithmetic end to end, so the rebuilt
    # strings are bit-identical across engines (full value hash, no
    # band). The oracle rebuilds via per-segment string_agg; the
    # engine folds a sorted interval array with one expression-only
    # aggregate() — different mechanism, same bytes.
    from finlogic_spark.operators.text_dedup import substring_excise

    d = _t(spark, sf_dir, "documents")
    return substring_excise(
        d, "text", "doc_id", span_len=40, sel_nibbles=1
    ).orderBy("doc_id")


@q("stream_trend_slope", None)
def stream_trend_slope(spark, sf_dir):
    # Streaming twin of events_trend_slope (oracle attached below,
    # AFTER registration — it's the identical batch SQL): the six OLS
    # sufficient statistics are associative integer sums, so the
    # streaming stateful aggregation (6 numbers of state per key) is
    # bit-identical to the batch aggregate whatever the micro-batch
    # boundaries; ols_finish is a stateless projection applied to the
    # drained sink, where a live dashboard would re-derive slopes.
    from finlogic_spark.operators.profile import ols_finish
    from finlogic_spark.streaming import (
        drain_stream_to_df,
        read_events_stream,
        trend_stats_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    # complete-mode drain keeps only the final batch's directory (each
    # batch re-emits the whole aggregate); executor-side writes, no
    # driver-sized memory-sink table
    stats = drain_stream_to_df(
        trend_stats_stream(stream), output_mode="complete"
    )
    out = ols_finish(stats, ["user_id", "event_type"])
    return out.select(
        "user_id",
        "event_type",
        "n",
        rN(F.col("slope"), 12).alias("slope"),
        rN(F.col("intercept"), 6).alias("intercept"),
        F.when(F.col("r2").isNotNull(), rN(F.col("r2"), 6)).alias("r2"),
    ).orderBy("user_id", "event_type")


ORACLES["stream_trend_slope"] = ORACLES["events_trend_slope"]


@q("doc_containment_prefix", None)
def doc_containment_prefix(spark, sf_dir):
    # Prefix-filtered directed containment (oracle = the SAME SQL as
    # doc_containment_pairs, attached below): candidates pair A-side
    # rarest-first prefixes against the full shingle stream, so the
    # stop-shingle pair fan that exhausts shuffle disk at sf10 in the
    # packed-pairs formulation never materializes — the lossless scale
    # path for asymmetric dedup.
    from finlogic_spark.operators.text_dedup import containment_prefix_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = containment_prefix_pairs(d, "text", "doc_id", k=3, threshold=0.8)
    return pairs.select(
        "id_a", "id_b", rN(F.col("containment"), 6).alias("containment")
    ).orderBy("id_a", "id_b")


ORACLES["doc_containment_prefix"] = ORACLES["doc_containment_pairs"]


@q(
    "events_twap",
    """
    WITH base AS (
      SELECT event_type, date_trunc('day', ts) AS bucket_start, ts,
             event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
    d AS (
      SELECT event_type, bucket_start, vq,
             date_diff('second', ts,
               coalesce(lead(ts) OVER (PARTITION BY event_type, bucket_start
                                       ORDER BY ts, event_id),
                        bucket_start + INTERVAL 1 DAY)) AS dur
      FROM base)
    SELECT event_type, bucket_start, count(*) AS n,
           floor(CAST(SUM(vq * dur) AS DOUBLE) / (100.0 * SUM(dur))
                 * 1000000.0 + 0.5) / 1000000.0 AS twap
    FROM d GROUP BY 1, 2 ORDER BY event_type, bucket_start
    """,
)
def events_twap(spark, sf_dir):
    # Step-function TWAP per (event_type, day): each sample's value
    # holds until the next sample (the last to day end); integral over
    # covered duration. One lead() window + one partial-agg groupBy —
    # the shuffle carries group keys only; the integral is exact
    # integer cents x seconds, so aggregation order can't move it.
    # When tooling has registered a write_fact_layout table for this
    # sf_dir (TWAP_LAYOUTS), the window and groupBy ride the stored
    # bucket+sort instead — the ENTIRE plan's data-sized exchanges and
    # sorts disappear (sf100: 0.25x vs DuckDB, flat 1.99x; plan pinned
    # in tests/test_storage.py::test_fact_layout_twap_rides_api).
    from finlogic_spark.operators.windows import time_weighted_avg

    table = TWAP_LAYOUTS.get(sf_dir)
    if table and spark.catalog.tableExists(table):
        from finlogic_spark.sources import read_fact_layout

        out = time_weighted_avg(
            read_fact_layout(spark, table),
            ["event_type"],
            "ts",
            "value",
            tiebreak_cols=["event_id"],
            bucket_col="bkt_day",
        )
    else:
        e = _t(spark, sf_dir, "events")
        out = time_weighted_avg(
            e, ["event_type"], "ts", "value", tiebreak_cols=["event_id"]
        )
    return out.select(
        "event_type",
        "bucket_start",
        "n",
        rN(F.col("twap"), 6).alias("twap"),
    ).orderBy("event_type", "bucket_start")


@q(
    "events_winsorize",
    """
    WITH base AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)),
    b AS (
      SELECT event_type,
             floor(quantile_cont(value, 0.01) * 1000000.0 + 0.5)
               / 1000000.0 AS p_lo_val,
             floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5)
               / 1000000.0 AS p_hi_val
      FROM base GROUP BY 1)
    SELECT e.event_type, p_lo_val, p_hi_val, count(*) AS n,
           CAST(SUM(CASE WHEN value < p_lo_val THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN value > p_hi_val THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clipped_hi,
           floor(CAST(SUM(CAST(floor(
                   least(greatest(value, p_lo_val), p_hi_val) * 100.0
                   + 0.5) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)) * 1000000.0 + 0.5) / 1000000.0
             AS win_mean
    FROM base e JOIN b USING (event_type)
    GROUP BY 1, 2, 3 ORDER BY event_type
    """,
)
def events_winsorize(spark, sf_dir):
    # Outlier-robust per-group location: p01/p99 clip bounds, clip
    # counts, winsorized mean. Compact-histogram tier (default): ONE
    # scan builds the per-group value-frequency histogram, exact
    # interpolated percentiles come from cumulative counts over it,
    # and the clipped stats are count-weighted sums over the same
    # histogram — bit-identical to the exact percentile() tier
    # (parity-pinned) at a fraction of its cost (sf100: 2.5 s vs
    # 9.9 s exact vs 2.7 s DuckDB). Bounds rounded to 1e-6 before
    # clipping so the clip decision is data, not interpolation luck;
    # mean via exact integer cents under an enforced |cents| < 2^31.
    from finlogic_spark.operators.profile import winsorize_stats

    e = _t(spark, sf_dir, "events")
    out = winsorize_stats(e, ["event_type"], "value")
    return out.select(
        "event_type",
        "p_lo_val",
        "p_hi_val",
        "n",
        "n_clipped_lo",
        "n_clipped_hi",
        rN(F.col("win_mean"), 6).alias("win_mean"),
    ).orderBy("event_type")


@q(
    "events_kll_quantiles",
    """
    -- Property-style oracle (same pattern as approx_quantiles /
    -- approx_distinct): KLL sketch ESTIMATES are partitioning-specific,
    -- but the sketch carries a rank-error guarantee — the estimate's
    -- exact rank must land within eps*n of the requested rank. The ok
    -- flags assert exactly that band on the Spark side; the exact
    -- percentiles and group counts compare directly.
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 100.0 + 0.5) / 100.0
             AS exact_median,
           floor(quantile_cont(value, 0.99) * 100.0 + 0.5) / 100.0
             AS exact_p99,
           count(*) AS n,
           TRUE AS p50_ok,
           TRUE AS p99_ok
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY 1 ORDER BY event_type
    """,
)
def events_kll_quantiles(spark, sf_dir):
    # Mergeable per-group KLL quantile sketch as a distributed
    # aggregate (operators/sketch.py), validated against exact rank
    # bands. ONE data-sized pass: the value-frequency histogram
    # (map-side-combining groupBy — sf100's 100M rows compact to
    # ~280k) feeds (a) the sketch via binary-weight insertion, (b) the
    # exact interpolated percentiles (histogram_percentiles — the
    # winsorize-pinned arithmetic, bit-identical to percentile()),
    # (c) the band counts. The band is checked EXACTLY: the estimate
    # is an item of the group, so its possible ranks are
    # [count(<est), count(<=est)]; the flag asserts that interval
    # intersects [p-eps, p+eps]*n with eps=0.02 (k=200;
    # randomized-KLL 99%-confidence bound is 2.3/k ~ 0.0115, widened
    # for the deterministic-parity variant).
    from pyspark.storagelevel import StorageLevel

    from finlogic_spark.operators.profile import histogram_percentiles
    from finlogic_spark.operators.sketch import kll_group_quantiles

    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    base = e.filter(v.isNotNull() & ~F.isnan(v)).select("event_type", "value")
    hist = (
        base.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("__c"))
        # sketch, percentile, and band branches share this frame
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    est = kll_group_quantiles(
        hist, ["event_type"], "value", [0.5, 0.99], weight_col="__c"
    )
    est_w = est.groupBy("event_type").agg(
        F.max(F.when(F.col("prob") == 0.5, F.col("value"))).alias("kll_p50"),
        F.max(F.when(F.col("prob") == 0.99, F.col("value"))).alias("kll_p99"),
    )
    return _kll_band_report(est_w, hist)


def _kll_band_report(est_w, hist, eps: float = 0.02):
    """Validation half of the KLL registry queries: given per-group
    estimates (event_type, kll_p50, kll_p99) and the value-frequency
    histogram, report exact interpolated percentiles, group counts,
    and the exact rank-band flags. Shared by the batch query and the
    streaming twin so both pin the identical contract."""
    from finlogic_spark.operators.profile import histogram_percentiles

    v = F.col("value")
    pct = histogram_percentiles(
        hist, ["event_type"], "value", "__c",
        {"exact_median": 0.5, "exact_p99": 0.99},
    )
    band = (
        hist.join(F.broadcast(est_w), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("__c").alias("n"),
            F.sum(F.when(v < F.col("kll_p50"), F.col("__c")).otherwise(0)).alias("__lt50"),
            F.sum(F.when(v <= F.col("kll_p50"), F.col("__c")).otherwise(0)).alias("__le50"),
            F.sum(F.when(v < F.col("kll_p99"), F.col("__c")).otherwise(0)).alias("__lt99"),
            F.sum(F.when(v <= F.col("kll_p99"), F.col("__c")).otherwise(0)).alias("__le99"),
        )
    )

    def band_ok(p: float, lt: str, le: str):
        n = F.col("n")
        return (F.col(lt) <= (p + eps) * n) & (F.col(le) >= (p - eps) * n)

    return (
        pct.join(band, "event_type")
        .select(
            "event_type",
            rN(F.col("exact_median"), 2).alias("exact_median"),
            rN(F.col("exact_p99"), 2).alias("exact_p99"),
            "n",
            band_ok(0.5, "__lt50", "__le50").alias("p50_ok"),
            band_ok(0.99, "__lt99", "__le99").alias("p99_ok"),
        )
        .orderBy("event_type")
    )


@q("stream_kll_quantiles", None)
def stream_kll_quantiles(spark, sf_dir):
    # Streaming twin of events_kll_quantiles: the KLL sketch as keyed
    # streaming state (a few KB per key at ANY stream length — exact
    # streaming percentiles would hold every value ever seen). Each
    # micro-batch folds into the key's sketch and re-emits estimates;
    # keep_last over the monotone n takes the final ones, validated
    # against the same exact rank bands as the batch query (the band
    # holds for any insertion order, so the result is micro-batch-
    # boundary independent). Oracle attached below (same SQL as the
    # batch twin).
    from pyspark.storagelevel import StorageLevel

    from finlogic_spark.streaming import drain_stream_to_df, read_events_stream
    from finlogic_spark.streaming.stateful import kll_quantiles_stream

    stream = read_events_stream(spark, sf_dir)
    drained = drain_stream_to_df(
        kll_quantiles_stream(stream), output_mode="update"
    )
    est_w = keep_last(drained, ["event_type"], ["n"]).select(
        "event_type", "kll_p50", "kll_p99"
    )
    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    base = e.filter(v.isNotNull() & ~F.isnan(v)).select("event_type", "value")
    hist = (
        base.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    return _kll_band_report(est_w, hist)


ORACLES["stream_kll_quantiles"] = ORACLES["events_kll_quantiles"]


@q(
    "doc_dsir_select",
    f"""
    -- DSIR (Xie et al., NeurIPS'23) deterministic MAP mode: top-k raw
    -- docs by add-alpha-smoothed unigram likelihood ratio against the
    -- lang='en' exemplar corpus. Per-token log-ratios floored to
    -- integer micro-nats once, so each doc's weight is an exact
    -- integer sum on both engines and the top-100 cut is stable.
    WITH tok AS (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS token
                 FROM documents),
    craw AS (SELECT token, count(*) AS n_raw FROM tok GROUP BY 1),
    ctgt AS (SELECT token, count(*) AS n_tgt FROM tok
             WHERE lang = 'en' GROUP BY 1),
    vocab AS (SELECT token, n_raw, coalesce(n_tgt, 0) AS n_tgt
              FROM craw LEFT JOIN ctgt USING (token)),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS v,
                   CAST(sum(n_raw) AS DOUBLE) AS traw,
                   CAST(sum(n_tgt) AS DOUBLE) AS ttgt
            FROM vocab),
    lw AS (SELECT token,
             CAST(floor(ln((n_tgt + 0.5) / (ttgt + 0.5 * v))
                        * 1000000.0) AS BIGINT)
           - CAST(floor(ln((n_raw + 0.5) / (traw + 0.5 * v))
                        * 1000000.0) AS BIGINT) AS lwq
           FROM vocab, tot),
    s AS (SELECT doc_id, count(*) AS n_tokens, SUM(lwq) AS slwq
          FROM tok JOIN lw USING (token) GROUP BY 1)
    SELECT doc_id, n_tokens,
           floor((CAST(slwq AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5)
             / 1000000.0 AS log_weight
    FROM s ORDER BY slwq DESC, doc_id LIMIT 100
    """,
)
def doc_dsir_select(spark, sf_dir):
    # DSIR data selection (operators/dsir.py): importance-weight every
    # raw doc by the smoothed unigram likelihood ratio of the lang='en'
    # exemplar corpus vs the full corpus, take the top 100. Vocab-sized
    # intermediates only (two token groupBys + one broadcastable ratio
    # join); selection plans as TakeOrderedAndProject. Deterministic
    # MAP mode (gumbel_seed=None) so DuckDB reproduces the exact set;
    # the Gumbel-top-k sampling mode is pytest-pinned instead.
    from finlogic_spark.operators.dsir import dsir_select

    d = _t(spark, sf_dir, "documents")
    out = dsir_select(
        d, d.filter(F.col("lang") == "en"), k=100,
        text_col="text", id_col="doc_id",
    )
    return out.select(
        "doc_id",
        "n_tokens",
        rN(F.col("log_weight"), 6).alias("log_weight"),
    ).orderBy("doc_id")


def _lsh_append_index(spark, sf_dir):
    """Persisted LSH index built over HALF the corpus then extended to
    the full corpus via ``append_to_lsh_index`` — build-once lifecycle
    like _lsh_index, but exercising the hourly-ingest maintenance path
    (parameters ride the _stats sidecar; appended files land in the
    same __tbl partitions; nothing existing is re-read or rewritten)."""
    key = ("lsh_append", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.similarity import (
            append_to_lsh_index,
            build_lsh_index_table,
        )

        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"lshappend{safe}", "idx")
        corpus = _emb_corpus(spark, sf_dir)
        build_lsh_index_table(
            corpus.filter(F.col("vec_id") % 2 == 0),
            path,
            dim=64,
            num_planes=_LSH_PLANES,
            num_tables=_LSH_TABLES,
        )
        idx = append_to_lsh_index(
            corpus.filter(F.col("vec_id") % 2 == 1), path
        )
        df = idx.df.persist()
        df.count()
        _ANN_INDEX[key] = df
    return _ANN_INDEX[key]


@q("emb_lsh_append_topk", None)  # oracle attached below (rebuild twin's)
def emb_lsh_append_topk(spark, sf_dir):
    # Same serve as emb_lsh_topk, but against an index built over half
    # the corpus and INCREMENTALLY EXTENDED to the rest with
    # append_to_lsh_index (operators/similarity.py): a sign-pattern
    # bucket is a pure per-vector function of the sidecar's stored
    # plane parameters, so append == rebuild row-for-row
    # (tests/test_ann_append.py) and this query shares the rebuild
    # twin's oracle VERBATIM — the gate itself certifies the appended
    # index serves identical top-k.
    corpus = _lsh_append_index(spark, sf_dir)
    queries = _emb_corpus(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = lsh_cosine_topk(
        corpus,
        queries,
        k=5,
        dim=64,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
        probe_radius=_LSH_RADIUS,
        corpus_bucketed=True,
        local_query_probes=True,
    )
    return out.select(
        "query_id", "vec_id", rN(F.col("cos_sim"), 6).alias("cos_sim"), "rk"
    ).orderBy("query_id", "rk")


ORACLES["emb_lsh_append_topk"] = ORACLES["emb_lsh_topk"]


@q("events_kll_rollup", None)  # oracle attached below (batch twin's SQL)
def events_kll_rollup(spark, sf_dir):
    # The KLL rollup pipeline end-to-end (operators/sketch.py
    # kll_sketch_table -> kll_table_quantiles): ONE pass over the raw
    # events builds a per-(day, event_type) sketch table — the
    # persistable daily artifact, one O(k log n/k) row per group — and
    # the 30-day window's percentiles then come from merging the ~30
    # sketch rows per event_type, KBs of input, ZERO raw rows
    # re-scanned. This is the 100 TB percentile shape: store a sketch
    # table per day partition; any window is a merge of stored rows.
    # Validation: the merged estimates must land in the same exact
    # rank bands as the batch/streaming twins (the KLL merge preserves
    # the sketch's rank-error bound — that's what mergeability means),
    # so the oracle is identical.
    from pyspark.storagelevel import StorageLevel

    from finlogic_spark.operators.sketch import (
        kll_sketch_table,
        kll_table_quantiles,
    )

    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    base = e.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    # ONE scan of the raw events: the per-(day, type) value-frequency
    # histogram feeds BOTH the sketch build (weighted insert — same
    # arithmetic as pre_compact) and, re-aggregated over days, the
    # band-report's exact histogram. The previous formulation scanned
    # and shuffled the 100M raw rows twice (pre_compact inside
    # kll_sketch_table + a separate band hist): 7.0 s vs 3.8 s at
    # sf100, 3.16x -> 1.7x vs the exact-percentile baseline
    # (BENCH_r12_probes.json sf100:events_kll_rollup).
    h_day = (
        base.groupBy("day", "event_type", "value")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    daily = kll_sketch_table(
        h_day, ["day", "event_type"], "value", weight_col="__c"
    )
    est = kll_table_quantiles(
        daily.drop("day"), ["event_type"], [0.5, 0.99]
    )
    est_w = est.groupBy("event_type").agg(
        F.max(F.when(F.col("prob") == 0.5, F.col("value"))).alias("kll_p50"),
        F.max(F.when(F.col("prob") == 0.99, F.col("value"))).alias("kll_p99"),
    )
    hist = (
        h_day.groupBy("event_type", "value")
        .agg(F.sum("__c").alias("__c"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    return _kll_band_report(est_w, hist)


ORACLES["events_kll_rollup"] = ORACLES["events_kll_quantiles"]


def _minhash_append_index(spark, sf_dir):
    """Persisted MinHash-LSH bucket index built over HALF the corpus
    then extended to the full corpus via ``append_to_minhash_index``
    (text twin of ``_lsh_append_index``): parameters ride the _stats
    sidecar, appended files land in the same band partitions, nothing
    existing is re-read or rewritten."""
    key = ("minhash_append", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.text_dedup import (
            append_to_minhash_index,
            build_minhash_index_table,
        )

        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"mhappend{safe}", "idx")
        d = _t(spark, sf_dir, "documents")
        build_minhash_index_table(
            d.filter(F.col("doc_id") % 2 == 0),
            path,
            k=3,
            num_hashes=6,
            bands=2,
        )
        idx = append_to_minhash_index(
            d.filter(F.col("doc_id") % 2 == 1), path
        )
        df = idx.df.persist()
        df.count()
        _ANN_INDEX[key] = df
    return _ANN_INDEX[key]


@q("doc_lsh_append_pairs", None)  # oracle attached below (rebuild twin's)
def doc_lsh_append_pairs(spark, sf_dir):
    # Same candidate pairs as doc_lsh_pairs, but generated from a
    # PERSISTED bucket index built over half the corpus and
    # INCREMENTALLY EXTENDED with the other half
    # (operators/text_dedup.py append_to_minhash_index): a doc's
    # (band, band_hash) rows are a pure per-doc function of the
    # sidecar's parameters, so append == rebuild row-for-row
    # (tests/test_minhash_index.py) and this query shares the direct
    # twin's oracle VERBATIM — the gate certifies that near-dup
    # fingerprints maintained incrementally (the hourly-ingest path at
    # 100 TB) yield identical candidates to recomputing from raw text.
    from finlogic_spark.operators.text_dedup import bucket_pairs

    buckets = _minhash_append_index(spark, sf_dir)
    return bucket_pairs(buckets, "doc_id").orderBy("id_a", "id_b")


ORACLES["doc_lsh_append_pairs"] = ORACLES["doc_lsh_pairs"]


# ---------------------------------------------------------------------------
# Distinct-count sketches: persisted HLL tables + streaming state
# ---------------------------------------------------------------------------

_HLL_BAND_SQL = """
    -- Property-style oracle (same pattern as approx_distinct /
    -- events_kll_rollup): the HLL estimate is sketch-specific by
    -- design, but the sketch's documented error bound is checkable —
    -- est_ok asserts |approx - exact| / exact <= 6% on the Spark side
    -- (>= 3.7 sigma at lgk=12's RSE of 1.63%; gate-scale groups sit in
    -- the linear-counting regime and land near-exact). The estimate is
    -- deterministic for fixed input, so the flag is stable; a sketch
    -- regression flips it and fails the value hash. Exact counts
    -- compare directly."""


@q(
    "events_hll_rollup",
    f"""
    {_HLL_BAND_SQL}
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1 ORDER BY event_type
    """,
)
def events_hll_rollup(spark, sf_dir):
    # The distinct-count rollup pipeline end-to-end
    # (operators/distinct_sketch.py): ONE pass over the raw events
    # builds a per-(day, event_type) Datasketches-HLL table — the
    # persistable daily artifact, one 2^lgk-byte binary per group,
    # WRITTEN TO PARQUET AND READ BACK here so the gate certifies the
    # full store→merge round trip — and the 30-day distinct-user count
    # then comes from unioning the ~30 stored sketch rows per
    # event_type: KBs of input, ZERO raw rows re-scanned. This is the
    # 100 TB distinct-count shape ("distinct users this month", asked
    # daily); the sibling of events_kll_rollup for percentiles.
    # Register union is lossless w.r.t. the sketch's error bound, so
    # the rolled-up estimate carries the same guarantee as a direct
    # single-pass build. Validation: est_ok checks the band against
    # the exact count (exact branch exists only to validate).
    from finlogic_spark.operators.distinct_sketch import (
        hll_sketch_table,
        hll_table_estimate,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    base = e.select(F.to_date("ts").alias("day"), "event_type", "user_id")
    daily = hll_sketch_table(base, ["day", "event_type"], "user_id", lgk=12)
    safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
    path = os.path.join(_scratch_root(), f"hllroll{safe}")
    daily.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    est = hll_table_estimate(stored, ["event_type"], "approx_users")
    # n_days is a property of the STORED table (one row per (day,type))
    # — no raw re-scan; exact_users as a single distinct pipeline
    # (groupBy-distinct then count), NOT a multi-count_distinct agg,
    # whose Expand would push 2x the raw rows through the partial agg
    # (the Expand formulation measured 30.7 s full-query at sf100
    # against a 2.8 s production path; BENCH_r12b_probes.json)
    n_days = stored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    exact = (
        base.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    band_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= 0.06
    )
    return (
        exact.join(est, "event_type")
        .join(n_days, "event_type")
        .select("event_type", "n_days", "exact_users", band_ok.alias("est_ok"))
        .orderBy("event_type")
    )


@q(
    "stream_hll_distinct",
    f"""
    {_HLL_BAND_SQL}
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1 ORDER BY event_type
    """,
)
def stream_hll_distinct(spark, sf_dir):
    # Streaming twin of events_hll_rollup: per-event_type distinct
    # users with HLL registers as keyed streaming state
    # (streaming/stateful.py hll_distinct_stream) — 8 KiB of state per
    # key at ANY stream length, where exact streaming distinct holds
    # every id ever seen. HLL state is a per-register max (commutative,
    # idempotent), so the final streaming estimate EQUALS a batch build
    # over the same rows — micro-batch boundaries can't move it — and
    # the band check is inherited from the batch contract (lgk=13 here:
    # RSE 1.15%, 6% band is >= 5 sigma). keep_last over the monotone n
    # takes each key's final emission.
    from finlogic_spark.streaming import drain_stream_to_df, read_events_stream
    from finlogic_spark.streaming.stateful import hll_distinct_stream

    stream = read_events_stream(spark, sf_dir)
    drained = drain_stream_to_df(
        hll_distinct_stream(stream), output_mode="update"
    )
    est = keep_last(drained, ["event_type"], ["n"]).select(
        "event_type", "approx_users"
    )
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    band_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= 0.06
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "exact_users", band_ok.alias("est_ok"))
        .orderBy("event_type")
    )


@q(
    "doc_heavy_tokens",
    f"""
    WITH toks AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents
                  WHERE text IS NOT NULL),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token, count(*) AS cnt FROM toks CROSS JOIN tot
    GROUP BY token, tot.n HAVING count(*) >= 0.001 * tot.n
    ORDER BY cnt DESC, token ASC
    """,
)
def doc_heavy_tokens(spark, sf_dir):
    # Exact phi-heavy-hitter tokens (phi = 0.1% of all occurrences)
    # WITHOUT shuffling the token distribution (operators/freq.py):
    # a map-only frequency screen emits <= 2/phi candidates per
    # partition (provable superset — an item below phi/2 locally
    # everywhere is below phi globally), then the exact count touches
    # only candidate occurrences (broadcast semi-join BEFORE the
    # shuffle). Contrast doc_topk_tokens, whose exchange carries one
    # row per distinct token per map task — the full vocabulary at
    # corpus scale. The screen tokenizes INSIDE pandas (heavy_tokens):
    # 5M document strings cross Arrow, not 430M exploded token rows
    # (the exploded formulation measured 85.6 s at sf100;
    # BENCH_r12b_probes.json carries the shipped plan's number).
    # Output counts are exact (JVM tokenizer), so the oracle is plain
    # GROUP BY / HAVING; the phi*n threshold is a broadcast scalar
    # from the screen's total rows, not a driver count.
    from finlogic_spark.operators.freq import heavy_tokens

    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    out = heavy_tokens(d, "text", 0.001)
    return out.orderBy(F.col("cnt").desc(), F.col("token").asc())


def _pagerank_oracle_sql(iters: int = 5) -> str:
    """Unrolled-CTE integer PageRank (oracle of orders_supplier_pagerank):
    one CTE per iteration, generated, not hand-copied, so the Spark
    loop and the SQL stay structurally identical. All arithmetic is
    int64 (// floor-division on positive values == Spark's DIV), so
    both engines produce bit-identical ranks — a full value-hash
    oracle for an ITERATIVE algorithm, no error band needed."""
    s = """
    WITH edges AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    bi AS (SELECT src, dst FROM edges
           UNION ALL SELECT dst AS src, src AS dst FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM bi GROUP BY 1),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    for i in range(1, iters + 1):
        s += f""",
    r{i} AS (SELECT b.dst AS node,
             CAST(150000 + sum((CAST(85 AS BIGINT) * r.r)
                  // (CAST(100 AS BIGINT) * deg.d)) AS BIGINT) AS r
             FROM bi b JOIN r{i - 1} r ON r.node = b.src
             JOIN deg ON deg.src = b.src
             GROUP BY 1)"""
    s += f"""
    SELECT node, r AS rank_micro FROM r{iters}
    WHERE node LIKE 's%' ORDER BY rank_micro DESC, node ASC LIMIT 20"""
    return s


@q("orders_supplier_pagerank", _pagerank_oracle_sql(5))
def orders_supplier_pagerank(spark, sf_dir):
    # Iterative graph analytics beyond connected components
    # (operators/graph.py pagerank): supplier importance on the
    # symmetrized customer<->supplier order graph, 5 power-iteration
    # rounds in EXACT int64 micro-units — integer sums are
    # order-independent, so Spark's parallel partial aggregation and
    # DuckDB's unrolled CTEs produce bit-identical ranks (full value
    # hash, not a band; same determinism discipline as DSIR's
    # micro-nats). Per round: one shuffle keyed by src + one
    # partial-agg sum keyed by dst, lineage checkpointed — the minimal
    # distributed PageRank round at any scale.
    from finlogic_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    edges = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    # r17: the symmetrized view is the operator's job now — on the
    # small-graph regime the funnel ships only the DIRECTED distinct
    # edges (half the union's rows) and the worker relaxes both
    # directions; the distributed regimes build the identical union
    # over the cached directed edges (bit-equal either way, probed
    # 3.47 -> 2.41 s at sf0.1).
    ranks = pagerank(edges, iterations=5, symmetrize=True)
    return (
        ranks.filter(F.col("node").startswith("s"))
        .select("node", F.col("rank").alias("rank_micro"))
        .orderBy(F.col("rank_micro").desc(), F.col("node").asc())
        .limit(20)
    )


@q(
    "events_kll_bucketize",
    """
    -- Property-style oracle (the KLL band pattern): bucket BOUNDARIES
    -- are sketch estimates, but equi-depth binning inherits the rank
    -- guarantee — every bucket must hold n/4 +- 2*eps*n rows (eps
    -- 0.02 at k=200; asserted at 0.05 with slack). count_ok checks
    -- that exactly on the Spark side; group/bucket identity compares
    -- directly. The full 4-bucket grid is emitted Spark-side too
    -- (empty buckets as 0-count rows), so presence is an identity,
    -- not a data assumption. The BAND binds only on non-degenerate
    -- groups: if one value carries > n/4 of a group's mass, exact
    -- equi-depth is impossible for ANY boundary choice (duplicate
    -- quantiles force an over-full bucket and can empty a neighbor) —
    -- those groups pass via the degeneracy exemption, computed
    -- exactly from the same value histogram, rather than encoding a
    -- tie-freeness assumption about the corpus into the gate.
    SELECT event_type, CAST(b AS INT) AS bucket, TRUE AS count_ok
    FROM (SELECT DISTINCT event_type FROM events
          WHERE value IS NOT NULL AND NOT isnan(value))
    CROSS JOIN range(4) r(b)
    ORDER BY event_type, bucket
    """,
)
def events_kll_bucketize(spark, sf_dir):
    # Sketch-driven equi-depth binning (operators/sketch.py
    # kll_bucketize): ONE sketch-only shuffle yields per-group quartile
    # boundaries, which broadcast back and assign every row's bucket as
    # a map-side expression — the raw rows shuffle NOWHERE. The exact
    # alternative (ntile over a global sort) is a full-data
    # range-exchange + sort; at 100 TB that is the difference between
    # a feature-bucketizer you can run per training batch and one you
    # can't. Validation: per-bucket populations against the rank band
    # (the value-frequency histogram feeds both the weighted sketch
    # and the band counts — one data-sized pass, the
    # events_kll_quantiles trick).
    from pyspark.storagelevel import StorageLevel

    from finlogic_spark.operators.sketch import kll_bucketize

    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    base = e.filter(v.isNotNull() & ~F.isnan(v)).select("event_type", "value")
    hist = (
        base.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    bucketed = kll_bucketize(
        hist, ["event_type"], "value", num_buckets=4, weight_col="__c"
    )
    nb = bucketed.groupBy("event_type", "bucket").agg(F.sum("__c").alias("__nb"))
    # full grid + degeneracy exemption (see oracle comment): a group
    # where one value holds > n/4 of the mass cannot be equi-depth
    # split by any boundaries, so the band yields to that exact flag;
    # empty buckets surface as 0-count grid rows instead of missing
    # rows, keeping presence an identity check.
    tot = hist.groupBy("event_type").agg(
        F.sum("__c").alias("__n"), F.max("__c").alias("__maxc")
    )
    grid = tot.crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("bucket"))
    )
    return (
        grid.join(nb, ["event_type", "bucket"], "left")
        .withColumn("__nb", F.coalesce(F.col("__nb"), F.lit(0)))
        .select(
            "event_type",
            "bucket",
            (
                (
                    F.abs(F.col("__nb") - F.col("__n") / 4.0)
                    <= 0.05 * F.col("__n")
                )
                | (F.col("__maxc") * 4 > F.col("__n"))
            ).alias("count_ok"),
        )
        .orderBy("event_type", "bucket")
    )


@q(
    "events_hll_window",
    f"""
    {_HLL_BAND_SQL}
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day, event_type
                  FROM events WHERE user_id IS NOT NULL)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.event_type,
           (SELECT CAST(count(DISTINCT e.user_id) AS BIGINT) FROM events e
            WHERE e.event_type = d.event_type
              AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
              AND e.user_id IS NOT NULL) AS exact_users,
           TRUE AS est_ok
    FROM days d ORDER BY day, event_type
    """,
)
def events_hll_window(spark, sf_dir):
    # The sliding-distinct dashboard from stored sketches
    # (operators/distinct_sketch.py hll_window_estimate): trailing
    # 7-day distinct users per (day, event_type) computed by merging
    # at most 7 STORED daily sketch rows per output day — KBs read,
    # zero raw rows re-scanned, no data-sized exchange (the sketch
    # table broadcasts). The exact alternative re-distincts a 7-day
    # window of raw events PER OUTPUT DAY — at 100 TB that is 7x the
    # corpus per dashboard refresh; here the exact branch exists only
    # to validate the band. Compare events_sliding_distinct, which
    # computes the same shape from raw rows with hll_sketch_agg
    # windows — this query is what replaces it once daily sketch
    # tables are persisted.
    from finlogic_spark.operators.distinct_sketch import (
        hll_sketch_table,
        hll_window_estimate,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    base = e.select(F.to_date("ts").alias("day"), "event_type", "user_id")
    daily = hll_sketch_table(base, ["day", "event_type"], "user_id", lgk=12)
    est = hll_window_estimate(daily, ["event_type"], "day", 7, "approx_users")
    # exact validation branch: distinct (type, day, user) triples once,
    # then each triple EXPLODES to the <=7 window days it feeds (a
    # map-side sequence, no join) and a broadcast semi-join prunes
    # phantom days off the grid. The first formulation range-joined
    # triples to the grid keyed on event_type alone — every triple met
    # all ~30 grid days before the datediff filter (a measured 30x
    # intermediate blowup at sf100; this shape is 7x by construction).
    triples = base.distinct()
    grid = triples.select("event_type", "day").distinct()
    fan = triples.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    exact = (
        fan.join(F.broadcast(grid), ["event_type", "day"], "left_semi")
        .groupBy("event_type", "day")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    band_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= 0.06
    )
    return (
        exact.join(est, ["event_type", "day"])
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            "exact_users",
            band_ok.alias("est_ok"),
        )
        .orderBy("day", "event_type")
    )


@q(
    "events_kmv_overlap",
    """
    -- Property-style oracle (the sketch-band pattern): KMV
    -- intersection ESTIMATES are sketch-specific, but below k distinct
    -- values the sketch holds every hash and the estimate is exact —
    -- both gate scales sit in that regime (<=1500 users vs k=4096), so
    -- est_ok is a strict check here; super-k error is pinned in
    -- tests/test_distinct_sketch.py. Exact overlaps compare directly.
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE user_id IS NOT NULL)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS exact_overlap,
           TRUE AS est_ok
    FROM u a JOIN u b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY type_a, type_b
    """,
)
def events_kmv_overlap(spark, sf_dir):
    # Distinct-set INTERSECTION estimates — the set operation HLL
    # cannot express (operators/distinct_sketch.py KMV): audience
    # overlap between every pair of event types from one KMV sketch
    # row per type. Build: map-side partial k-min sketches, a
    # sketch-only shuffle (<=k longs per partial), reduce-side merge;
    # pair stage: a broadcast cross-join of the 5 sketch rows + the
    # rho estimator over the exact k-min union — |groups|^2 pairs of
    # k longs, never the raw sets (the exact alternative self-joins
    # the distinct (type,user) table, quadratic in type overlap at
    # 100 TB). Validation: exact overlap via that self-join (gate
    # scale only) + the band flag.
    from finlogic_spark.operators.distinct_sketch import (
        kmv_pair_overlap,
        kmv_sketch_table,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sk = kmv_sketch_table(
        e.select("event_type", "user_id"), ["event_type"], "user_id", k=4096
    )
    est = kmv_pair_overlap(sk, "event_type", out_col="approx_overlap")
    # r16: BOTH sides of the exact self-join consume this distinct —
    # without a barrier the scan+distinct exchange ran twice (probe
    # sketch_exact_subtrees: barrier better in all 3 alternations; the
    # same barrier on events_hll_window's triples measured WORSE and
    # was rejected). The materialized frame is the post-distinct pair
    # set — smaller than the input, spill-safe at scale.
    from pyspark.storagelevel import StorageLevel

    u = (
        e.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    ua = u.select(F.col("event_type").alias("type_a"), "user_id")
    ub = u.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    band_ok = (
        F.abs(F.col("approx_overlap") - F.col("exact_overlap"))
        <= 0.25 * F.col("exact_overlap") + 2
    )
    return (
        exact.join(
            est.withColumnsRenamed({"key_a": "type_a", "key_b": "type_b"}),
            ["type_a", "type_b"],
        )
        .select("type_a", "type_b", "exact_overlap", band_ok.alias("est_ok"))
        .orderBy("type_a", "type_b")
    )


@q("stream_heavy_tokens", None)  # oracle attached below (batch twin's SQL)
def stream_heavy_tokens(spark, sf_dir):
    # Streaming twin of doc_heavy_tokens: sharded Misra-Gries summaries
    # as keyed streaming state (streaming/stateful.py
    # heavy_tokens_stream) — <= 2000 counters per shard at ANY stream
    # length, where exact streaming token counts hold the whole
    # vocabulary. The MG no-miss bound (counter >= n*(phi - 1/(k+1)))
    # makes the drained candidate set a provable superset of the
    # phi=0.001 heavy tokens at any shard imbalance; a batch-side
    # exact count of JUST the candidates (broadcast semi-join before
    # the shuffle — the screen+verify shape) then produces exact
    # counts, so this shares the batch twin's plain GROUP BY/HAVING
    # oracle verbatim. The threshold n comes from the summaries' exact
    # absorbed-row totals, not a second full count.
    from finlogic_spark.streaming import (
        drain_stream_to_df,
        read_documents_stream,
    )
    from finlogic_spark.streaming.stateful import heavy_tokens_stream

    stream = read_documents_stream(spark, sf_dir)
    drained = drain_stream_to_df(
        heavy_tokens_stream(stream), output_mode="update"
    )
    final = keep_last(drained, ["shard"], ["n"])
    total = final.agg(F.sum("n").alias("__n"))
    cand = final.select(F.explode("items").alias("token")).distinct()
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    occ = d.select(F.explode(tokens("text")).alias("token"))
    exact = (
        occ.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(ge_phi_n(F.col("cnt"), F.col("__n"), 0.001))
        .drop("__n")
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
    )


ORACLES["stream_heavy_tokens"] = ORACLES["doc_heavy_tokens"]


# ---------------------------------------------------------------------------
# BPE subword tokenization (round 13)
# ---------------------------------------------------------------------------

_BPE_TOP_WORDS = 30_000
_BPE_NUM_MERGES = 200
_BPE_MERGES_CACHE: dict[str, list] = {}
_BPE_ENC_VALUES_CACHE: dict[str, list] = {}


def _bpe_index_store(spark, sf_dir):
    """Durable BPE serving index, built once per sf_dir (r13 verdict
    item 5 — the merge table was a per-session cache while every other
    serving structure had a persisted store): merges + per-word
    encodings + version sidecar under the session scratch root (the
    _postings_index lifecycle). Returns (merges, pieces_lookup) —
    merges is num_merges rows, the lookup is vocab-bounded (the
    top-30k materialization precedent); registry queries SERVE from
    them (seeded encode caches), so query-time BPE cost for known
    words is a dict hit, not a merge loop."""
    key = ("bpe_index", sf_dir)
    if key not in _BPE_MERGES_CACHE:
        from finlogic_spark.operators.bpe import (
            build_bpe_index,
            load_pieces_lookup,
            read_bpe_index,
        )

        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"bpe{safe}", "idx")
        try:
            # expected-params check (ADVICE r14): a scratch root that
            # outlives a _BPE_NUM_MERGES/_BPE_TOP_WORDS change must
            # rebuild, not silently serve the stale-parameter model
            merges, _wp = read_bpe_index(
                spark,
                path,
                expected_num_merges=_BPE_NUM_MERGES,
                expected_top_words=_BPE_TOP_WORDS,
            )
        except Exception:
            build_bpe_index(
                _t(spark, sf_dir, "documents"),
                path,
                "text",
                num_merges=_BPE_NUM_MERGES,
                top_words=_BPE_TOP_WORDS,
            )
            merges, _wp = read_bpe_index(
                spark,
                path,
                expected_num_merges=_BPE_NUM_MERGES,
                expected_top_words=_BPE_TOP_WORDS,
            )
        _BPE_MERGES_CACHE[key] = (merges, load_pieces_lookup(spark, path))
    return _BPE_MERGES_CACHE[key]


def _bpe_merges(spark, sf_dir):
    """The learned merge table, served from the persisted index."""
    return _bpe_index_store(spark, sf_dir)[0]


def _bpe_enc_pairs(sf_dir: str) -> list[tuple[str, str]]:
    """The oracle's word -> pieces lookup — an INDEPENDENT serial twin
    (pyarrow + pure Python, zero Spark): it re-tokenizes the corpus,
    re-counts words, re-learns the merges with the same deterministic
    procedure, and encodes every corpus word. Python str.lower()
    applies the JVM's full case mapping and the split class is the
    same explicit ASCII set, so word counts — and hence merges and
    encodings — are exactly the Spark path's. DuckDB then
    independently verifies what the cluster computes at scale: the
    corpus tokenize + per-occurrence lookup + per-doc work (the
    emb_pca_project pattern: the non-SQL-expressible derivation is
    baked as literals, the data-sized work is SQL). Returns sorted
    (word, 'p1 p2 ...') pairs, SQL-escaped downstream."""
    if sf_dir in _BPE_ENC_VALUES_CACHE:
        return _BPE_ENC_VALUES_CACHE[sf_dir]
    from collections import Counter

    import pyarrow.parquet as pq

    from finlogic_spark.operators.bpe import (
        _words,
        encode_word,
        learn_bpe_merges,
    )

    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"]
    counts: Counter = Counter()
    for t in texts:
        s = t.as_py()
        if s:
            counts.update(_words(s))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    merges = learn_bpe_merges(top[:_BPE_TOP_WORDS], _BPE_NUM_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    _BPE_ENC_VALUES_CACHE[sf_dir] = [
        (w, " ".join(encode_word(w, ranks))) for w in sorted(counts)
    ]
    return _BPE_ENC_VALUES_CACHE[sf_dir]


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


def _bpe_enc_values(sf_dir: str) -> str:
    """(word, n_pieces, pieces) VALUES literal for the encode/pack
    oracles."""
    return ",\n      ".join(
        f"('{_sqlq(w)}', {p.count(' ') + 1}, '{_sqlq(p)}')"
        for w, p in _bpe_enc_pairs(sf_dir)
    )


def _bpe_encode_oracle_sql(sf_dir: str) -> str:
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents),
    enc(word, np, pieces) AS (VALUES {_bpe_enc_values(sf_dir)}),
    pw AS (SELECT t.doc_id, e.np, e.pieces
           FROM tok t JOIN enc e USING (word)),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(np) AS BIGINT) AS n_pieces
            FROM pw GROUP BY 1),
    dp AS (SELECT doc_id,
                  CAST(count(DISTINCT piece) AS BIGINT) AS n_distinct_pieces
           FROM (SELECT doc_id, unnest(string_split(pieces, ' ')) AS piece
                 FROM pw)
           GROUP BY 1)
    SELECT agg.doc_id, n_words, n_pieces, n_distinct_pieces
    FROM agg JOIN dp USING (doc_id) ORDER BY doc_id
    """


LAZY_ORACLES["doc_bpe_encode"] = _bpe_encode_oracle_sql


@q("doc_bpe_encode")  # data-dependent oracle: see LAZY_ORACLES above.
def doc_bpe_encode(spark, sf_dir):
    # Subword tokenization (operators/bpe.py): learn a deterministic
    # 200-merge BPE table from the corpus word frequencies (one
    # vocab-bounded groupBy + a bounded top-30k driver materialization
    # — the kmeans-centroids precedent), broadcast the ranks, encode
    # Arrow-batched with a per-task word cache. Per-doc output pins
    # word count, BPE piece count (the packing length), and distinct
    # pieces (hash-sensitive to piece identities). The oracle re-learns
    # the same merges through an independent serial twin and bakes the
    # word->pieces lookup into SQL.
    from finlogic_spark.operators.bpe import bpe_doc_stats

    d = _t(spark, sf_dir, "documents")
    m, lk = _bpe_index_store(spark, sf_dir)
    return bpe_doc_stats(d, m, pieces_lookup=lk).orderBy("doc_id")


def _bpe_pack_oracle_sql(sf_dir: str) -> str:
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents),
    enc(word, np, pieces) AS (VALUES {_bpe_enc_values(sf_dir)}),
    agg AS (SELECT t.doc_id, CAST(sum(e.np) AS BIGINT) AS n
            FROM tok t JOIN enc e USING (word) GROUP BY 1),
    sized AS (
      SELECT d.doc_id, CAST(d.doc_id % 8 AS INTEGER) AS shard,
             coalesce(a.n, 0) AS n_pieces
      FROM documents d LEFT JOIN agg a USING (doc_id)),
    packed AS (
      SELECT doc_id, shard, n_pieces,
             SUM(n_pieces) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM sized)
    SELECT doc_id, shard, n_pieces,
           CAST(floor((cum - n_pieces) / 2048.0) AS INTEGER) AS seq_id
    FROM packed ORDER BY doc_id
    """


LAZY_ORACLES["doc_bpe_pack"] = _bpe_pack_oracle_sql


@q("doc_bpe_pack")  # data-dependent oracle: see LAZY_ORACLES above.
def doc_bpe_pack(spark, sf_dir):
    # Sequence packing by BPE length (doc_pack_sequences' shard-local
    # running-sum shape, but the budget is spent in BPE pieces — what
    # a training batch actually holds — instead of whitespace tokens).
    # Zero-token docs pack with length 0 via the left join.
    from finlogic_spark.operators.bpe import bpe_doc_stats

    d = _t(spark, sf_dir, "documents")
    m, lk = _bpe_index_store(spark, sf_dir)
    enc = bpe_doc_stats(d, m, pieces_lookup=lk).select(
        "doc_id", "n_pieces"
    )
    budget = 2048
    sized = (
        d.select("doc_id", (F.col("doc_id") % 8).cast("int").alias("shard"))
        .join(enc, "doc_id", "left")
        .select(
            "doc_id",
            "shard",
            F.coalesce(F.col("n_pieces"), F.lit(0)).cast("long").alias(
                "n_pieces"
            ),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum", F.sum("n_pieces").over(w))
        .select(
            "doc_id",
            "shard",
            "n_pieces",
            F.floor((F.col("cum") - F.col("n_pieces")) / float(budget))
            .cast("int")
            .alias("seq_id"),
        )
        .orderBy("doc_id")
    )


def _bpe_shingle_oracle_sql(sf_dir: str) -> str:
    """LSH-candidate-pairs oracle over BPE-PIECE shingles: the baked
    word->pieces lookup rides a one-row MAP (cross-joined, so DuckDB
    builds it once, not per row); piece sequences keep document order
    via list_transform + flatten; the shingle/minhash/band SQL then
    mirrors doc_lsh_pairs'. Zero-token docs are excluded on both
    sides (flatten of an empty list would otherwise shingle to [''])."""
    keys, vals = [], []
    for w, p in _bpe_enc_pairs(sf_dir):
        keys.append(f"'{_sqlq(w)}'")
        vals.append(f"'{_sqlq(p)}'")
    return f"""
    WITH m AS (SELECT MAP([{", ".join(keys)}],
                          [{", ".join(vals)}]) AS mp),
    s AS (SELECT doc_id,
                 flatten(list_transform({_TOKS_SQL},
                         w -> string_split(mp[w][1], ' '))) AS p
          FROM documents, m
          WHERE len({_TOKS_SQL}) > 0),
    sh AS (SELECT doc_id,
                  CASE WHEN len(p) < 3 THEN [array_to_string(p, ' ')]
                       ELSE list_transform(range(1, len(p) - 1),
                                           i -> array_to_string(p[i:i+2], ' '))
                  END AS shs
           FROM s),
    sig AS (SELECT doc_id,
                   list_min(list_transform(shs, x -> md5('0|' || x))) AS m0,
                   list_min(list_transform(shs, x -> md5('1|' || x))) AS m1,
                   list_min(list_transform(shs, x -> md5('2|' || x))) AS m2,
                   list_min(list_transform(shs, x -> md5('3|' || x))) AS m3
            FROM sh),
    buckets AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(m2 || '|' || m3) AS bh FROM sig)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
    WHERE a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """


LAZY_ORACLES["doc_bpe_shingle_pairs"] = _bpe_shingle_oracle_sql


@q("doc_bpe_shingle_pairs")  # data-dependent oracle: see LAZY_ORACLES.
def doc_bpe_shingle_pairs(spark, sf_dir):
    # Near-dup candidates on BPE-PIECE shingles — the third leg of the
    # BPE trio (count / pack / dedup): subword shingles normalize the
    # morphology and tokenization quirks word shingles split on, so
    # the same banded-LSH shape (4 hashes, 2 bands of 2, never
    # all-pairs) reaches duplicates the word-shingle path scores
    # apart. Pieces come Arrow-batched from bpe_pieces; shingling,
    # seeded-md5 minhashing (explode + map-side min partials, one
    # exchange row per doc), banding, and the pair expansion are all
    # JVM-side — bit-reproducible in any engine with md5, hence the
    # exact-SQL oracle. Banding explodes ONE array of (band, hash)
    # structs and pairs expand bucket-side via bucket_pairs (the
    # minhash_lsh_pairs shape): the union-of-selects + bucket
    # self-join form evaluated the sig pipeline 4x (2 union branches
    # x 2 join sides — Spark shares no subplans across branches).
    from finlogic_spark.operators.bpe import bpe_pieces
    from finlogic_spark.operators.text_dedup import (
        array_shingles,
        bucket_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    m, lk = _bpe_index_store(spark, sf_dir)
    p = bpe_pieces(d, m, pieces_lookup=lk)
    sh = p.select(
        "doc_id",
        F.explode(
            F.array_distinct(array_shingles(F.col("pieces"), 3))
        ).alias("__sh"),
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}|"), F.col("__sh")))
            ).alias(f"m{i}")
            for i in range(4)
        ]
    )
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.md5(
                        F.concat(F.col("m0"), F.lit("|"), F.col("m1"))
                    ).alias("band_hash"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.md5(
                        F.concat(F.col("m2"), F.lit("|"), F.col("m3"))
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    return bucket_pairs(buckets, "doc_id").orderBy("id_a", "id_b")


def _bpe_pack_segments_oracle_sql(sf_dir: str) -> str:
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents),
    enc(word, np, pieces) AS (VALUES {_bpe_enc_values(sf_dir)}),
    agg AS (SELECT t.doc_id, CAST(sum(e.np) AS BIGINT) AS n
            FROM tok t JOIN enc e USING (word) GROUP BY 1),
    sized AS (
      SELECT d.doc_id, CAST(d.doc_id % 8 AS INTEGER) AS shard,
             coalesce(a.n, 0) AS n_pieces
      FROM documents d LEFT JOIN agg a USING (doc_id)),
    spans AS (
      SELECT doc_id, shard, n_pieces,
             CAST(SUM(n_pieces) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS e
      FROM sized),
    seg AS (SELECT doc_id, shard, e - n_pieces AS s, e
            FROM spans WHERE n_pieces > 0),
    fan AS (SELECT doc_id, shard, s, e,
                   unnest(range(s // 2048, (e - 1) // 2048 + 1)) AS q
            FROM seg)
    SELECT doc_id, shard, CAST(q AS INTEGER) AS seq_id,
           CAST(greatest(q * 2048, s) - s AS BIGINT) AS doc_offset,
           CAST(least((q + 1) * 2048, e) - greatest(q * 2048, s) AS BIGINT)
             AS seg_len
    FROM fan ORDER BY doc_id, seq_id
    """


LAZY_ORACLES["doc_bpe_pack_segments"] = _bpe_pack_segments_oracle_sql


@q("doc_bpe_pack_segments")  # data-dependent oracle: see LAZY_ORACLES.
def doc_bpe_pack_segments(spark, sf_dir):
    # The full concat-and-chunk packing INDEX (operators/corpus.py
    # pack_segments): one row per (document, training sequence it
    # touches) with the in-doc piece offsets — what the loader actually
    # consumes, including docs split across 2048-piece sequence
    # boundaries (doc_bpe_pack only reports the starting sequence).
    # Closed-form segmentation: per-shard running-sum window + a
    # map-side explode of ceil(len/B)+1 rows per doc — no extra
    # exchange beyond the packing window itself.
    from finlogic_spark.operators.bpe import bpe_doc_stats
    from finlogic_spark.operators.corpus import pack_segments

    d = _t(spark, sf_dir, "documents")
    m, lk = _bpe_index_store(spark, sf_dir)
    enc = bpe_doc_stats(d, m, pieces_lookup=lk).select(
        "doc_id", "n_pieces"
    )
    sized = (
        d.select("doc_id", (F.col("doc_id") % 8).cast("int").alias("shard"))
        .join(enc, "doc_id", "left")
        .select(
            "doc_id",
            "shard",
            F.coalesce(F.col("n_pieces"), F.lit(0)).cast("long").alias(
                "n_pieces"
            ),
        )
    )
    return pack_segments(sized, "doc_id", "shard", "n_pieces", 2048).orderBy(
        "doc_id", "seq_id"
    )


_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment",
                 "c_acctbal"]


@q(
    "data_profile_approx",
    f"""
    -- Band oracle (the events_hll_rollup pattern): rows/nulls/frac_null
    -- are exact on both tiers and compare directly; the sketched
    -- n_distinct is checked on the Spark side against the exact count
    -- (HLL++ at default rsd=0.05; asserted at 15% = 3 sigma — the
    -- estimate is deterministic for given data, so the check is
    -- stable run-to-run).
    {" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"  AS n_nulls, "
        + _rN_sql(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
            " / count(*)", 6
        )
        + " AS frac_null, TRUE AS distinct_ok FROM customer"
        for c in _PROFILE_COLS
    )}
    ORDER BY col_name
    """,
)
def data_profile_approx(spark, sf_dir):
    # The data_profile approx tier, oracle-gated (operators/profile.py
    # profile_columns(approx=True)): ONE scan, ONE aggregate — nulls +
    # fixed-size HLL++ sketch buffers per column, no per-column
    # distinct branches (the 100 TB profile; plan pinned in
    # test_round6_ops). The exact tier joins in purely to validate the
    # sketch band — at scale that branch is exactly what the approx
    # tier deletes (BENCH_r14_probes.json: HLL++ 3.6 s vs exact 13.1 s
    # at 150M rows x 5 cols, and the approx exchange is fixed-size
    # sketch buffers vs the exact tier's per-distinct-value exchange).
    from finlogic_spark.operators.profile import profile_columns

    cust = _t(spark, sf_dir, "customer")
    ap = profile_columns(cust, _PROFILE_COLS, approx=True)
    ex = profile_columns(cust, _PROFILE_COLS).select(
        "col_name", F.col("n_distinct").alias("__exact")
    )
    return (
        ap.join(ex, "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "frac_null",
            (
                F.abs(F.col("n_distinct") - F.col("__exact"))
                <= 0.15 * F.col("__exact")  # 3 sigma at rsd=0.05
            ).alias("distinct_ok"),
        )
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval fusion (round 14)
# ---------------------------------------------------------------------------

_HYBRID_TERMS = ["dup", "vector", "spark"]

# Semantic leg: the emb_lsh_topk oracle specialized to ONE query
# (vec_id = 0, the doc whose embedding plays the query vector) and
# k=20 — same planes/masks literals, same rank keys.
_HYBRID_SEM_SQL = f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id = 0),
    cb AS (
      SELECT t, vec_id, v, CAST(sum(CASE WHEN
               list_sum(list_transform(range(1, 65), i -> v[i] * pl[i])) >= 0
             THEN power(2, p)::BIGINT ELSE 0 END) AS BIGINT) AS bucket
      FROM c CROSS JOIN {{planes}} GROUP BY t, vec_id, v),
    qb0 AS (
      SELECT t, query_id, qv, CAST(sum(CASE WHEN
               list_sum(list_transform(range(1, 65), i -> qv[i] * pl[i])) >= 0
             THEN power(2, p)::BIGINT ELSE 0 END) AS BIGINT) AS bucket
      FROM qs CROSS JOIN {{planes}} GROUP BY t, query_id, qv),
    qb AS (
      SELECT t, query_id, qv, xor(bucket, mask) AS bucket
      FROM qb0 CROSS JOIN {{masks}}),
    scored AS (
      SELECT query_id, vec_id,
             max({_DOT_SQL} / ({_NORM_V} * {_NORM_Q})) AS cs
      FROM cb JOIN qb USING (t, bucket)
      GROUP BY query_id, vec_id)
    SELECT vec_id, rk
    FROM (SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY cs DESC, vec_id ASC)
            AS INTEGER) AS rk
          FROM scored)
    WHERE rk <= 20
"""


def _hybrid_oracle_sql() -> str:
    # Composed FROM the two component oracles: the lexical leg is the
    # registered doc_bm25_search SQL verbatim (already LIMIT 20 with
    # (score DESC, doc_id ASC) order — row_number over the same keys
    # recovers its rank), the semantic leg the specialized LSH SQL
    # above. Fusion itself is exact rank arithmetic.
    sem = _HYBRID_SEM_SQL.format(
        planes=_multi_planes_sql(), masks=_masks_sql()
    )
    return f"""
    WITH lex AS (
      SELECT doc_id, CAST(row_number() OVER (
               ORDER BY score DESC, doc_id ASC) AS INTEGER) AS r_lex
      FROM ({ORACLES["doc_bm25_search"]})),
    sem AS (SELECT vec_id AS doc_id, rk AS r_sem FROM ({sem})),
    f AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.r_lex, s.r_sem,
             coalesce(1.0 / (60 + l.r_lex), 0.0)
             + coalesce(1.0 / (60 + s.r_sem), 0.0) AS s
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, r_lex, r_sem,
           floor(s * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
    FROM f ORDER BY s DESC, doc_id ASC LIMIT 15
    """


@q("doc_hybrid_search", _hybrid_oracle_sql())
def doc_hybrid_search(spark, sf_dir):
    # Reciprocal-rank fusion of the two persisted serving indexes
    # (r13 verdict item 3): BM25 over the partition-pruned postings
    # index + ANN top-k served from the LSH index, fused with RRF
    # k=60 (operators/search.rrf_fuse). Both legs are top-20 bounded,
    # so fusion is broadcast-sized rank arithmetic — the corpus-scale
    # work stays inside the index-served legs. 1/(k+r) is one IEEE
    # division of exact ints and the two terms add in a fixed order,
    # so the fused score hashes bit-identically without quantization.
    from finlogic_spark.operators.search import bm25_topk, rrf_fuse

    idx = _postings_index(spark, sf_dir)
    lex = bm25_topk(None, _HYBRID_TERMS, k=20, postings=idx)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex_r = lex.select(
        "doc_id", F.row_number().over(w).cast("int").alias("r_lex")
    )
    corpus = _lsh_index(spark, sf_dir)
    q0 = _emb_corpus(spark, sf_dir).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    sem = lsh_cosine_topk(
        corpus,
        q0,
        k=20,
        dim=64,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
        probe_radius=_LSH_RADIUS,
        corpus_bucketed=True,
        local_query_probes=True,
    )
    sem_r = sem.select(
        F.col("vec_id").alias("doc_id"), F.col("rk").cast("int").alias("r_sem")
    )
    fused = rrf_fuse([(lex_r, "r_lex"), (sem_r, "r_sem")], "doc_id", k=60)
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(15)
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            rN(F.col("rrf_score"), 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Model-based quality gate (round 14)
# ---------------------------------------------------------------------------

_QCLF_CACHE: dict[str, tuple[list, int]] = {}


def _qclf_params(sf_dir: str) -> tuple[list, int]:
    """Train (once per sf_dir) the hashed-feature logistic quality
    model — pure pyarrow+numpy, deterministic, bounded sample (see
    operators/quality_model.train_quality_classifier). The SAME
    integer micro-unit weights feed the Spark literals and the oracle
    SQL literals: the cross-engine-verified surface is the
    corpus-wide SCORING expression (the part that runs at 100 TB),
    exactly the pca_components_numpy precedent for the non-SQL-
    expressible fit step."""
    if sf_dir not in _QCLF_CACHE:
        from finlogic_spark.operators.quality_model import (
            train_quality_classifier,
        )

        _QCLF_CACHE[sf_dir] = train_quality_classifier(
            os.path.join(sf_dir, "documents.parquet")
        )
    return _QCLF_CACHE[sf_dir]


def _quality_clf_oracle_sql(sf_dir: str) -> str:
    from finlogic_spark.operators.quality_model import MICRO, N_BUCKETS

    w, b = _qclf_params(sf_dir)
    w_sql = "[" + ", ".join(str(v) for v in w) + "]"
    return f"""
    -- weights/bias are integer micro-units baked by the deterministic
    -- trainer; the fold is an exact int sum, so the logit hashes
    -- bit-identically (one IEEE division + 6-dp floor at the edge).
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
    nz AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
    s AS (SELECT doc_id, n,
            CAST(list_sum(list_transform(ts,
              t -> ({w_sql})[
                ('0x' || substr(md5(t), 1, 4))::BIGINT % {N_BUCKETS} + 1
              ])) AS BIGINT)
            + CAST(n AS BIGINT) * CAST({b} AS BIGINT) AS raw
          FROM nz)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           floor(CAST(raw AS DOUBLE) / (CAST(n AS DOUBLE) * {MICRO}.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS logit,
           raw >= 0 AS pred_quality
    FROM s ORDER BY doc_id
    """


LAZY_ORACLES["doc_quality_classifier"] = _quality_clf_oracle_sql


@q("doc_quality_classifier")  # data-dependent oracle: LAZY_ORACLES above.
def doc_quality_classifier(spark, sf_dir):
    # The learned curation tier above the heuristic/LM gates (CCNet/
    # DCLM shape): bounded deterministic driver-side fit -> corpus-wide
    # expression-only scoring (operators/quality_model.py). The scoring
    # plan is shuffle-free past the scan — the model is 65 integer
    # literals folded per row; pred_quality is integer-sign-exact.
    from finlogic_spark.operators.quality_model import classify_quality

    w, b = _qclf_params(sf_dir)
    d = _t(spark, sf_dir, "documents")
    return classify_quality(d, "text", "doc_id", w, b).orderBy("doc_id")


def _fingerprint_store(spark, sf_dir):
    """Build-once persisted exact-dedup fingerprint store over the
    EVEN-doc_id half of documents (the corpus history; odd ids play
    the ingest batch) — same lifecycle as _postings_index."""
    key = ("fp_store", sf_dir)
    if _ann_cached(key, spark) is None:
        from finlogic_spark.operators.text_dedup import (
            build_fingerprint_store,
        )

        safe = "".join(c if c.isalnum() else "_" for c in sf_dir)
        path = os.path.join(_scratch_root(), f"fp{safe}", "idx")
        build_fingerprint_store(
            _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0),
            path,
            "text",
            "doc_id",
        )
        store = spark.read.parquet(path).persist()
        store.count()
        _ANN_INDEX[key] = store
    return _ANN_INDEX[key]


@q(
    "doc_exact_dedup_incremental",
    f"""
    WITH h AS (
      SELECT doc_id,
             CASE WHEN text IS NOT NULL
                  THEN md5(array_to_string({_TOKS_SQL}, ' ')) END AS hx
      FROM documents),
    store AS (SELECT hx, min(doc_id) AS owner FROM h
              WHERE doc_id % 2 = 0 AND hx IS NOT NULL GROUP BY 1),
    batch AS (SELECT * FROM h WHERE doc_id % 2 = 1),
    bm AS (SELECT hx, min(doc_id) AS bmin FROM batch
           WHERE hx IS NOT NULL GROUP BY 1)
    SELECT b.doc_id, b.hx AS text_hash,
           (b.hx IS NULL
            OR (s.owner IS NULL AND b.doc_id = m.bmin)) AS is_novel,
           CASE WHEN s.owner IS NOT NULL THEN s.owner
                WHEN b.hx IS NOT NULL AND b.doc_id <> m.bmin THEN m.bmin
           END AS dup_of
    FROM batch b LEFT JOIN store s ON b.hx = s.hx
                 LEFT JOIN bm m ON b.hx = m.hx
    ORDER BY doc_id
    """,
)
def doc_exact_dedup_incremental(spark, sf_dir):
    # Incremental ingestion dedup against corpus HISTORY (the missing
    # sibling of the batch exact_dedup and the append-capable LSH/BPE
    # stores): the persisted fingerprint store holds one (hash, owner)
    # row per distinct historical document; each ingest batch joins
    # against it — the only history-sized exchange moves (hash, owner)
    # pairs, never text — and dedups within itself by min id. History
    # precedes the batch: a store owner wins dup_of attribution.
    from finlogic_spark.operators.text_dedup import dedup_against_store

    store = _fingerprint_store(spark, sf_dir)
    batch = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    return dedup_against_store(batch, store, "text", "doc_id").orderBy(
        "doc_id"
    )


_MIX_TARGETS = {f"src{i}": (i + 1) * 1_000_000 // 210 for i in range(20)}
# Scale-proportional mixture budget (r15: the r14 registry rows carried
# an absolute 20k-token budget that was gate-scale — at sf100 it
# deterministically selected NOTHING, a degenerate selection stage at
# exactly the scale the row exists to prove). budget = survivor-total
# // 3 is computed from the SAME bounded per-source aggregate on both
# engines (driver-side Python ints in Spark; a one-row CTE in the
# oracle), so the row selects ~a third of the corpus at sf0.01 AND at
# sf100.
_MIX_BUDGET_DEN = 3


@q(
    "emb_lsh_recall",
    f"""
    -- in-registry recall evaluation of the approximate tier: both
    -- legs are the two component oracles verbatim, joined per query.
    WITH exact5 AS (
      SELECT query_id, vec_id FROM ({ORACLES["emb_cosine_topk"]})),
    lsh5 AS (
      SELECT query_id, vec_id FROM ({ORACLES["emb_lsh_topk"]})),
    hits AS (
      SELECT e.query_id, count(*) AS n_hits
      FROM exact5 e JOIN lsh5 l USING (query_id, vec_id)
      GROUP BY 1)
    SELECT q.query_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM exact5) q
    LEFT JOIN hits h USING (query_id)
    ORDER BY query_id
    """,
)
def emb_lsh_recall(spark, sf_dir):
    # The engine measures its own approximate tier in-registry:
    # recall@5 of the served LSH top-k against the exact brute-force
    # top-k, per query — the quality contract every ANN deployment
    # monitors (tools/measure_recall.py made it an offline study; this
    # makes it a standing query over the same persisted index). Both
    # legs are existing oracle-certified components; the fusion is
    # exact set arithmetic.
    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    corpus = e.select("vec_id", as_double.alias("embedding"))
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), as_double.alias("query_vec")
    )
    exact5 = cosine_topk(corpus, queries, k=5).select("query_id", "vec_id")
    lsh5 = lsh_cosine_topk(
        _lsh_index(spark, sf_dir),
        queries.withColumnRenamed("query_vec", "query_vec"),
        k=5,
        dim=64,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
        probe_radius=_LSH_RADIUS,
        corpus_bucketed=True,
        local_query_probes=True,
    ).select("query_id", "vec_id")
    # r17 (VERDICT r16 item 3): the exact brute-force leg used to be
    # consumed twice — once as the hits join side, once for the
    # distinct query_id frame — re-evaluating the full corpus scoring.
    # One LEFT join + groupBy computes the same per-query hit count
    # over a single exact-leg evaluation (exact5's keys ARE the query
    # set: k rows per query by construction, count counts only
    # matches). Probed 2.9-3.9 -> 2.7-2.9 s (BENCH_r17_probes.json).
    return (
        exact5.join(
            lsh5.withColumn("__hit", F.lit(1)),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("__hit").alias("__nh"))
        .select(
            "query_id",
            F.col("__nh").cast("long").alias("n_hits"),
            (F.col("__nh") / F.lit(5.0)).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


@q(
    "emb_vector_profile",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cls AS (
      SELECT vec_id,
             (v IS NULL) AS is_null,
             (v IS NOT NULL AND len(v) <> 64) AS wrong,
             (v IS NOT NULL AND len(v) = 64) AS ok,
             CASE WHEN v IS NOT NULL AND len(v) = 64
                  THEN len(list_filter(v, x -> x IS NULL OR isnan(x)
                                              OR isinf(x))) > 0
                  ELSE FALSE END AS nonfinite,
             CASE WHEN v IS NOT NULL AND len(v) = 64
                  THEN list_sum(list_transform(range(1, 65),
                                               i -> v[i] * v[i]))
             END AS norm2
      FROM v),
    c2 AS (SELECT *, (ok AND NOT nonfinite) AS clean FROM cls)
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(sum(CASE WHEN wrong THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wrong_dim,
           CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonfinite,
           CAST(sum(CASE WHEN clean AND norm2 = 0.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_zero,
           min(CASE WHEN clean
                    THEN floor(norm2 * 1000000.0 + 0.5) / 1000000.0 END)
             AS min_norm2,
           max(CASE WHEN clean
                    THEN floor(norm2 * 1000000.0 + 0.5) / 1000000.0 END)
             AS max_norm2,
           floor(CAST(sum(CASE WHEN clean THEN
                   CAST(floor(norm2 * 1000000.0 + 0.5) AS BIGINT) END)
                 AS DOUBLE)
                 / greatest(sum(CASE WHEN clean THEN 1 ELSE 0 END), 1)
                 + 0.5) / 1000000.0 AS mean_norm2
    FROM c2
    """,
)
def emb_vector_profile(spark, sf_dir):
    # Vector data-quality profile (operators/profile.vector_profile):
    # the QA gate an embedding-ingest pipeline runs before indexing —
    # nulls, wrong dims, NaN/Inf elements (counted, not silently
    # poisoning aggregates), zero vectors, and norm² extremes/mean in
    # ONE scan + ONE aggregate. Per-row fold order and micro-unit
    # quantization follow the cosine-oracle parity contract.
    from finlogic_spark.operators.profile import vector_profile

    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return vector_profile(
        e.select(as_double.alias("embedding")), "embedding", 64
    )


def _quality_calibration_oracle_sql(sf_dir: str) -> str:
    from finlogic_spark.operators.quality_model import MICRO, N_BUCKETS

    w, b = _qclf_params(sf_dir)
    w_sql = "[" + ", ".join(str(v) for v in w) + "]"
    return f"""
    -- calibration of the learned gate against the heuristic proxy:
    -- per 0.05-logit band, doc count and mean heuristic quality
    -- (exact integer micro-unit mean — order-independent)
    WITH toks AS (SELECT doc_id, text, {_TOKS_SQL} AS ts FROM documents),
    nz AS (SELECT doc_id, text, ts, len(ts) AS n
           FROM toks WHERE len(ts) > 0),
    s AS (SELECT doc_id, text, n,
            CAST(list_sum(list_transform(ts,
              t -> ({w_sql})[
                ('0x' || substr(md5(t), 1, 4))::BIGINT % {N_BUCKETS} + 1
              ])) AS BIGINT)
            + CAST(n AS BIGINT) * CAST({b} AS BIGINT) AS raw
          FROM nz),
    scored AS (
      SELECT doc_id,
             floor(CAST(raw AS DOUBLE) / (CAST(n AS DOUBLE) * {MICRO}.0)
                   * 1000000.0 + 0.5) / 1000000.0 AS logit
      FROM s),
    q AS (SELECT doc_id, floor(logit * 20.0) / 20.0 AS band,
                 CAST(floor(((least(length(text) / 500.0, 1.0)
                   + (1.0 - least((len(regexp_extract_all(text,
                       '[^A-Za-z0-9\\s]'))
                       / greatest(length(text), 1)) * 4.0, 1.0))
                   + CASE WHEN (CAST(list_sum(list_transform({_TOKS_SQL},
                                x -> length(x))) AS DOUBLE)
                          / greatest(len({_TOKS_SQL}), 1)) BETWEEN 3 AND 10
                          THEN 1.0 ELSE 0.5 END) / 3.0)
                   * 1000000.0 + 0.5) AS BIGINT) AS q_micro
          FROM scored JOIN documents USING (doc_id))
    SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(q_micro) AS DOUBLE) / count(*) + 0.5)
             / 1000000.0 AS mean_quality
    FROM q GROUP BY band ORDER BY band
    """


LAZY_ORACLES["doc_quality_calibration"] = _quality_calibration_oracle_sql


@q("doc_quality_calibration")  # data-dependent oracle: LAZY_ORACLES.
def doc_quality_calibration(spark, sf_dir):
    # Evaluation tier for the learned gate: per 0.05-logit band, doc
    # count + mean heuristic quality (the training proxy) — a
    # monotone-ish calibration table is what a curation operator
    # checks before trusting the classifier at 100 TB. Exact integer
    # micro-unit mean (order-independent partial sums), one scan +
    # one bounded groupBy (bands are a few dozen rows).
    from finlogic_spark.functions.text import quality_score
    from finlogic_spark.operators.quality_model import classify_quality

    w, b = _qclf_params(sf_dir)
    d = _t(spark, sf_dir, "documents")
    scored = classify_quality(d, "text", "doc_id", w, b).select(
        "doc_id", (F.floor(F.col("logit") * 20.0) / 20.0).alias("band")
    )
    q = d.select(
        "doc_id",
        F.floor(quality_score("text") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("__qm"),
    )
    return (
        scored.join(q, "doc_id")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.floor(
                    F.sum("__qm").cast("double") / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("mean_quality"),
        )
        .orderBy("band")
    )


def _curation_learned_oracle_sql(sf_dir: str) -> str:
    from finlogic_spark.operators.quality_model import N_BUCKETS

    w, b = _qclf_params(sf_dir)
    w_sql = "[" + ", ".join(str(v) for v in w) + "]"
    wm_vals = ", ".join(
        f"('src{i}', {(i + 1) * 1_000_000 // 210})" for i in range(20)
    )
    return f"""
    -- learned curation pipeline: classifier gate (integer logit >= 0)
    -- -> exact dedup among survivors (min id per canonical hash)
    -- -> domain mixture under a token budget computed over SURVIVOR
    -- token totals (same exact integer arithmetic as doc_domain_mix)
    WITH toks AS (SELECT doc_id, source, {_TOKS_SQL} AS ts FROM documents),
    nz AS (SELECT doc_id, source, ts, len(ts) AS n
           FROM toks WHERE len(ts) > 0),
    s AS (SELECT doc_id, source, ts, n,
            CAST(list_sum(list_transform(ts,
              t -> ({w_sql})[
                ('0x' || substr(md5(t), 1, 4))::BIGINT % {N_BUCKETS} + 1
              ])) AS BIGINT)
            + CAST(n AS BIGINT) * CAST({b} AS BIGINT) AS raw
          FROM nz),
    gate AS (SELECT doc_id, source, n,
                    md5(array_to_string(ts, ' ')) AS hx
             FROM s WHERE raw >= 0),
    reps AS (SELECT hx, min(doc_id) AS keep FROM gate GROUP BY 1),
    surv AS (SELECT g.doc_id, g.source, g.n FROM gate g
             JOIN reps r ON g.hx = r.hx AND g.doc_id = r.keep),
    agg AS (SELECT source, sum(n) AS T FROM surv GROUP BY 1),
    bud AS (SELECT CAST(sum(n) AS BIGINT) // {_MIX_BUDGET_DEN} AS B
            FROM surv),
    w(source, wm) AS (VALUES {wm_vals}),
    r AS (SELECT a.source,
            CASE WHEN a.T <= 0 OR w.wm IS NULL THEN '00'
                 WHEN ((w.wm * bud.B) // 1000000) * 256 // a.T >= 256
                   THEN 'g0'
                 ELSE format('{{:02x}}', CAST(
                        ((w.wm * bud.B) // 1000000) * 256 // a.T
                      AS BIGINT))
            END AS thr
          FROM agg a LEFT JOIN w USING (source), bud)
    SELECT surv.doc_id, surv.source, CAST(surv.n AS BIGINT) AS n_tokens,
           substr(md5('mix|' || CAST(surv.doc_id AS VARCHAR)), 1, 2) < r.thr
             AS kept
    FROM surv JOIN r USING (source)
    ORDER BY doc_id
    """


LAZY_ORACLES["doc_curation_learned"] = _curation_learned_oracle_sql


@q("doc_curation_learned")  # data-dependent oracle: LAZY_ORACLES above.
def doc_curation_learned(spark, sf_dir):
    # The r14 pipeline composed end-to-end — the LEARNED counterpart of
    # doc_curation_pipeline's heuristic gates: classifier gate
    # (expression-only integer logit) -> exact dedup among survivors
    # (one hash-shuffle, min id per canonical class) -> domain mixture
    # under a token budget whose thresholds come from SURVIVOR totals.
    # The token array tokenizes ONCE and feeds all three stages (the
    # logit fold, the canonical hash, the length).
    from finlogic_spark.functions.text import tokens as _tok
    from finlogic_spark.operators.corpus import domain_mix_sample
    from finlogic_spark.operators.quality_model import _logit_from_tokens

    w, b = _qclf_params(sf_dir)
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", _tok(F.col("text")).alias("__ts")
    ).filter(F.size("__ts") > 0)
    gated = base.filter(
        _logit_from_tokens(F.col("__ts"), w, b) >= 0
    ).select(
        "doc_id",
        "source",
        F.size("__ts").cast("long").alias("__n"),
        F.md5(F.array_join("__ts", " ")).alias("__hx"),
    )
    # r16: the tokenize+logit-fold subtree above is consumed by BOTH
    # sides of the dedup semi-join and again by domain_mix's totals
    # aggregate — Spark shares no subplans, so without a barrier the
    # fold ran 3x. One lazy checkpoint materializes it once (measured
    # 2.89 -> 2.03 s alternating A/B, tools/probe_r16.py curation_reuse;
    # the same barrier on doc_curation_pipeline's ded measured a WASH
    # and was left out).
    from pyspark.storagelevel import StorageLevel

    gated = gated.localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    reps = gated.groupBy("__hx").agg(F.min("doc_id").alias("doc_id"))
    surv = gated.join(reps, ["__hx", "doc_id"], "left_semi")
    return domain_mix_sample(
        surv,
        "source",
        "doc_id",
        F.col("__n"),
        _MIX_TARGETS,
        lambda total: total // _MIX_BUDGET_DEN,
    ).orderBy("doc_id")


@q(
    "doc_domain_mix",
    f"""
    -- same exact integer threshold arithmetic as domain_mix_sample:
    -- desired = (w_micro * budget) // 1e6, thr_byte = desired*256 // T
    WITH t AS (SELECT doc_id, source,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents),
    agg AS (SELECT source, sum(n) AS T FROM t GROUP BY 1),
    bud AS (SELECT CAST(sum(n) AS BIGINT) // {_MIX_BUDGET_DEN} AS B FROM t),
    w(source, wm) AS (VALUES {", ".join(
        f"('src{i}', {(i + 1) * 1_000_000 // 210})" for i in range(20)
    )}),
    r AS (SELECT a.source,
            CASE WHEN a.T <= 0 OR w.wm IS NULL THEN '00'
                 WHEN ((w.wm * bud.B) // 1000000) * 256 // a.T >= 256
                   THEN 'g0'
                 ELSE format('{{:02x}}', CAST(
                        ((w.wm * bud.B) // 1000000) * 256 // a.T
                      AS BIGINT))
            END AS thr
          FROM agg a LEFT JOIN w USING (source), bud)
    SELECT t.doc_id, t.source, t.n AS n_tokens,
           substr(md5('mix|' || CAST(t.doc_id AS VARCHAR)), 1, 2) < r.thr
             AS kept
    FROM t JOIN r USING (source)
    ORDER BY doc_id
    """,
)
def doc_domain_mix(spark, sf_dir):
    # Domain-mixture sampling (operators/corpus.domain_mix_sample):
    # fit a Pile/DCLM-style target source mixture under a token budget.
    # One map-side-combining aggregate (per-source totals, bounded
    # collect — the centroids precedent; exact Python-int thresholds,
    # int64 column math would overflow at a 100 TB budget), then one
    # projection with the thresholds as literals and the engine's
    # deterministic hash sample. No join, no RNG, reshuffle-proof.
    from finlogic_spark.functions.text import token_count
    from finlogic_spark.operators.corpus import domain_mix_sample

    d = _t(spark, sf_dir, "documents")
    return domain_mix_sample(
        d,
        "source",
        "doc_id",
        token_count("text"),
        _MIX_TARGETS,
        lambda total: total // _MIX_BUDGET_DEN,
    ).orderBy("doc_id")


_BUDGET_TOKENS = 30_000


def _budget_select_oracle_sql(sf_dir: str) -> str:
    from finlogic_spark.operators.quality_model import MICRO, N_BUCKETS

    w, b = _qclf_params(sf_dir)
    w_sql = "[" + ", ".join(str(v) for v in w) + "]"
    return f"""
    -- same baked weights as doc_quality_classifier; the budget cutoff
    -- is chosen on the BOUNDED 3-dp logit-bucket table (the Spark
    -- side's no-global-sort shape), then applied as one filter.
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
    nz AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
    s AS (SELECT doc_id, n,
            CAST(list_sum(list_transform(ts,
              t -> ({w_sql})[
                ('0x' || substr(md5(t), 1, 4))::BIGINT % {N_BUCKETS} + 1
              ])) AS BIGINT)
            + CAST(n AS BIGINT) * CAST({b} AS BIGINT) AS raw
          FROM nz),
    scored AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             floor(CAST(raw AS DOUBLE) / (CAST(n AS DOUBLE) * {MICRO}.0)
                   * 1000000.0 + 0.5) / 1000000.0 AS logit
      FROM s),
    q AS (SELECT *, floor(logit * 1000.0 + 0.5) / 1000.0 AS q3
          FROM scored),
    buckets AS (SELECT q3, sum(n_tokens) AS tok FROM q GROUP BY 1),
    cum AS (SELECT q3, tok,
                   sum(tok) OVER (ORDER BY q3 DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM buckets),
    cut AS (SELECT min(q3) AS cut FROM cum
            WHERE c - tok < {_BUDGET_TOKENS})
    SELECT doc_id, n_tokens, logit, q3 >= (SELECT cut FROM cut) AS selected
    FROM q ORDER BY doc_id
    """


LAZY_ORACLES["doc_budget_select"] = _budget_select_oracle_sql


@q("doc_budget_select")  # data-dependent oracle: LAZY_ORACLES above.
def doc_budget_select(spark, sf_dir):
    # Budgeted curation ("take the best ~30k tokens by learned
    # quality"): the selection step above the classifier. NO global
    # sort and NO corpus-wide cumulative window — the cutoff comes
    # from a bounded 3-dp logit-bucket aggregate (thousands of rows at
    # any corpus size), then one broadcast threshold filter; the
    # budget is honored to bucket granularity (whole threshold bucket
    # included, deterministic).
    from finlogic_spark.operators.quality_model import (
        select_by_token_budget,
    )

    w, b = _qclf_params(sf_dir)
    d = _t(spark, sf_dir, "documents")
    return select_by_token_budget(
        d, "text", "doc_id", w, b, _BUDGET_TOKENS
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Registry ordering for the driver's correctness gate
# ---------------------------------------------------------------------------

def _promote_newest(names: list[str]) -> None:
    """Re-rank queries REGISTERED MID-FILE (next to their thematic
    siblings) as the newest entries for the interleave below: the
    driver gate's "newest ~25" window keys off registration order, and
    a round's additions defined beside related code would otherwise
    rank as old and fall outside the gate. Call with the current
    round's names, oldest-first, BEFORE _interleave_registry()."""
    for n in names:
        QUERIES[n] = QUERIES.pop(n)  # move to the end of dict order
        REGISTRATION_ORDER.remove(n)
        REGISTRATION_ORDER.append(n)


_promote_newest(
    [
        "doc_cluster_split",
        "doc_epoch_order",
        "doc_substring_excise",
        "doc_training_export",
        "doc_length_batches",
        "doc_curriculum_order",
        "doc_split_drift",
        "doc_split_assign_sticky",
    ]
)


def _interleave_registry() -> None:
    """The driver's hard correctness gate checks only the FIRST 50
    registry entries. Registration order is chronological (oldest
    first), so without this every operator added after entry #50 would
    be invisible to that gate. Interleave newest-first with oldest
    (new[0], old[0], new[1], old[1], ...): the gate's 50-query window
    then always covers the ~25 newest operators (the code most likely
    to have fresh bugs) AND the ~25 oldest core ones (the regressions
    that matter most), while the full 129+-query set keeps running in
    tools/check_oracle.py at both sf0.01 and sf0.1.

    Must stay the LAST statement of this module — any @q registration
    below it would be appended after the interleave ordering.
    """
    global QUERIES
    names = list(QUERIES)
    order: list[str] = []
    seen: set[str] = set()
    for pair in zip(reversed(names), names):
        for n in pair:
            if n not in seen:
                seen.add(n)
                order.append(n)
    QUERIES = {n: QUERIES[n] for n in order}


_interleave_registry()

# Import-time guard for the invariant the docstring above promises: the
# newest registration must sit inside the driver gate's 50-query
# window. This catches a mis-ordered interleave immediately; a @q added
# BELOW this line evades it at import, which is what
# tests/test_registry_order.py (run on the fully-imported module)
# exists to catch.
assert REGISTRATION_ORDER and REGISTRATION_ORDER[-1] in list(QUERIES)[:50], (
    "newest @q registration fell outside the driver gate's 50-query "
    "window — _interleave_registry() must be the last registry mutation"
)
