"""Composite multi-join analytics queries (TPC-H-shaped).

Single operators prove primitives; these prove the *composition* — the
deep join trees + selective filters + aggregate + top-k pipelines that a
football-analytics / OLAP workload actually runs [REF: the reference
declares a batch analytics ETL intent and ships no code, SURVEY.md §0].
Modeled on TPC-H Q3 (shipping priority) and Q5 (local supplier volume),
adapted to the fixture schema (orders carry o_orderpriority, not
o_shippriority; dates span ≈1997-2001, FIXTURES.md).

Scale notes: both plans are the canonical star-join shape — selective
dimension filters reach the parquet scans (predicate pushdown), the
small dimensions broadcast, and the one unavoidable fact-fact shuffle
(orders⋈lineitem on orderkey) is the plan's backbone; AQE handles the
rest. Q3's top-10 plans as TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.det import pround
from engine.registry import query
from engine.session import load

Q3_CUTOFF = "1999-07-01"
Q5_YEAR = 1998


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top-10 unshipped-revenue orders for one market
    segment — customer⋈orders⋈lineitem with filters on all three
    inputs, grouped revenue, ordered take-10.

    The segment and date predicates are applied *before* the joins so
    pushdown prunes the scans; customer (filtered, tiny) broadcasts;
    orders⋈lineitem shuffles on the orderkey; the LIMIT plans as
    TakeOrderedAndProject (per-partition top-10 then merge — no global
    sort). Unique total order via the orderkey tiebreak (SURVEY §7.5.4).
    """
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{Q3_CUTOFF} 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{Q3_CUTOFF} 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '{Q5_YEAR}-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{Q5_YEAR + 1}-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: revenue from orders where the supplier is in the
    customer's own nation, per nation of one region and one order year —
    the six-table star join (customer, orders, lineitem, supplier,
    nation, region).

    region/nation/supplier are broadcast dimensions (region pre-filtered
    to one row); the local-supplier condition (c_nationkey =
    s_nationkey) rides on the lineitem⋈supplier broadcast join rather
    than forcing an extra shuffle; the only large shuffle is
    orders⋈lineitem. The year predicate prunes the orders scan.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q5_YEAR}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q5_YEAR + 1}-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
