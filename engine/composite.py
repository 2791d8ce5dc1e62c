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

from engine.det import (
    cents_col,
    cents_sql,
    exact_sum,
    exact_sum_sql,
    pround,
    revenue_e4_col,
    revenue_e4_sql,
)
from engine.registry import query
from engine.session import load

Q3_CUTOFF = "1999-07-01"
Q5_YEAR = 1998


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {exact_sum_sql(revenue_e4_sql("l."), 10000)} AS revenue,
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
        # exact 1e-4-unit revenue sum (r10 quantization audit) — also
        # makes the top-10 membership itself order-stable.
        .agg(exact_sum(revenue_e4_col(), 10000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {exact_sum_sql(revenue_e4_sql("l."), 10000)} AS revenue
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
        # exact 1e-4-unit revenue sum (r10 quantization audit)
        .agg(exact_sum(revenue_e4_col(), 10000).alias("revenue"))
    )


Q7_NATIONS = ("NATION_3", "NATION_7")
Q14_START, Q14_END = "1999-01-01", "1999-04-01"
Q22_CUTOFF = "2000-01-01"


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {exact_sum_sql("volume", 10000)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
             {revenue_e4_sql("l.")} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('{Q7_NATIONS[0]}', '{Q7_NATIONS[1]}')
        AND n2.n_name IN ('{Q7_NATIONS[0]}', '{Q7_NATIONS[1]}')
        AND n1.n_name <> n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between two nations per
    ship year — the supplier's nation on the lineitem side against the
    customer's nation on the orders side.

    Both nation dimensions are pre-filtered to the two probe nations
    BEFORE their joins (each a 2-row broadcast), which turns the
    supplier and customer joins into semi-join-like reductions; the
    inequality (supp ≠ cust) is the only cross-dimension residual. The
    orders⋈lineitem orderkey shuffle is the backbone, as in Q3/Q5 —
    everything else broadcasts. Year extraction stays JVM-side.
    """
    pair = list(Q7_NATIONS)
    n1 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    n2 = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_nationkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        s.join(F.broadcast(n1), s["s_nationkey"] == n1["n_nationkey"])
        .join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_nationkey"))
        .filter(F.col("n_name") != F.col("cust_nation"))
        .select(
            F.col("n_name").alias("supp_nation"),
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            # exact 1e-4-unit revenue (r10 quantization audit)
            revenue_e4_col().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(F.col("volume"), 10000).alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(CAST(100 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN {revenue_e4_sql("l.")}
                            ELSE 0 END) AS DOUBLE)
                 / NULLIF(CAST(SUM({revenue_e4_sql("l.")}) AS DOUBLE), 0),
                 2) AS promo_pct,
           {exact_sum_sql(revenue_e4_sql("l."), 10000)}
             AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_START} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{Q14_END} 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: share of one quarter's revenue from PROMO-type
    parts — a conditional aggregate ratio over a single fact⋈dim join.

    The quarter predicate prunes the lineitem scan (pushdown); part
    broadcasts (it is the smaller side by an order of magnitude and
    joins on its key); both SUMs fold in one partial-aggregate pass, so
    the plan is scan → broadcast-hash-join → two-phase agg with no
    extra shuffle. The 100-multiplier is cast to DOUBLE in the oracle —
    DuckDB decimal-literal arithmetic diverges from Spark doubles.
    """
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q14_START} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q14_END} 00:00:00").cast("timestamp"))
    )
    # exact 1e-4-unit revenue (r10 quantization audit); the 1e4 scale
    # cancels in the promo ratio, so both terms stay exact integers and
    # the single IEEE division at the end is order-independent.
    rev_e4 = revenue_e4_col()
    promo_e4 = F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            pround(
                # try_divide: an all-refunded quarter (Σrev = 0) is an
                # undefined share, not an ANSI abort (zero-values sweep).
                F.try_divide(
                    F.lit(100.0)
                    * F.sum(promo_e4.cast("decimal(38,0)")).cast("double"),
                    F.sum(rev_e4.cast("decimal(38,0)")).cast("double"),
                ),
                2,
            ).alias("promo_pct"),
            exact_sum(rev_e4, 10000).alias("total_revenue"),
        )
    )


@query(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT {exact_sum_sql(revenue_e4_sql("l."), 10000)}
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: revenue from three disjunctive brand/size/
    quantity predicate branches — the classic OR-of-ANDs join predicate
    that exercises Catalyst's CNF extraction.

    The full disjunction references both join sides, so it cannot be
    pushed as-is; Catalyst extracts the per-side common denominators
    (brand ∈ {12,23,3} ∧ size ≤ 35 on part, quantity ∈ [1,40] on
    lineitem) and pushes those to the scans, leaving the cross-side
    residual on the broadcast join. The plan test asserts the extracted
    brand filter reaches the part scan.
    """
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    q, br, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((br == "Brand#12") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#23") & sz.between(1, 25) & q.between(10, 30))
        | ((br == "Brand#3") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            # exact 1e-4-unit revenue sum (r10 quantization audit)
            exact_sum(revenue_e4_col(), 10000).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q22_dormant_customers",
    oracle=f"""
    WITH avg_bal AS (
      -- exact cents mean, unrounded (it is a THRESHOLD, not an output):
      -- SUM(BIGINT)/COUNT/100.0 is the same IEEE division chain the
      -- Spark side computes, so the filter membership cannot flip with
      -- accumulation order (r10 quantization audit).
      SELECT CAST(SUM({cents_sql("c_acctbal")}) AS DOUBLE)
             / COUNT(c_acctbal) / 100.0 AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00'
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_custs,
           {exact_sum_sql(cents_sql("c.c_acctbal"), 100)} AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.avg_bal
      AND NOT EXISTS (SELECT 1 FROM recent r
                      WHERE r.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: above-average-balance customers with no order
    since the cutoff (the fixture has no order-less customers, so
    "never ordered" becomes "dormant since") — per market segment.

    Shape: a 1-row global average broadcast into the customer filter
    (BNLJ over a single row, whitelisted in the plan sweep), then a
    LEFT ANTI join against the date-pruned recent-orders keys. The anti
    join shuffles on custkey — at scale both sides are large, so the
    shuffle (not a broadcast of all recent buyers) is the right shape;
    AQE downgrades it to broadcast when the pruned side is small.
    """
    c = load(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        # exact cents mean, unrounded — same division chain as the
        # oracle CTE, so the threshold is order-independent.
        .agg(
            (
                F.sum(
                    cents_col(F.col("c_acctbal")).cast("decimal(38,0)")
                ).cast("double")
                / F.count("c_acctbal")
                / 100.0
            ).alias("avg_bal")
        )
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit(f"{Q22_CUTOFF} 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("c_acctbal")), 100).alias("total_bal"),
        )
    )
