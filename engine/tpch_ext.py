"""TPC-H analog batch 3 (Q4/Q6/Q15/Q17/Q20 shapes), adapted to the
fixture schema (no commitdate/receiptdate/partsupp — lateness is
ship-vs-order-date, supply relationships come from lineitem; dates span
1995-2001, FIXTURES.md).

Registered AFTER the proven families: these are round-4 correctness-
window seeds (the driver's 50-row cap is spoken for this round — see
engine/__init__), but they are fully oracled and covered by the local
differential suite immediately.

Determinism notes: l_quantity is integral-valued (verified), so its
sums/averages are exact in f64 and cross-engine comparisons against
quantity-derived thresholds (Q17's 0.5×avg, Q20's quantity floor) are
bit-stable, not ulp-lottery. Monetary aggregates go through the portable
round as everywhere else.
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

Q4_Q_START = "1998-01-01"
Q4_Q_END = "1998-04-01"
Q4_LATE_DAYS = 60
Q6_YEAR = 1998
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY_MAX = 24.0
Q15_Q_START = "1998-01-01"
Q15_Q_END = "1998-04-01"
Q17_FRACTION = 0.5
Q20_YEAR = 1998
Q20_MIN_QTY = 60.0  # ≈ p99 of per-(supp,part) yearly quantity at sf0.01


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_Q_START} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{Q4_Q_END} 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order-priority checking): orders placed in one
    quarter having at least one line shipped more than {Q4_LATE_DAYS}
    days after the order date (the fixture's lateness signal — there is
    no commit/receipt date), counted by priority.

    The EXISTS compiles to a left-semi hash join on orderkey with the
    lateness predicate as a join residual; the quarter filter is pushed
    into the orders scan, and the lineitem side carries the *derived*
    pushable bound shipdate > quarter_start + {Q4_LATE_DAYS}d (implied
    by the correlated predicate: a line late for a quarter order must
    ship after the quarter opened plus the lateness window), so BOTH
    fact scans prune before the join. Two columns read from each side
    at 100 TB.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_Q_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_Q_END).cast("timestamp"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(
            F.col("l_shipdate")
            > F.lit(Q4_Q_START).cast("timestamp")
            + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAY")
        )
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAY")
    )
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {exact_sum_sql(
                cents_sql("l_extendedprice")
                + " * " + cents_sql("l_discount"),
                10000,
           )} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01 00:00:00'
      AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_QTY_MAX}
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog (forecasting revenue change): the would-be
    revenue delta of eliminating a discount band for small quantities in
    one year — a pure scan-filter-aggregate with THREE pushable
    predicates and a two-column read schema. The simplest query here,
    and the purest pushdown benchmark: at 100 TB the entire query is a
    parquet scan with row-group pruning and a partial-sum reduce.
    """
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp"))
        & (
            F.col("l_shipdate")
            < F.lit(f"{Q6_YEAR + 1}-01-01").cast("timestamp")
        )
        & F.col("l_discount").between(Q6_DISC_LO, Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY_MAX)
    )
    return f.agg(
        # exact 1e-4-unit sum (r10 quantization audit): cents(price) ×
        # cents(discount) = price·discount in exact 1e-4 units.
        exact_sum(
            cents_col(F.col("l_extendedprice"))
            * cents_col(F.col("l_discount")),
            10000,
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {exact_sum_sql(revenue_e4_sql(), 10000)} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_Q_START} 00:00:00'
        AND l_shipdate < TIMESTAMP '{Q15_Q_END} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY r.total_rev DESC, s.s_suppkey
    LIMIT 1
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog (top supplier): the supplier with the highest
    quarter revenue. The original's view + scalar-max self-join is
    spelled as order-by-limit-1 over the per-supplier aggregate with a
    rounded revenue key and a suppkey tiebreak — deterministic across
    engines (raw-double max-equality joins are an ulp lottery), and it
    plans as TakeOrderedAndProject over dimension-bounded aggregate
    rows, not a global sort.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_Q_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_Q_END).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        # exact 1e-4-unit revenue sum (r10 quantization audit) — the
        # top-1 ranking key must not drift with accumulation order.
        exact_sum(revenue_e4_col(), 10000).alias("total_rev")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(s, rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy(F.desc("total_rev"), "s_suppkey")
        .limit(1)
    )


@query(
    "q17_small_quantity",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM({cents_sql("l.l_extendedprice")}) AS DOUBLE)
                 / 700.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < {Q17_FRACTION} * pa.avg_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity-order revenue): revenue locked
    in orders below half their part's average quantity.

    The correlated average decorrelates to one per-part aggregate
    joined back to lineitem on partkey — both sides share the partkey
    shuffle. The threshold compare is exact cross-engine: l_quantity is
    integral-valued, so the per-part sums (and hence averages) are
    exact in f64, not summation-order noise.
    """
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    j = li.join(pa, li["l_partkey"] == pa["pk"]).filter(
        F.col("l_quantity") < Q17_FRACTION * F.col("avg_qty")
    )
    return j.agg(
        # exact cents sum (r10 quantization audit); /700 folds the cents
        # scale and the 7-year window into one IEEE division.
        pround(
            F.sum(
                cents_col(F.col("l_extendedprice")).cast("decimal(38,0)")
            ).cast("double")
            / 700.0,
            2,
        ).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH heavy AS (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '{Q20_YEAR + 1}-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > {Q20_MIN_QTY}
    )
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (potential part promotion): suppliers that moved
    more than {Q20_MIN_QTY} units of some single part in one year
    (fixtures carry no partsupp, so the supply relationship IS the
    lineitem history), listed with their nation.

    The year filter pushes into the scan; the heavy aggregate groups on
    (suppkey, partkey) and its HAVING uses exact integral-quantity
    sums; the IN compiles to a left-semi join and the nation dim
    broadcasts. One fact shuffle end-to-end.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp"))
        & (
            F.col("l_shipdate")
            < F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp")
        )
    )
    heavy = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("n_name", "s_suppkey", "s_name")
    )
