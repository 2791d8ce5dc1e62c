"""TPC-H analog batch 4 (Q2/Q8/Q11/Q12/Q13/Q16/Q21 shapes), adapted to
the fixture schema: there is no partsupp table, so supply relationships
derive from lineitem's (l_partkey, l_suppkey) pairs with unit cost
MIN(l_extendedprice / l_quantity); there is no shipmode/commitdate, so
Q12/Q21 lateness is ship-vs-order-date (the same adaptation tpch_ext
uses for Q4); there is no o_comment, so Q13's exclusion predicate is an
order-priority class instead.

Round-4 additions registered INSIDE the correctness window (see
engine/__init__) — new operators get a driver row the round they land.

Determinism (SURVEY.md §7.5): every count is exact; l_quantity is
integral-valued so quantity sums are exact in f64 regardless of
summation order (Q11's threshold compare is therefore bit-stable, not
an ulp lottery); Q2 orders by a per-pair MIN of a single IEEE division
(selection, not summation — identical on both engines) with a suppkey
tiebreak; Q8's revenue ratio follows the q14 convention (portable round
on the ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from engine.det import (
    exact_sum,
    exact_sum_sql,
    pround,
    revenue_e4_col,
    revenue_e4_sql,
)
from engine.registry import query
from engine.session import load

Q2_REGION = "EUROPE"
Q2_SIZE_MAX = 10  # p_size <= bound keeps the result dimension-sized
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_3"  # the nation whose market share is measured
Q8_TYPE = "PROMO"
Q11_NATION = "NATION_7"
Q11_FRACTION = 0.002  # share-of-total threshold on supplied quantity
Q12_LATE_DAYS = 30
Q13_EXCLUDED_PRIORITY = "1-URGENT"
Q16_EXCLUDED_BRAND = "Brand#1"
Q21_LATE_DAYS = 60


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / NULLIF(l_quantity, 0)) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), regional AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{Q2_REGION}'
    ), ranked AS (
      SELECT p.p_partkey, p.p_brand, p.p_type,
             g.s_suppkey, g.s_name, g.n_name, sp.unit_cost,
             ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY sp.unit_cost, g.s_suppkey) AS rn
      FROM part p
      JOIN supply sp ON sp.l_partkey = p.p_partkey
      JOIN regional g ON g.s_suppkey = sp.l_suppkey
      WHERE p.p_size <= {Q2_SIZE_MAX}
    )
    SELECT p_partkey, p_brand, p_type, s_suppkey, s_name, n_name,
           ROUND(unit_cost, 2) AS unit_cost
    FROM ranked WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (minimum-cost supplier): for each small part, the
    cheapest {Q2_REGION} supplier by observed unit cost (fixture has no
    partsupp — supply pairs and their cost come from lineitem).

    Plan shape: the lineitem aggregate shuffles once on (partkey,
    suppkey) — at 100 TB that is the only data-sized exchange. The
    supplier⋈nation⋈region pruned dimension broadcasts into it, part
    broadcasts with the p_size predicate pushed to its scan, and the
    per-part argmin is a window over the already partkey-clustered
    aggregate. The tiebreak (unit_cost, then suppkey) makes the winner
    deterministic: MIN of a single division is value-selection, exact
    on both engines.
    """
    supply = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            # try_divide: a zero-quantity line (fully returned/cancelled)
            # must yield a NULL unit cost MIN skips, not an ANSI abort;
            # the oracle's NULLIF denominator makes that NULL explicit
            # instead of relying on DuckDB-1.0.0's NULL-on-div0 default
            # (ADVICE r6: newer duckdb yields inf there).
            F.min(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
            ).alias("unit_cost")
        )
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    regional = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= Q2_SIZE_MAX)
    rn = F.row_number().over(
        W.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    )
    return (
        supply.join(F.broadcast(regional), supply["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(p), supply["l_partkey"] == p["p_partkey"])
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "s_suppkey",
            "s_name",
            "n_name",
            "unit_cost",
        )
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "s_suppkey",
            "s_name",
            "n_name",
            pround(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             {revenue_e4_sql("l.")} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                          THEN volume ELSE 0 END) AS DOUBLE)
                 / NULLIF(CAST(SUM(volume) AS DOUBLE), 0), 4)
             AS mkt_share,
           {exact_sum_sql("volume", 10000)} AS total_volume
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (national market share): {Q8_NATION}'s share of
    {Q8_REGION}-market revenue for {Q8_TYPE} parts, per order year.

    Star-join scale shape: every dimension (part pruned on type,
    customer⋈nation⋈region pruned on region, supplier⋈nation) broadcasts;
    lineitem⋈orders is the one data-sized join, on the orderkey both
    facts can be bucketed by. The conditional-sum ratio folds into one
    partial-aggregate pass over bounded (year) keys — q14's convention
    (portable-rounded ratio) makes the double division comparable.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    s = load(spark, sf_dir, "supplier")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    cust_region = (
        c.join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n2), s["s_nationkey"] == F.col("n2_key")
    ).select("s_suppkey", "supp_nation")
    # exact 1e-4-unit revenue (r10 quantization audit); the scale
    # cancels in the share ratio, total divides once at the end.
    vol = revenue_e4_col()
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust_region), o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        pround(
            # try_divide: a zero-volume year is an undefined share, not
            # an ANSI abort (zero-values exact sweep).
            F.try_divide(
                F.sum(
                    F.when(F.col("supp_nation") == Q8_NATION, F.col("volume"))
                    .otherwise(F.lit(0).cast("bigint"))
                    .cast("decimal(38,0)")
                ).cast("double"),
                F.sum(F.col("volume").cast("decimal(38,0)")).cast("double"),
            ),
            4,
        ).alias("mkt_share"),
        exact_sum(F.col("volume"), 10000).alias("total_volume"),
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH supplied AS (
      SELECT l.l_partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = '{Q11_NATION}'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(qty AS BIGINT) AS supplied_qty
    FROM supplied
    WHERE qty > {Q11_FRACTION} * (SELECT SUM(qty) FROM supplied)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock): parts whose quantity supplied
    by {Q11_NATION} suppliers exceeds {Q11_FRACTION} of that nation's
    total supplied quantity (fixture has no partsupp — supplied volume
    comes from lineitem).

    The per-part aggregate shuffles once on partkey (supplier⋈nation
    prunes FIRST and broadcasts, so non-{Q11_NATION} rows never enter
    the shuffle); the grand total is a 1-row re-aggregate of the same
    frame, broadcast back into the filter. l_quantity is integral, so
    both sums are exact in f64 and the threshold compare is bit-stable
    across engines — no rounding needed.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    nat_supp = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey")
    supplied = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total = supplied.agg(
        (F.sum("qty") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        supplied.join(F.broadcast(total))
        .filter(F.col("qty") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("qty").cast("bigint").alias("supplied_qty"),
        )
    )


@query(
    "q12_late_priority",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
    GROUP BY l.l_returnflag
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (shipping-priority audit): among lines shipped
    more than {Q12_LATE_DAYS} days after the order date, how many came
    from high- vs low-priority orders, by return flag (the fixture's
    categorical line attribute — it has no shipmode column; lateness is
    ship-vs-order-date as in q4).

    One orderkey join (the facts' natural co-partition key — bucketable
    at ingest so the join needs no exchange), lateness as a join
    residual, then a two-phase conditional-count aggregate over the
    3-value flag domain. Counts are exact; no rounding anywhere.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAY")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle=f"""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (customer order distribution): the histogram of
    per-customer order counts, zero-order customers included via the
    left join, excluding {Q13_EXCLUDED_PRIORITY} orders (the fixture has
    no o_comment for the original's 'special requests' pattern — an
    order-priority class is the analogous exclusion).

    Two-level aggregation: orders shuffles once on custkey (the
    exclusion filter prunes before the exchange), the outer histogram
    groups on the bounded c_count domain — classic map-side-combine
    friendly. COUNT of a nullable key handles the left-join zeros
    identically on both engines.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q16_parts_supplier",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (parts/supplier relationship): distinct supplier
    counts per (brand, type, size), excluding one brand and suppliers in
    deficit (the fixture's stand-in for the original's complaint
    exclusion; supply pairs come from lineitem — no partsupp).

    The NOT IN compiles to a broadcast anti-join against the ~1%-of-
    suppliers exclusion list; part broadcasts with the brand predicate
    pushed. The COUNT(DISTINCT) is the one data-sized shuffle —
    Spark expands it to a two-phase distinct-then-count, partial
    aggregation deduping (group-keys × suppkey) map-side first.
    """
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") != Q16_EXCLUDED_BRAND
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle=f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
    ), all_f AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_f l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): per
    supplier, the finalized multi-supplier orders where it was the ONLY
    late supplier (lateness = shipped > {Q21_LATE_DAYS} days after the
    order date; the fixture has no receipt/commit dates).

    The EXISTS / NOT EXISTS pair compiles to a semi- and an anti-join,
    both keyed on orderkey — the same key as the fact⋈fact join, so
    under AQE the three joins share one orderkey clustering. The late
    set is distinct-reduced per (order, supplier) before the quadratic
    self-comparison, bounding it by participating pairs, and the final
    count groups on the supplier dimension.
    """
    o_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    all_f = li.join(
        o_f, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey")
    late = (
        li.join(
            o_f,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
            ),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = all_f.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sk")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    l1 = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("k"))
            & (F.col("l_suppkey") != F.col("sk")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(F.broadcast(s), l1["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )
