"""Product-analytics and evaluation operators: conversion funnel,
deterministic mode, distribution-position windows, PII-style masking,
and ANN recall evaluation.

The reference repo declares a football-analytics ETL intent with no code
(SURVEY.md §0); funnels / league-table-style modes / percentile
positions are the canonical queries of that workload class [REF], and
the masking + recall ops extend the LLM-pipeline mandate (scrubbing
identifiers before training; measuring what an ANN index loses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from engine.det import pround
from engine.registry import ORACLES, QUERIES, query
from engine.session import load


@query(
    "events_funnel",
    oracle="""
    WITH c AS (
      SELECT user_id, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT c.user_id, MIN(e.ts) AS first_purchase
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts >= c.first_click
      GROUP BY c.user_id
    )
    SELECT c.user_id, c.first_click, p.first_purchase,
           CAST(CASE WHEN p.first_purchase IS NULL THEN 0 ELSE 1 END AS INT)
             AS converted,
           CAST(CASE WHEN p.first_purchase IS NULL THEN NULL
                     ELSE FLOOR(epoch(p.first_purchase)
                                - epoch(c.first_click))
                END AS BIGINT) AS conv_secs
    FROM c LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first click → first purchase at or
    after it, with conversion flag and seconds-to-convert.

    Two aggregates + a left join — the canonical event-funnel shape. The
    purchase side is *pre-filtered by event type before the join* so the
    join input is a fraction of the event stream; both aggregates
    shuffle on user_id, so AQE plans the second join shuffle-free when
    partitioning is reusable. Seconds are integral (event timestamps are
    second-granularity), so the epoch difference hashes exactly.
    """
    e = load(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        clicks.join(purchases, "user_id", "left")
        .select(
            "user_id",
            "first_click",
            "first_purchase",
            F.when(F.col("first_purchase").isNull(), 0)
            .otherwise(1)
            .cast("int")
            .alias("converted"),
            # fractional-epoch difference (µs-precision timestamps) then
            # floor — unix_timestamp truncates each side *before* the
            # subtraction and disagrees with the oracle by ±1 s
            F.floor(
                F.col("first_purchase").cast("double")
                - F.col("first_click").cast("double")
            )
            .cast("bigint")
            .alias("conv_secs"),
        )
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS cnt
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_mktsegment, o_orderpriority, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM counts)
    SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) with a deterministic tiebreak: the
    most common order priority per market segment.

    Engine-native ``mode()`` functions break ties arbitrarily — useless
    under a cross-engine hash — so the mode is spelled as count +
    row_number with an explicit (count desc, value) total order: the
    portable form, and also the scalable one (two shuffles, both on
    small group keys; the window partitions carry one row per distinct
    value, not per input row).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    counts = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("cnt"), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


@query(
    "win_percentiles",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume,
           NTILE(10) OVER w AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows: percent_rank, cume_dist, decile
    per market segment over account balance (unique total order via the
    c_custkey tiebreak, SURVEY.md §7.5.4).
    """
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        pround(F.percent_rank().over(w), 4).alias("pct_rank"),
        pround(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "llm_pii_mask",
    oracle="""
    SELECT c_custkey,
           REGEXP_REPLACE(c_name, '[0-9]+', '<ID>', 'g') AS masked_name,
           CAST(REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS BIGINT)
             AS extracted_id,
           CAST(LENGTH(c_name) - LENGTH(
             REGEXP_REPLACE(c_name, '[0-9]', '', 'g')) AS INT)
             AS n_digit_chars
    FROM customer
    """,
)
def llm_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier scrubbing, the PII-redaction shape of a training-data
    pipeline: digit runs replaced with a placeholder token, the raw
    identifier extracted to a side column, and a digit-count audit.

    Pure regexp projection — embarrassingly parallel, no shuffle, stays
    in whole-stage codegen. On a real corpus the same shape handles
    emails/phones/SSNs with a pattern list; the fixtures carry digits
    only in entity names, which is what gets scrubbed here.
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "<ID>").alias("masked_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1)
        .cast("bigint")
        .alias("extracted_id"),
        (
            F.length("c_name")
            - F.length(F.regexp_replace("c_name", "[0-9]", ""))
        )
        .cast("int")
        .alias("n_digit_chars"),
    )


def _ann_recall_oracle() -> str:
    # Composes the two registered oracles — passed to @query as a
    # CALLABLE, resolved by registry.resolve_oracles() after all modules
    # import, so analytics_ops may register before llm_ops/scale_ops
    # (the driver's capped sweep walks registration order). DuckDB
    # allows CTE bodies to be subqueries that themselves open WITH
    # clauses.
    exact_sql = ORACLES["llm_cosine_topk"]
    approx_sql = ORACLES["llm_ann_lsh"]
    return f"""
    WITH exact AS (SELECT * FROM ({exact_sql}) x),
    approx AS (SELECT * FROM ({approx_sql}) a)
    SELECT e.probe_id,
           CAST(COUNT(a.vec_id) AS INT) AS n_hit,
           ROUND(CAST(COUNT(a.vec_id) AS DOUBLE) / 3, 4) AS recall_at_3
    FROM exact e
    LEFT JOIN approx a
      ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
    WHERE e.rn <= 3
    GROUP BY e.probe_id
    """


@query("llm_ann_recall", oracle=_ann_recall_oracle)
def llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality evaluation: recall@3 of the LSH-bucketed
    neighbors (llm_ann_lsh) against the exact brute-force top-k
    (llm_cosine_topk), per probe.

    Composes the two registered queries as DataFrames — the evaluation
    loop a production pipeline runs before trusting an index. Both
    inputs are probe-bounded (tiny), so the comparison join broadcasts;
    the expensive parts are the underlying searches themselves.
    """
    exact = QUERIES["llm_cosine_topk"](spark, sf_dir).filter(
        F.col("rn") <= 3
    )
    approx = QUERIES["llm_ann_lsh"](spark, sf_dir)
    hits = exact.alias("e").join(
        approx.alias("a"),
        (F.col("a.probe_id") == F.col("e.probe_id"))
        & (F.col("a.vec_id") == F.col("e.vec_id")),
        "left",
    )
    return (
        hits.groupBy(F.col("e.probe_id").alias("probe_id"))
        .agg(F.count(F.col("a.vec_id")).alias("n_hit_l"))
        .select(
            "probe_id",
            F.col("n_hit_l").cast("int").alias("n_hit"),
            pround(F.col("n_hit_l") / F.lit(3.0), 4).alias("recall_at_3"),
        )
    )
