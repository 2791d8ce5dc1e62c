"""Round-2 operator additions: SQL-surface subqueries, sessionization,
exact-percentile and histogram aggregates, a TPC-H Q18 analog, and two
LLM-pipeline compositions (eval-set decontamination, end-to-end dedup →
quality → split funnel).

The reference repo declares a batch-analytics ETL intent with no code
(SURVEY.md §0 — README.md:1-2 + LICENSE are its complete contents), so
these extend SURVEY.md §2.L along the two axes the mandate grades:
classic OLAP composition (subqueries, sessionization, heavy-hitter
joins) and LLM-training-corpus hygiene (decontamination is the
train/eval-leakage check every corpus build runs).

SQL-surface queries (``sql_*``) run the *same SQL text* through both
engines — ``spark.sql`` over temp views here, DuckDB in the oracle —
with only the portable-rounding rewrite applied to each side, proving
the SQL entry point (SURVEY.md §3.3) end-to-end: Catalyst decorrelates
EXISTS / scalar subqueries into semi / left-outer joins rather than
re-executing per row.

Scale notes (100 TB): every operator here is join + aggregate + window
shaped — no driver-side data, no Python row path. Sessionization
shuffles once on user_id and computes both windows on that one
partitioning; decontamination's eval shingle set is the small side by
construction (the eval split is a fixed hash fraction) and broadcasts;
Q18's heavy-hitter filter is aggregate-pushdown-shaped (the HAVING
prunes before the dimension joins).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from engine.det import (
    cents_col,
    cents_sql,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
    portable_round_sql,
    pround,
    revenue_e4_col,
    revenue_e4_sql,
)
from engine.splits import SPLIT_CASE_SQL, split_col
from engine.registry import query
from engine.session import load

SESSION_GAP_SECS = 28_800  # 8 h: ~half the fixture inter-event gaps
Q18_QTY_THRESHOLD = 250.0  # ≈ top 1.5% of orders by total quantity
QUALITY_MIN_CHARS = 100
QUALITY_MIN_TOKENS = 20


# ---------------------------------------------------------------------------
# SQL-surface entry point: identical SQL text on both engines.
# ---------------------------------------------------------------------------

# The mean folds exact integer cents (r10 quantization audit):
# SUM(BIGINT)/COUNT, not AVG — same rationale as _SCALAR_SQL below.
# BIGINT headroom: ≤1e6 cents × ~1.5e9 customers ≈ 1.5e15 « 2^63.
_EXISTS_SQL = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT))
                 / COUNT(c.c_acctbal) / 100.0, 2) AS avg_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
"""


@query("sql_exists_subquery", oracle=_EXISTS_SQL)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS via the SQL entry point: segments
    of customers with ≥1 urgent order and no completed ('F') order.

    The same SQL string runs on both engines. Catalyst decorrelates the
    two subqueries into a left-semi and a left-anti join on c_custkey —
    no per-row re-execution — so at scale this is two hash joins against
    a pre-filtered orders projection, each pushdown-pruned to the two
    columns the subquery touches.
    """
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(portable_round_sql(_EXISTS_SQL))


# The correlated aggregate averages EXACT INTEGER CENTS, not doubles:
# AVG(double) folds the group in arbitrary order and the accumulated
# half-ulp drift flips the 2-decimal rounding with input row order
# (caught by tests/test_row_order.py at sf0.01 — cust_avg flapped
# 148099.75↔.76 between shuffled and canonical fixtures). The mean is
# therefore SUM(BIGINT cents) / COUNT — the sum is exact on both
# engines (Spark LONG, DuckDB HUGEINT) at ANY accumulation order, with
# the IEEE divisions deferred to the very end. NOT AVG(BIGINT): Spark's
# Average keeps a DOUBLE sum buffer for non-decimal inputs, so past
# 2^53 accumulated cents (~1.8e8 orders on one hot customer at 100 TB
# skew) the quantized AVG would go order-dependent again (ADVICE r8).
# COUNT(o2.o_totalprice) matches AVG's NULL-skipping and is >= 1 for
# every surviving outer row (the outer order itself is in the group).
_SCALAR_SQL = """
    SELECT o.o_orderkey, o.o_custkey,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND((SELECT SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5)
                                  AS BIGINT))
                         / COUNT(o2.o_totalprice) / 100.0 FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey), 2) AS cust_avg
    FROM orders o
    WHERE o.o_totalprice >
          1.5 * (SELECT SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5)
                                 AS BIGINT))
                        / COUNT(o2.o_totalprice) / 100.0 FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
"""


@query("sql_scalar_subquery", oracle=_SCALAR_SQL)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via the SQL entry point: orders priced
    >1.5× their customer's average order value.

    Catalyst rewrites the correlated aggregate into one per-customer
    aggregation joined back to orders (the subquery body is evaluated
    once, not per outer row), so the plan is aggregate + self-join on
    o_custkey — a single reusable shuffle partitioning at scale.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(portable_round_sql(_SCALAR_SQL))


# ---------------------------------------------------------------------------
# Sessionization (batch gap-based; the streaming session window is
# stream_session in engine.streaming).
# ---------------------------------------------------------------------------


@query(
    "win_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch(ts) - LAG(epoch(ts)) OVER w > {SESSION_GAP_SECS}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS BIGINT)
               AS session_idx
      FROM g
    )
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           CAST(FLOOR(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT)
             AS session_secs,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM s GROUP BY 1, 2
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > SESSION_GAP_SECS (8 h); per-session event count, duration,
    purchases.

    The lag/is-new/running-sum idiom — the canonical batch sessionizer.
    One shuffle on user_id serves both window passes AND the final
    grouped aggregate (all three are user_id-partitioned, so Catalyst
    plans a single Exchange). Ordering ties are impossible: event_id is
    unique within a user. At 100 TB this is the shape you want —
    per-user state never materializes outside its partition.
    """
    return sessionize(load(spark, sf_dir, "events"), SESSION_GAP_SECS)


def sessionize(e: DataFrame, gap_secs: float) -> DataFrame:
    """Sessionize any (user_id, event_id, ts, event_type) DataFrame —
    the win_sessionize logic, factored for property tests over
    hypothesis-generated event streams."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Fractional epoch seconds (µs-precision timestamps): unix_timestamp
    # truncates each side before subtracting and disagrees with the
    # oracle's epoch() by ±1 s — same pitfall as events_funnel.
    secs = F.col("ts").cast("double")
    is_new = (
        F.when(
            F.lag("ts").over(w).isNull()
            | ((secs - F.lag(secs).over(w)) > gap_secs),
            1,
        )
        .otherwise(0)
        .alias("is_new")
    )
    return (
        e.select("user_id", "event_id", "ts", "event_type", is_new)
        .withColumn("session_idx", F.sum("is_new").over(w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.floor(F.max(secs) - F.min(secs)).cast("bigint").alias("session_secs"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregates: exact percentiles, fixed-bin histogram.
# ---------------------------------------------------------------------------


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 4) AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.90), 4) AS p90,
           ROUND(QUANTILE_CONT(l_quantity, 0.50), 4) AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linearly-interpolated percentiles per return flag.

    Spark's ``percentile`` and DuckDB's ``QUANTILE_CONT`` share the
    same definition (sort, index = q·(n−1), linear interpolation
    between neighbors) and agree bit-for-bit on the fixtures — verified
    before rounding was added. Exact percentiles need the full sorted
    group (one shuffle); at 100 TB the scale path is
    ``approx_percentile`` (t-digest, mergeable map-side) — registered
    as agg_approx_distinct's family — while this operator is the exact
    witness.

    The four price percentiles come from ONE array-argument
    ``percentile`` call: separate calls each build their own per-group
    sort buffer of the full column (4× the state and 4 sorts), while
    the array form buffers and sorts once — measured ~2× faster at
    sf0.1.
    """
    li = load(spark, sf_dir, "lineitem")
    qs = (0.25, 0.50, 0.75, 0.90)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(q) for q in qs])
            ).alias("ps"),
            pround(F.percentile("l_quantity", 0.50), 4).alias("med_qty"),
        )
        .select(
            "l_returnflag",
            "n_items",
            *[
                pround(F.col("ps")[i], 4).alias(f"p{int(q * 100)}")
                for i, q in enumerate(qs)
            ],
            "med_qty",
        )
    )


N_HIST_BINS = 10


@query(
    "agg_histogram",
    oracle=f"""
    WITH r AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(CASE WHEN hi > lo
                     THEN LEAST(FLOOR((o_totalprice - lo)
                                      / ((hi - lo) / {N_HIST_BINS})),
                                {N_HIST_BINS - 1})
                     ELSE 0 END AS INT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           {exact_avg_sql(cents_sql("o_totalprice"), 100)} AS avg_price
    FROM orders, r
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of order totals over the observed [min, max]
    range: N_HIST_BINS equal-width buckets, per-bucket count and price
    stats.

    Two-phase: a 1-row global min/max aggregate broadcast-cross-joined
    into the bucketing projection (same 1-row-broadcast shape as
    llm_tfidf_topterms), then one grouped aggregate on the bucket id.
    The bucket expression is pure IEEE-754 arithmetic (subtract, divide,
    floor) so both engines bin identically; the top edge folds into the
    last bucket. At scale: one pass for min/max, one shuffle on ≤10
    keys.
    """
    o = load(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / N_HIST_BINS
    # Degenerate range (all values equal — e.g. a 1-row slice): every
    # row lands in bucket 0 instead of dividing by a zero width.
    bucket = (
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                F.lit(N_HIST_BINS - 1),
            ),
        )
        .otherwise(0)
        .cast("int")
    )
    return (
        o.crossJoin(F.broadcast(rng))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            pround(F.min("o_totalprice"), 2).alias("min_price"),
            pround(F.max("o_totalprice"), 2).alias("max_price"),
            # exact cents mean (r10 quantization audit); min/max are
            # order-independent selections and stay raw.
            exact_avg(cents_col(F.col("o_totalprice")), 100).alias(
                "avg_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 analog: heavy-hitter orders.
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD}
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog (large-volume customer): top-100 orders whose
    total lineitem quantity exceeds Q18_QTY_THRESHOLD, with customer
    name.

    The HAVING aggregate runs FIRST and is selective (~1.5% of orders
    qualify at the fixture threshold), so the expensive fact table
    collapses to a heavy-hitter key list before any join. The orders
    join reuses the orderkey partitioning of the aggregate (no second
    fact shuffle under AQE); customer is dimension-sized and
    broadcasts. Top-100 plans as TakeOrderedAndProject — per-partition
    top-k then a driver merge, never a global sort. Quantities are
    integral doubles, so the SUM is exact on both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            pround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query("agg_approx_quantile")
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per return flag — the SCALE PATH of
    agg_percentile (no-oracle: sketch internals are engine-specific, so
    the driver gets the rows-only check; the tolerance contract vs the
    exact percentiles is asserted in tests/test_ext_ops.py).

    ``approx_percentile`` builds a bounded-memory Greenwald-Khanna
    sketch per group that merges associatively map-side — at 100 TB the
    exact percentile's full per-group sort buffer is not an option, and
    this is the operator you run instead: one partial-aggregate pass,
    sketch size (here ±1/10000 rank error) independent of group row
    count.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.expr(
                "approx_percentile(l_extendedprice,"
                " array(0.25, 0.5, 0.75, 0.9), 10000)"
            ).alias("ps"),
        )
        .select(
            "l_returnflag",
            "n_items",
            *[
                pround(F.col("ps")[i], 4).alias(f"ap{p}")
                for i, p in enumerate((25, 50, 75, 90))
            ],
        )
    )


@query(
    "llm_token_regex",
    oracle="""
    WITH pre AS (
      SELECT doc_id,
             UNNEST(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]'))
               AS tok
      FROM documents
    ), sub AS (
      SELECT doc_id, UNNEST(regexp_extract_all(tok, '.{1,4}')) AS piece
      FROM pre
    ), p AS (
      SELECT doc_id, COUNT(*) AS n_pretok FROM pre GROUP BY doc_id
    ), s AS (
      SELECT doc_id, COUNT(*) AS n_subword,
             COUNT(DISTINCT piece) AS n_piece_vocab
      FROM sub GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_pretok, s.n_subword, s.n_piece_vocab
    FROM p JOIN s ON p.doc_id = s.doc_id
    """,
)
def llm_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-based tokenization: GPT-style pretokenizer (runs of
    alphanumerics, or single punctuation) then fixed-width subword
    chunking (≤4 chars — the BPE-piece-count proxy), with the
    per-document piece vocabulary size.

    Complements llm_token_count's whitespace+⌈len/4⌉ heuristic with
    the regex path the tokenizer-parity audits actually run. Both
    stages are JVM-side ``regexp_extract_all`` + explode (no Python);
    the two aggregates share the doc_id key, so the join after them is
    co-partitioned and shuffle-free under AQE. The pattern is engine-
    portable (character classes only — no \\w/\\b unicode semantics to
    disagree on).
    """
    d = load(spark, sf_dir, "documents")
    pre = d.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")
        ).alias("tok"),
    )
    sub = pre.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(tok, '.{1,4}', 0)")).alias(
            "piece"
        ),
    )
    p = pre.groupBy("doc_id").agg(F.count("*").alias("n_pretok"))
    s = sub.groupBy("doc_id").agg(
        F.count("*").alias("n_subword"),
        F.countDistinct("piece").alias("n_piece_vocab"),
    )
    return p.join(s, "doc_id")


# ---------------------------------------------------------------------------
# Runtime-filter join: semi-join reduction via Spark's injected bloom
# filter.
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    # The injection heuristics compare CREATION side size (must be under
    # the threshold — the bloom is built from it) and APPLICATION side
    # scan size (must be over its threshold — pruning must be worth it).
    # The fixture tables are far below the production default of 10 GB
    # application-side, so the thresholds are forced for the witness;
    # at real scale the defaults fire on exactly this plan shape.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Large-large regime: broadcast off so the join is the sort-merge
    # a 100 TB fact-fact join would be.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def bloom_confs(spark: SparkSession):
    """Set the bloom-injection thresholds for the duration of a plan's
    resolution AND execution (plans resolve at action time, so the
    restore must not run before the collect). Shared by the registered
    query and the plan test."""
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def bloom_prefilter_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy plan for join_bloom_prefilter — factored so the plan
    test can explain it (asserting ``might_contain`` on the fact scan)
    without executing."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("l_extendedprice")), 100).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {exact_sum_sql(cents_sql("l.l_extendedprice"), 100)} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-fact join accelerated by a runtime bloom filter:
    Catalyst builds a bloom over the filtered orders keys and injects
    ``might_contain`` into the lineitem scan, pruning ~80% of the fact
    rows BEFORE the join shuffle (semi-join reduction).

    This is the scale mechanism for joins where the selective side is
    too big to broadcast but still selective: the only extra cost is a
    ~1 MB bloom aggregate, and the shuffle shrinks by the filter's
    selectivity. Result values are identical to the plain join (the
    bloom only discards rows the join would drop) — the oracle IS the
    plain join. Spark resolves the physical plan at action time, so the
    thresholds stay set while the result materializes and are restored
    after; the returned frame is the collected result re-localized
    (rows: one per priority group).
    """
    with bloom_confs(spark):
        res = bloom_prefilter_frame(spark, sf_dir)
        return spark.createDataFrame(res.collect(), schema=res.schema)


# ---------------------------------------------------------------------------
# Gaps-and-islands: runs of consecutive active days.
# ---------------------------------------------------------------------------


@query(
    "win_gap_islands",
    oracle="""
    WITH dd AS (
      SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day FROM events
    ), g AS (
      SELECT user_id, day,
             CASE WHEN LAG(day) OVER w IS NULL
                    OR DATE_DIFF('day', LAG(day) OVER w, day) > 1
                  THEN 1 ELSE 0 END AS is_new
      FROM dd
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ), isl AS (
      SELECT user_id, day,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY day)
                  AS BIGINT) AS island_idx
      FROM g
    )
    SELECT user_id, island_idx,
           MIN(day) AS start_day, MAX(day) AS end_day,
           COUNT(*) AS n_days
    FROM isl GROUP BY 1, 2
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user active days: maximal runs of
    consecutive calendar days with ≥1 event, with run bounds and
    length.

    The dual of sessionization on a discrete axis: distinct
    (user, day) first (collapsing the fact table to at most
    users×days rows), then the same lag → is-new → running-sum idiom.
    The distinct, both windows, and the island aggregate all partition
    on user_id, so the whole operator is one exchange after the
    per-day collapse. Days are midnight-truncated timestamps (not
    DATE) so both engines hash the same logical type.
    """
    e = load(spark, sf_dir, "events")
    dd = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    is_new = (
        F.when(
            F.lag("day").over(w).isNull()
            | (F.datediff(F.col("day"), F.lag("day").over(w)) > 1),
            1,
        )
        .otherwise(0)
        .alias("is_new")
    )
    return (
        dd.select("user_id", "day", is_new)
        .withColumn("island_idx", F.sum("is_new").over(w))
        .groupBy("user_id", "island_idx")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count("*").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis: token-distribution entropy.
# ---------------------------------------------------------------------------


@query(
    "llm_doc_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tok,
           COUNT(*) AS n_distinct,
           ROUND(LN(CAST(SUM(c) AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
                   / SUM(c), 4) AS entropy
    FROM tf GROUP BY doc_id
    """,
)
def llm_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the
    repetitiveness signal (low entropy = boilerplate/spam) used
    alongside lexical diversity in corpus quality filtering.

    Uses the single-aggregate identity H = ln(N) − (Σ c·ln c)/N over
    per-(doc, token) counts, so the whole operator is two grouped
    aggregates on the same doc_id-prefixed keys (partial aggregation
    map-side; no window, no join, no second pass over text). Natural
    log on identical doubles is bit-stable across both engines (same
    pattern llm_lang_id relies on), and the result is rounded
    in-query.
    """
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    c = F.col("c").cast("double")
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        pround(
            F.log(F.sum("c").cast("double"))
            - F.sum(c * F.log(c)) / F.sum("c"),
            4,
        ).alias("entropy"),
    )


Q10_FROM = "1999-01-01"
Q10_TO = "1999-07-01"


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {exact_sum_sql(revenue_e4_sql("l."), 10000)} AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{Q10_TO} 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog (returned-item reporting): top-20 customers by
    revenue lost to returns in one half-year window.

    The two selective predicates (return flag, date range) are on
    different fact tables and both reach their parquet scans; the
    orders⋈lineitem shuffle is the backbone, customer and nation
    broadcast, and the top-20 plans as TakeOrderedAndProject. The
    classic returned-item report — and the fourth TPC-H composite
    (Q1/Q3/Q5/Q18 analogs are registered separately).
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q10_FROM} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q10_TO} 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        # exact 1e-4-unit revenue sum (r10 quantization audit) — also
        # stabilizes the top-20 membership.
        .agg(exact_sum(revenue_e4_col(), 10000).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            pround(F.col("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Lexical retrieval: inverted index + BM25 — the text-side counterpart
# of the embedding ANN family (llm_ann_lsh / llm_ann_ivf).
# ---------------------------------------------------------------------------

BM25_QUERY = ("scan", "hash", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
POSTINGS_CAP = 20


@query(
    "llm_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           COUNT(*) AS df,
           ARRAY_TO_STRING(
             LIST_SLICE(LIST(doc_id ORDER BY doc_id), 1, {POSTINGS_CAP}),
             ',') AS postings_head
    FROM tok GROUP BY token
    """,
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token → document frequency + sorted
    posting list (head capped at POSTINGS_CAP=20 for the audit row —
    the full list is the same aggregate without the slice).

    The retrieval-side structure every lexical search over a corpus
    needs: one explode + distinct + one grouped aggregate, all keyed on
    token, so the index build is a single shuffle and each posting
    list lands in one task — at 100 TB you'd additionally bucket the
    output by token so query-time lookups prune to one bucket.
    Postings are sort_array'd in-aggregate, making the array value
    deterministic under any partitioning.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    return tok.groupBy("token").agg(
        F.count("*").alias("df"),
        # Joined to a string: the postings are the ONLY complex-typed
        # output column in the registry, and the driver's value-hash
        # canonicalization is outside our control — a flat string
        # carries identical information with zero hasher risk.
        F.array_join(
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP
            ),
            ",",
        ).alias("postings_head"),
    )


@query(
    "llm_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token IN {BM25_QUERY!r}
      GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), scored AS (
      SELECT tf.doc_id,
             SUM(
               LN(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (CAST({BM25_K1} AS DOUBLE) + 1.0)
               / (tf.tf + CAST({BM25_K1} AS DOUBLE)
                  * (1.0 - CAST({BM25_B} AS DOUBLE)
                     + CAST({BM25_B} AS DOUBLE) * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN df ON tf.token = df.token
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval: top-10 documents for a fixed probe
    query, Okapi scoring (idf · saturated tf · length normalization,
    k1=1.2, b=0.75).

    The query-token filter lands BEFORE any aggregation (only rows for
    the ~|query| tokens survive the explode), df and the corpus stats
    are tiny aggregates broadcast back, and the per-doc score is one
    grouped SUM — so the retrieval plan is: filtered explode, two
    1-to-few broadcasts, one shuffle on doc_id, TakeOrderedAndProject
    for the top-k. The idf is the BM25+ ln(1 + (N−df+0.5)/(df+0.5))
    form, strictly positive so common terms can't flip signs. Natural
    log on identical doubles is engine-stable (llm_doc_entropy
    pattern).
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * norm).alias("raw"))
        .select("doc_id", pround(F.col("raw"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# LLM-pipeline compositions.
# ---------------------------------------------------------------------------

# The content-stable train/eval split is defined ONCE in engine.llm_ops
# (SPLIT_CASE_SQL / split_col, shared with llm_train_test_split) so the
# ratio can never drift between the three consumers.
_SPLIT_CASE_SQL = SPLIT_CASE_SQL
_split_col = split_col


@query(
    "llm_decontaminate",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, text, {_SPLIT_CASE_SQL} AS split FROM documents
    ), sh AS (
      SELECT doc_id, split,
             MD5(ARRAY_TO_STRING(
               LIST_SLICE(STRING_SPLIT(text, ' '), i, i + 2), ' ')) AS h
      FROM (
        SELECT doc_id, split, text,
               UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - 2))
                 AS i
        FROM b WHERE LEN(STRING_SPLIT(text, ' ')) >= 3)
    ), ev AS (
      SELECT DISTINCT h FROM sh WHERE split = 'eval'
    ), cont AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN ev ON s.h = ev.h
      WHERE s.split = 'train'
    )
    SELECT b.lang,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean
    FROM b LEFT JOIN cont c ON b.doc_id = c.doc_id
    WHERE b.split = 'train'
    GROUP BY b.lang
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination audit: flag train documents sharing
    any 3-token shingle with the eval split (benchmark-leakage check).

    The shingling is llm_fingerprint's rolling-window transform
    (JVM-side slice/array_join — no Python); shingles are md5-hashed so
    the join key is a fixed-width string, not raw text. The eval
    shingle set is a fixed ~19% hash fraction of the corpus, distinct'd
    — the small side by construction — and broadcasts into the train
    shingle stream; contaminated doc_ids are distinct'd and left-joined
    back for the per-language audit. At 100 TB: one explode + one
    broadcast semi-join + two small aggregates; the eval set for a real
    benchmark suite is tiny, making the broadcast even cheaper than
    here.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _split_col().alias("split")
    )
    # Token array bound as a column, not split inside the lambda:
    # Catalyst does not hoist loop-invariant subexpressions out of
    # higher-order-function lambdas, so an in-lambda split re-tokenizes
    # the full text once per word — O(words · len) per doc, ~190 s for
    # one 366k-char doc (giant-doc sweep) vs ~1 s bound.
    shingles = F.expr(
        "transform(sequence(1, size(toks) - 2),"
        " i -> md5(array_join(slice(toks, i, 3), ' ')))"
    )
    # Scanned twice (eval side + train side): checkpoint so the
    # shingling explode doesn't re-execute through lineage — measured
    # ~2× at sf0.1 (same pattern as scale_ops' packed/vocab frames).
    sh = (
        d.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select("doc_id", "split", F.explode(shingles).alias("h"))
        .localCheckpoint(eager=True)
    )
    ev = sh.filter(F.col("split") == "eval").select("h").distinct()
    cont = (
        sh.filter(F.col("split") == "train")
        .join(F.broadcast(ev), "h")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    return (
        d.filter(F.col("split") == "train")
        .join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce(F.col("is_cont"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("is_cont").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_clean"),
        )
    )


@query(
    "llm_dedup_pipeline",
    oracle=f"""
    WITH surv AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)
    ), dd AS (
      SELECT d.* FROM documents d JOIN surv s ON d.doc_id = s.doc_id
    ), q AS (
      SELECT lang, {_SPLIT_CASE_SQL} AS split
      FROM dd
      WHERE n_chars >= {QUALITY_MIN_CHARS}
        AND LEN(STRING_SPLIT(text, ' ')) >= {QUALITY_MIN_TOKENS}
    ), raw_c AS (
      SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang
    ), dd_c AS (
      SELECT lang, COUNT(*) AS n_dedup FROM dd GROUP BY lang
    ), q_c AS (
      SELECT lang, COUNT(*) AS n_quality,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN split = 'eval' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_eval
      FROM q GROUP BY lang
    )
    SELECT raw_c.lang, raw_c.n_raw, dd_c.n_dedup,
           q_c.n_quality, q_c.n_train, q_c.n_eval
    FROM raw_c JOIN dd_c ON raw_c.lang = dd_c.lang
    JOIN q_c ON raw_c.lang = q_c.lang
    """,
)
def llm_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-preparation funnel in one plan: exact dedup
    (min-doc_id survivor per text hash) → quality gate (≥100 chars and
    ≥20 whitespace tokens) → stable train/eval split, audited per
    language at every stage.

    This is the composition the single-purpose operators
    (llm_exact_dedup, llm_quality_filter, llm_train_test_split) exist
    for, expressed as ONE DataFrame so Catalyst sees the whole funnel:
    the survivor join is a self-semi-join on the text hash, the quality
    gate is a pushdown-able filter on the survivor side, and all three
    audit aggregates group on the low-cardinality lang key. At 100 TB
    the funnel runs as two fact shuffles (hash-group, survivor join) +
    three cheap rollups — no stage materializes between steps.
    """
    d = load(spark, sf_dir, "documents")
    surv = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    dd = d.join(surv.select("doc_id"), "doc_id")
    q = dd.filter(
        (F.col("n_chars") >= QUALITY_MIN_CHARS)
        & (F.size(F.split("text", " ")) >= QUALITY_MIN_TOKENS)
    ).select("lang", _split_col().alias("split"))
    raw_c = d.groupBy("lang").agg(F.count("*").alias("n_raw"))
    dd_c = dd.groupBy("lang").agg(F.count("*").alias("n_dedup"))
    q_c = q.groupBy("lang").agg(
        F.count("*").alias("n_quality"),
        F.sum((F.col("split") == "train").cast("int"))
        .cast("long")
        .alias("n_train"),
        F.sum((F.col("split") == "eval").cast("int"))
        .cast("long")
        .alias("n_eval"),
    )
    return raw_c.join(dd_c, "lang").join(q_c, "lang")
