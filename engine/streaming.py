"""Streaming-shaped operators (SURVEY.md §2.I).

Batch forms run against the static ``events`` table and are
oracle-checked; the *same expressions* run over ``spark.readStream``
(Structured Streaming) — exposed via :func:`events_stream` and the
``stream_watermark_design`` query (no-oracle: a continuous query can't be
hash-compared) plus streaming smoke tests in ``tests/test_streaming.py``.

Scale notes: windowed/session aggregation state lives in the executor
state store keyed by (group, window); the watermark bounds state size —
without it, 100 TB of late-arriving events would pin unbounded state.
"""

from __future__ import annotations

import shutil
import uuid

import numpy as np
import pandas as pd
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from engine.det import cents_col, cents_sql, exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, pround
from engine.registry import query
from engine.session import load
# Re-exported for compatibility: the stream source lives in the leaf
# module engine.stream_source so engine.streaming_ext can use it
# without dragging this module's registrations forward.
from engine.stream_source import events_stream as events_stream

_SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"

def tumbling_agg(ev: DataFrame) -> DataFrame:
    """1 h tumbling window × event_type — shared by batch and streaming."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value
    FROM (
      SELECT TIME_BUCKET(INTERVAL 30 MINUTE, ts) AS ws, value FROM events
      UNION ALL
      SELECT TIME_BUCKET(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS ws, value
      FROM events
    )
    GROUP BY ws
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 h windows sliding every 30 min (SURVEY.md §2.I stream_sliding).

    Each event belongs to exactly 2 windows; the oracle reconstructs that
    as a union of its 30-min bucket and the bucket 30 min earlier.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_agg(ev: DataFrame) -> DataFrame:
    """Per-user 30-min-gap session aggregate — shared by batch and streaming."""
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
      -- TOTAL window order (ts, event_id), not just ts: the flag CTE
      -- and the running-sum CTE are two SEPARATE window sorts, and
      -- with tied timestamps an underdetermined ORDER BY ts lets the
      -- two sorts order ties differently — the new_session flag row
      -- then lands mid-cluster in the second sort and every tied row
      -- sorted before it leaks into the PREVIOUS session (caught by
      -- the composed skew×row-order sweep at sf0.1: the hot user's
      -- 6-hour-grid clusters swapped 1–101 events between adjacent
      -- sessions run-to-run). Gaps between ties are 0 either way, so
      -- the tiebreak changes nothing semantically — it only makes the
      -- two sorts agree. SURVEY §7.5.4, oracle side.
      SELECT user_id, ts, value, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30 min inactivity gap
    (SURVEY.md §2.I stream_session).

    Boundary semantics verified empirically: a gap of exactly 30:00
    MERGES (sessions merge when the new event's window touches the
    previous end), so the oracle's gaps-and-islands flags a new session
    only when the gap is strictly > 30 min (SURVEY.md §7.6.3).
    """
    return session_agg(load(spark, sf_dir, "events"))


@query(
    "stream_watermark_design",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_watermark_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data policy: 10-min watermark + tumbling count, executed as a
    real Structured Streaming query (SURVEY.md §2.I).

    File-source replay of events.parquet → withWatermark → 1 h window ×
    event_type counts → memory sink, availableNow trigger (processes the
    whole fixture as micro-batches, then stops). The watermark bounds
    state: windows older than max(event time) − 10 min are finalized and
    evicted; on an unbounded 100 TB stream this is what keeps state-store
    size O(active windows), not O(history).

    Oracled since r7 (upgrading the r3 rows-only row): the execution is
    deterministic because (a) the fixture is one parquet file, so the
    whole replay is a single micro-batch in which the watermark is
    still at epoch — no row can be late — and (b) COMPLETE output mode
    emits every window regardless of eviction. The final sink therefore
    hash-equals the batch 1-h × event_type aggregate, which IS
    SQL-expressible. The late-drop/eviction behaviors that a
    single-batch replay cannot show are pinned separately with
    multi-batch controlled sources in tests/test_streaming.py.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink_name = f"wm_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{sink_name}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    result = spark.table(sink_name)
    # materialize before the memory sink is dropped by later queries
    return spark.createDataFrame(result.collect(), schema=result.schema)


def user_state_agg(ev: DataFrame) -> DataFrame:
    """Per-user lifetime state (count, sum, last-seen) — the batch form
    of the custom stateful operator; shared output contract with
    :func:`user_state_stream`."""
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        # exact cents sum (r10 quantization audit)
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "stream_user_state",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY 1
    """,
)
def stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime state (SURVEY.md §2.I family; batch-checked form
    of the applyInPandasWithState custom stateful operator)."""
    return user_state_agg(load(spark, sf_dir, "events"))


def user_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running
    (count, sum, last-seen) via ``applyInPandasWithState``.

    This is the escape hatch for stateful logic Spark's built-in
    windows/aggregates can't express (per-key models, custom eviction,
    running sketches): state lives in the executor state store keyed by
    user_id, each micro-batch folds its Arrow batches into the state and
    emits the updated rows (update mode). State is O(active keys) — at
    100 TB the watermark/timeout (here NoTimeout; production sets a TTL
    via GroupStateTimeout) bounds it.

    Returns the streaming DataFrame; callers attach a sink (the smoke
    test uses a memory sink + availableNow and checks the final state
    equals :func:`user_state_agg` of the batch table).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events_stream(spark, sf_dir).select("user_id", "ts", "value")

    def fold(key, pdfs, state):
        if state.exists:
            n, s, mx_us = state.get
        else:
            n, s, mx_us = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            # exact integer-cents accumulation (r10 quantization audit):
            # the state `s` holds whole cents in a double (exact until
            # 2^53), so the lifetime sum is independent of micro-batch
            # arrival order — matching the batch form's quantized sum.
            s += float(np.floor(pdf["value"] * 100 + 0.5).sum())
            batch_mx = pdf["ts"].max()
            mx_ns = batch_mx.value
            mx_us = mx_ns // 1000 if mx_us is None else max(mx_us, mx_ns // 1000)
        state.update((n, s, mx_us))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "sum_value": pd.Series([s / 100], dtype="float64"),
                "last_ts": pd.Series([pd.Timestamp(mx_us * 1000)]),
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, n_events long, sum_value double, last_ts timestamp"
        ),
        stateStructType="n bigint, s double, mx_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by event_id then count per type (SURVEY.md §2.I
    family; batch-checked form of streaming dropDuplicates)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup: ``dropDuplicates`` on the id alone.

    Exact global dedup keeps state for every distinct event_id ever
    seen — O(distinct ids), NOT bounded by the watermark. (Measured on
    Spark 4.1.2: with the event-time column absent from the dedup keys,
    numRowsRemoved stays 0 and state only grows;
    tests/test_streaming.py pins the bounded-state contrast.) That is
    the honest cost of exactness on an unbounded stream; use
    :func:`dedup_stream_within_watermark` when duplicates are known to
    arrive within a bounded delay — the production case — for
    watermark-evicted, O(active-horizon) state."""
    ev = events_stream(spark, sf_dir)
    return ev.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])


def dedup_stream_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark``.

    Drops duplicates arriving within the 10-min watermark delay of the
    first-seen record; each key's state row expires once the watermark
    passes first_ts + delay and is evicted from the state store — state
    is O(ids within the horizon), the property that survives an
    unbounded 100 TB stream. A duplicate arriving after expiry is
    re-admitted (the documented trade vs exact dedup); the eviction and
    re-admission are asserted batch-by-batch in
    tests/test_streaming.py::test_watermark_evicts_dedup_state_across_batches."""
    ev = events_stream(spark, sf_dir)
    return ev.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def interval_join_agg(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Per-user count of (purchase, prior-click-within-10-min) pairs —
    shared by the batch form and the stream-stream join."""
    p = purchases.select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    c = clicks.select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    return (
        p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") < F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy(F.col("pu").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT p.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
    GROUP BY p.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase⋈click interval join per user (SURVEY.md §2.I family;
    batch-checked form of the Structured Streaming stream-stream join).

    The equi component (user_id) keys the shuffle; the interval predicate
    evaluates within co-partitioned groups — never a cartesian.
    """
    ev = load(spark, sf_dir, "events")
    return interval_join_agg(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


def stream_stream_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form: two watermarked streams, interval join.

    Both sides carry a watermark and the join condition time-bounds each
    side against the other, so Spark derives state-eviction horizons for
    BOTH join buffers — the requirement that makes an unbounded
    stream-stream join feasible: buffered rows older than the horizon
    are dropped, state is O(events within the interval), not O(stream).
    The smoke test joins the replayed fixture and compares pair rows
    against the batch interval join.
    """
    ev = events_stream(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .withWatermark("pts", "10 minutes")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .withWatermark("cts", "10 minutes")
    )
    return p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
    )


# Registered last in this module (and the module itself imports after the
# other streaming-family registrations in engine/__init__.py): this query
# was driver-validated green in round 1, so it yields its early slot in the
# capped correctness sweep to the yet-unchecked queries.
@query(
    "stream_tumbling",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 h tumbling windows (SURVEY.md §2.I stream_tumbling).

    Spark's ``window()`` aligns to the epoch, as does DuckDB's
    ``time_bucket`` — window starts agree exactly.
    """
    return tumbling_agg(load(spark, sf_dir, "events"))
