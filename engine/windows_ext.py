"""Window extension: RANGE (value-based) frames — the one frame type
the core windows module (SURVEY.md §2.E) doesn't exercise. Registered
AFTER the proven families (round-4 correctness-window seed; see
engine/__init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from engine.det import pround
from engine.registry import query
from engine.session import load

RANGE_SECS = 3600  # trailing 1-hour value window


@query(
    "win_range_interval",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_hour,
           ROUND(SUM(value) OVER w, 2) AS sum_trailing_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN {RANGE_SECS} PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour RANGE frame per user: how many events (and how much
    value) landed within the last {RANGE_SECS} seconds of *event time* —
    a value-based frame, not a row-count frame, so sparse and dense
    activity windows are treated alike (the sliding-window metric shape;
    the streaming twin is stream_sliding).

    The order key is integer epoch seconds on both engines (event
    timestamps are second-granularity, FIXTURES.md), so the RANGE
    boundary arithmetic is exact integer comparison — no interval-type
    semantics to disagree on. Partitioned by user_id: bounded per-key
    state, one hash shuffle at any scale.
    """
    e = load(spark, sf_dir, "events")
    ts_sec = F.floor(F.col("ts").cast("double")).cast("bigint")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts_sec"))
        .rangeBetween(-RANGE_SECS, W.currentRow)
    )
    return e.withColumn("ts_sec", ts_sec).select(
        "user_id",
        "event_id",
        "ts_sec",
        F.count("*").over(w).cast("bigint").alias("n_trailing_hour"),
        pround(F.sum("value").over(w), 2).alias("sum_trailing_hour"),
    )
