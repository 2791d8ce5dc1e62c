"""Streaming extension: the foreachBatch exactly-once merge sink as a
registered, oracle-checked query (SURVEY.md §2.I family).

Registered AFTER the proven families (round-4 correctness-window seed;
see engine/__init__). engine/streaming.py itself sits inside the round-3
re-check window and must not grow this round — hence the separate
module.
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.det import pround
from engine.registry import query
from engine.roundtrip import SCRATCH
from engine.session import load
from engine.streaming import events_stream

FB_WINDOW_SECS = 6 * 3600


@query(
    "stream_foreach_batch_merge",
    oracle=f"""
    SELECT CAST(TO_TIMESTAMP(FLOOR(epoch(ts) / {FB_WINDOW_SECS})
                             * {FB_WINDOW_SECS}) AS TIMESTAMP)
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_foreach_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch merge sink, run for real: a Structured Streaming
    file replay (availableNow) aggregates 6-hour tumbling windows and
    each micro-batch MERGES into a keyed store by (window, event_type)
    overwrite — the idempotent exactly-once pattern used when the sink
    is not a transactional table format. The merged result is returned
    as the query output, so the driver's oracle hash-checks the
    *post-merge* state against the plain batch aggregate: replay +
    merge must equal one batch pass.

    Scale shape: the streaming aggregate carries watermark-bounded
    state; the merge writes only changed keys per micro-batch
    (update output mode). The keyed store here is driver-held (window
    × event_type is metadata-bounded); a production target would be a
    keyed table with the same overwrite contract.
    """
    merged: dict[tuple, tuple] = {}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            merged[(r["window"].start, r["event_type"])] = (
                r["n_events"],
                r["sum_value"],
            )

    ckpt = SCRATCH / f"fbm_{uuid.uuid4().hex[:8]}"
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", f"{FB_WINDOW_SECS} seconds"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    rows = [
        (ws, et, int(n), float(sv))
        for (ws, et), (n, sv) in sorted(merged.items())
    ]
    out = spark.createDataFrame(
        rows,
        "window_start timestamp, event_type string,"
        " n_events long, sum_value double",
    )
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        pround(F.col("sum_value"), 2).alias("sum_value"),
    )
