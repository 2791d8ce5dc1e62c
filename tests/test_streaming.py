"""Structured Streaming smoke tests (SURVEY.md §2.I streaming variants).

The batch forms are oracle-checked in test_differential; here the same
shared expressions (tumbling_agg, session_agg) run over readStream with
an availableNow trigger and must reproduce the batch results exactly —
one logical plan, two execution modes (SURVEY.md §3.4).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest

from engine.session import load
from engine.streaming import events_stream, session_agg, tumbling_agg
from tests.conftest import SF_DIR, normalize

_SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"


def _run_stream(spark, stream_df):
    name = f"smoke_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
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
    return spark.table(name).toPandas()


@pytest.mark.parametrize("agg_fn", [tumbling_agg, session_agg])
def test_stream_matches_batch(spark, agg_fn):
    batch = agg_fn(load(spark, SF_DIR, "events")).toPandas()
    stream = _run_stream(spark, agg_fn(events_stream(spark, SF_DIR)))
    assert normalize(batch) == normalize(stream)


def test_stateful_user_state_matches_batch(spark):
    """applyInPandasWithState final per-user state == batch aggregate.

    Update-mode emissions may repeat a user across micro-batches; the
    last emission per user is the final state."""
    from engine.streaming import user_state_agg, user_state_stream

    batch = user_state_agg(load(spark, SF_DIR, "events")).toPandas()

    name = f"state_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    q = (
        user_state_stream(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    stream = spark.table(name).toPandas()
    final = stream.groupby("user_id", as_index=False).last()
    assert normalize(batch) == normalize(final)


def test_stream_dedup_counts(spark):
    """Watermarked streaming dropDuplicates must reproduce the batch
    twin EXACTLY: the deduped stream, re-aggregated per event_type,
    frame-equals the registered ``stream_dedup`` batch query (VERDICT
    r3 next #5 — count-only equivalence could mask a dedup that keeps
    the wrong duplicate or drops extra rows)."""
    import engine
    from engine.streaming import dedup_stream

    batch = engine.QUERIES["stream_dedup"](spark, SF_DIR).toPandas()
    n_batch = load(spark, SF_DIR, "events").dropDuplicates(["event_id"]).count()

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    q = (
        dedup_stream(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    assert spark.table(name).count() == n_batch
    stream_agg = (
        spark.table(name)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n_unique")
        .toPandas()
    )
    assert normalize(batch) == normalize(stream_agg)


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream interval join emits exactly the batch
    join's pair set."""
    from pyspark.sql import functions as F

    from engine.streaming import stream_stream_join_stream

    ev = load(spark, SF_DIR, "events")
    batch_pairs = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .join(
            ev.filter(F.col("event_type") == "click").select(
                F.col("user_id").alias("cu"), F.col("ts").alias("cts")
            ),
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") < F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
        )
        .toPandas()
    )

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    q = (
        stream_stream_join_stream(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    stream_pairs = spark.table(name).toPandas()
    assert normalize(batch_pairs) == normalize(stream_pairs)


def test_foreach_batch_idempotent_merge(spark):
    """The exactly-once sink pattern: foreachBatch + deterministic
    overwrite-by-key merge into a parquet target. Replaying the same
    source (same checkpoint removed → every batch reprocessed) must
    leave the target identical — the merge is idempotent on
    (window, event_type), so duplicate delivery cannot double-count.
    This is the production shape for streaming upserts without a table
    format: micro-batch → keyed overwrite, driver-coordinated.
    """
    from pyspark.sql import functions as F

    name = f"fb_{uuid.uuid4().hex[:8]}"
    target = _SCRATCH / f"tgt_{name}"
    state: dict[str, dict] = {}

    def merge_batch(batch_df, batch_id: int) -> None:
        # Keyed overwrite into a driver-held dict stand-in for a keyed
        # table write (same idempotence contract as MERGE on the key).
        for r in batch_df.collect():
            key = f"{r['window'].start.isoformat()}|{r['event_type']}"
            state[key] = {"n": r["n_events"], "sum": r["sum_value"]}

    def run_once() -> None:
        ckpt = _SCRATCH / f"ckpt_{name}_{uuid.uuid4().hex[:6]}"
        agg = (
            events_stream(spark, SF_DIR)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "6 hours"), "event_type")
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
            q.awaitTermination(120)
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)

    try:
        run_once()
        first = dict(state)
        assert first, "foreachBatch sink received no batches"
        # Fresh checkpoint → full replay → duplicate delivery of every
        # batch. The keyed merge must converge to the same state.
        run_once()
        assert state == first, "replayed merge diverged (not idempotent)"
        # And the merged state must equal the batch-mode aggregate.
        batch = (
            load(spark, SF_DIR, "events")
            .groupBy(F.window("ts", "6 hours"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
        )
        expect = {
            f"{r['window'].start.isoformat()}|{r['event_type']}": {
                "n": r["n_events"],
                "sum": r["sum_value"],
            }
            for r in batch.collect()
        }
        assert {k: v["n"] for k, v in state.items()} == {
            k: v["n"] for k, v in expect.items()
        }
    finally:
        shutil.rmtree(target, ignore_errors=True)


# ---------------------------------------------------------------------------
# Stream-vs-ORACLE: close the evidence chain directly (VERDICT r6 item 7).
# test_differential proves oracle == batch; the tests above prove
# batch == stream. These two prove oracle == stream with no intermediary:
# the streaming execution's final output hash-equals the registered
# DuckDB oracle on the same fixture.
# ---------------------------------------------------------------------------


def test_stream_session_matches_oracle(spark, ddb):
    """availableNow replay of the session window == the registered
    stream_session DuckDB oracle, frame-exact."""
    import engine

    oracle = ddb.execute(engine.ORACLES["stream_session"]).fetchdf()
    stream = _run_stream(spark, session_agg(events_stream(spark, SF_DIR)))
    assert normalize(oracle) == normalize(stream)


def test_stream_dedup_matches_oracle(spark, ddb):
    """availableNow watermarked dropDuplicates, re-aggregated per
    event_type, == the registered stream_dedup DuckDB oracle."""
    import engine
    from engine.streaming import dedup_stream

    oracle = ddb.execute(engine.ORACLES["stream_dedup"]).fetchdf()

    name = f"dedup_o_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    q = (
        dedup_stream(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    stream_agg = (
        spark.table(name)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n_unique")
        .toPandas()
    )
    assert normalize(oracle) == normalize(stream_agg)


# ---------------------------------------------------------------------------
# Continuous-trigger semantics under a watermark (VERDICT r6 item 7: the
# late-data-drop and state-eviction behaviors previously had no
# hash-checkable harness). Micro-batch boundaries are made deterministic:
# one parquet file per batch (maxFilesPerTrigger=1) with strictly
# increasing mtimes — the file source processes oldest-modification
# first — so the watermark provably advances BETWEEN the controlled
# batches and the assertions are exact, not racy.
# ---------------------------------------------------------------------------

_LD_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _write_event_file(path, rows, mtime):
    """One parquet file of events with a pinned modification time."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _two_batch_stream(spark, src_dir, build_sink):
    """Run an n-file source as exactly n micro-batches (availableNow +
    maxFilesPerTrigger=1, oldest mtime first) into a memory sink;
    return the sink table."""
    stream = (
        spark.readStream.schema(_LD_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )
    name, q = build_sink(stream)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    return spark.table(name)


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """A late event whose tumbling window was finalized at least one
    batch earlier MUST be dropped: the sink's count for that window
    excludes it, Spark's own numRowsDroppedByWatermark metric records
    it, and the batch twin over the same files DOES count it — the
    difference is exactly the watermark's late-data policy, executed
    for real.

    Semantics pinned empirically on Spark 4.1.2 (and asserted here):
    the late-row filter uses the watermark as of the PREVIOUS batch,
    one batch behind eviction — Spark guarantees at-least-delay (a
    window is never emitted twice) but may accept later data than the
    delay while the window's state is still live. Hence the late row
    lands TWO batches after the window's data, where both the lagged
    filter watermark (03:20) and the eviction watermark cover its
    window end (02:00)."""
    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()
    # Batch 0: on-time events for windows [01:00) and [02:00);
    # max ts 02:00 → watermark 01:50 after this batch.
    _write_event_file(
        src / "b1.parquet",
        [
            (1, "2026-01-01 01:00:00", 1, "click", 1.0),
            (2, "2026-01-01 01:30:00", 1, "click", 1.0),
            (3, "2026-01-01 02:00:00", 1, "click", 1.0),
        ],
        mtime=1_600_000_000,
    )
    # Batch 1: fresh 03:30 → watermark 03:20; [01:00) and [02:00) are
    # evicted+emitted during batch 2 at the latest.
    _write_event_file(
        src / "b2.parquet",
        [(5, "2026-01-01 03:30:00", 1, "click", 1.0)],
        mtime=1_600_000_100,
    )
    # Batch 2: fresh 04:30 → watermark 04:20.
    _write_event_file(
        src / "b3.parquet",
        [(6, "2026-01-01 04:30:00", 1, "click", 1.0)],
        mtime=1_600_000_200,
    )
    # Batch 3: the LATE event 01:10 — its window end 02:00 is ≤ even
    # the one-batch-lagged filter watermark (03:20) → dropped; plus a
    # fresh 05:30 that flushes every closed window to the append sink.
    _write_event_file(
        src / "b4.parquet",
        [
            (7, "2026-01-01 01:10:00", 1, "click", 1.0),
            (8, "2026-01-01 05:30:00", 1, "click", 1.0),
        ],
        mtime=1_600_000_300,
    )

    name = f"late_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    stream = (
        spark.readStream.schema(_LD_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        n_dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in (p.get("stateOperators") or [])
        )
        got = {
            r["window_start"].isoformat(): r["n_events"]
            for r in spark.table(name).collect()
        }
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    # Emitted: [01:00) with 2 (late event NOT re-counted, window NOT
    # re-emitted), [02:00)/[03:00)/[04:00) with 1 each; [05:00) still
    # open at stream end so absent from the append sink.
    assert got == {
        "2026-01-01T01:00:00": 2,
        "2026-01-01T02:00:00": 1,
        "2026-01-01T03:00:00": 1,
        "2026-01-01T04:00:00": 1,
    }, f"late-data policy violated: {got}"
    assert n_dropped == 1, (
        f"expected exactly the late row in numRowsDroppedByWatermark, "
        f"got {n_dropped}"
    )

    # Ground truth that the late event EXISTS in the data: the batch
    # twin over the same files counts 3 in the [01:00) window.
    batch = (
        spark.read.schema(_LD_SCHEMA)
        .parquet(str(src))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    batch_got = {
        r["window_start"].isoformat(): r["n_events"] for r in batch.collect()
    }
    assert batch_got["2026-01-01T01:00:00"] == 3


def test_watermark_evicts_dedup_state_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark state eviction, observed directly:
    an event_id seen in batch 0 whose state expired (watermark passed
    first_ts + delay) is evicted — Spark's numRowsRemoved metric
    records it — and is NOT deduplicated when it reappears in a later
    batch: 5 rows out, where batch-mode dedup over the same files gives
    4. That asymmetry IS the eviction: state is O(ids within the
    watermark horizon), the property that bounds the state store on an
    unbounded stream. (Plain dropDuplicates on the id alone never
    evicts — ts is not a dedup key — which the second half of this test
    pins as the contrast, so the engine's exact-vs-bounded dedup docs
    stay honest.)"""
    src = tmp_path / "evict_src"
    src.mkdir()
    # Batch 0: id=100 at 01:00 (state expires once wm > 01:10),
    # id=101 at 02:00 → watermark 01:50 after this batch.
    _write_event_file(
        src / "b1.parquet",
        [
            (100, "2026-01-01 01:00:00", 1, "click", 1.0),
            (101, "2026-01-01 02:00:00", 1, "click", 1.0),
        ],
        mtime=1_600_000_000,
    )
    # Batch 1: a fresh id; at the END of this batch the 01:50 watermark
    # applies and id=100's expired state row is evicted.
    _write_event_file(
        src / "b2.parquet",
        [(103, "2026-01-01 02:10:00", 1, "click", 1.0)],
        mtime=1_600_000_100,
    )
    # Batch 2: id=100 REAPPEARS at 02:30 — state gone → re-admitted —
    # plus new id=102.
    _write_event_file(
        src / "b3.parquet",
        [
            (100, "2026-01-01 02:30:00", 1, "click", 1.0),
            (102, "2026-01-01 03:00:00", 1, "click", 1.0),
        ],
        mtime=1_600_000_200,
    )

    name = f"evict_{uuid.uuid4().hex[:8]}"
    ckpt = _SCRATCH / f"ckpt_{name}"
    stream = (
        spark.readStream.schema(_LD_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    deduped = stream.withWatermark(
        "ts", "10 minutes"
    ).dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        n_removed = sum(
            so.get("numRowsRemoved", 0)
            for p in q.recentProgress
            for so in (p.get("stateOperators") or [])
        )
        ids = sorted(r["event_id"] for r in spark.table(name).collect())
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    assert ids == [100, 100, 101, 102, 103], (
        f"expected id=100 re-admitted after eviction, got {ids}"
    )
    assert n_removed >= 1, "no state row was ever evicted"
    # Batch-mode dedup over the same files keeps one copy of id=100.
    n_batch = (
        spark.read.schema(_LD_SCHEMA)
        .parquet(str(src))
        .dropDuplicates(["event_id"])
        .count()
    )
    assert n_batch == 4

    # Contrast: EXACT streaming dedup (id-only keys) never evicts —
    # state grows with distinct ids; the re-arrival IS deduplicated.
    name2 = f"exact_{uuid.uuid4().hex[:8]}"
    ckpt2 = _SCRATCH / f"ckpt_{name2}"
    exact = stream.withWatermark("ts", "10 minutes").dropDuplicates(
        ["event_id"]
    )
    q2 = (
        exact.writeStream.format("memory")
        .queryName(name2)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt2))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q2.awaitTermination(120)
        n_removed2 = sum(
            so.get("numRowsRemoved", 0)
            for p in q2.recentProgress
            for so in (p.get("stateOperators") or [])
        )
        ids2 = sorted(r["event_id"] for r in spark.table(name2).collect())
    finally:
        q2.stop()
        shutil.rmtree(ckpt2, ignore_errors=True)
    assert ids2 == [100, 101, 102, 103], f"exact dedup broke: {ids2}"
    assert n_removed2 == 0, (
        "exact dedup unexpectedly evicted state — the honest-cost "
        f"docstring in engine/streaming.py is stale ({n_removed2} removed)"
    )
