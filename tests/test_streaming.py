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
    """Watermarked streaming dropDuplicates passes each event_id once."""
    from engine.streaming import dedup_stream

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
