"""Quiet-host performance pins (VERDICT r10 item 6, r11 item 1).

`llm_embedding_neardup` WAS the registry's one in-bench swing op
(in-bench 1.29 s r9 → 6.8 s r11 with zero code change, while this
standalone pin stayed green). r12 found the TRUE root cause by
in-worker instrumentation: not JVM heap and not the (since removed)
driver-side toPandas+broadcast stage, but numpy's MADV_HUGEPAGE on
≥4 MB arrays — under THP=madvise, first-touch faults on the op's
fresh 32 MB blocks enter multi-second kernel direct compaction once
session churn fragments physical memory (measured: 4.8-7.8 s of pure
stime per elementwise op post-churn, 0.02 s on arena reuse). Fixed at
the session layer: engine/session.py::get_spark sets
NUMPY_MADVISE_HUGEPAGE=0 before the JVM launches (workers inherit it;
executorEnv twin for real clusters). Post-fix the op reads
0.44-0.62 s after every churn combination that previously triggered
4.7-15.8 s. This module keeps BOTH guards so a regression of either
mechanism is visible:

  * the original standalone bound (test_embedding_neardup_quiet_host_
    bound), and
  * an IN-CONTEXT bound (test_embedding_neardup_in_context_bound) that
    first churns the same session with heavy registry queries — the
    exact condition under which the old driver stage degraded — then
    bounds the median.

History: the r10 verdict asked for one of (a) a pinned quiet-host
regression bound or (b) demoting the broadcast path behind an env
flag. We pinned (a): demoting would make the hyperplane-banded
APPROXIMATE path the bench/driver default, and its recall is only
measured at fixture scale — trading a perf watch item for a latent
correctness risk is the wrong direction.

Why the gate + load check instead of an always-on assert: a wall-clock
bound asserted under arbitrary CI load measures the HOST, not the code
(the exact failure mode that poisoned BENCH_r10). So the pin

  * only runs when ENGINE_PERF_PINS=1 (the closing-sweep sequence sets
    it; BASELINE.md records each round's measured value), and
  * SKIPS VISIBLY when 1-min loadavg says the host is already busy,
    rather than recording a meaningless red/green.

Run: ENGINE_PERF_PINS=1 python -m pytest tests/test_perf_pins.py -q
"""

from __future__ import annotations

import os
import time

import pytest

import engine

pytestmark = pytest.mark.skipif(
    not os.environ.get("ENGINE_PERF_PINS"),
    reason="quiet-host perf pin: set ENGINE_PERF_PINS=1 (closing sweeps)",
)

# Bench scale, matching the pinned bound's provenance (VERDICT r10
# plan-audit item 1: quiet-host 1.37 s, band 1.2-6.4 s under load).
PIN_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EMBEDDING_NEARDUP_BOUND_S = 2.0
# A 1-min loadavg above half the CPU allowance means other heavy work
# shares the host; a pin measured there bounds the contention, not the
# query, so refuse to measure (skip is visible in the sweep log).
BUSY_LOAD_FRACTION = 0.5


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _skip_if_busy() -> None:
    load1 = os.getloadavg()[0]
    try:
        cpus = len(os.sched_getaffinity(0))
    except AttributeError:
        cpus = os.cpu_count() or 1
    if load1 > BUSY_LOAD_FRACTION * cpus:
        pytest.skip(
            f"host busy (load1={load1:.1f} on {cpus} cpus) — a perf pin "
            "measured under contention is meaningless; re-run quiet"
        )


def test_embedding_neardup_quiet_host_bound(spark):
    _skip_if_busy()
    q = engine.QUERIES["llm_embedding_neardup"]
    _force(q(spark, PIN_SF_DIR))  # warm: JIT, parquet footers, workers
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(q(spark, PIN_SF_DIR))
        samples.append(time.perf_counter() - t0)
    median = sorted(samples)[1]
    assert median <= EMBEDDING_NEARDUP_BOUND_S, (
        f"llm_embedding_neardup quiet-host median {median:.2f}s "
        f"(samples {[round(s, 2) for s in samples]}) exceeds the "
        f"{EMBEDDING_NEARDUP_BOUND_S}s pin — the broadcast witness "
        "stage regressed (VERDICT r10 item 6)"
    )


# Queries that churn the JVM heap and Python workers the way a full
# bench pass does — the context in which the old driver-side corpus
# stage degraded (r9 1.29 s → r11 6.8 s in-bench) while the standalone
# pin above stayed green. Heavy by the r11 plan audit: full-corpus
# shingle MinHash-LSH, the iterative CC fixpoint, and an Arrow
# grouped-apply.
IN_CONTEXT_CHURN = ["llm_ngram_lsh", "llm_dedup_clusters", "udf_apply_in_pandas"]
EMBEDDING_NEARDUP_IN_CONTEXT_BOUND_S = 2.5


def test_embedding_neardup_in_context_bound(spark):
    """VERDICT r11 item 1(b): bound the op in a heap-churned session.

    The standalone pin structurally could not see the in-bench growth
    because the degradation only appeared after other heavy queries had
    run in the same JVM. Churn first, then bound — if a driver-side
    stage ever creeps back into this op, THIS pin degrades with it.
    """
    _skip_if_busy()
    for name in IN_CONTEXT_CHURN:
        _force(engine.QUERIES[name](spark, PIN_SF_DIR))
    q = engine.QUERIES["llm_embedding_neardup"]
    _force(q(spark, PIN_SF_DIR))  # warm after churn
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(q(spark, PIN_SF_DIR))
        samples.append(time.perf_counter() - t0)
    median = sorted(samples)[1]
    assert median <= EMBEDDING_NEARDUP_IN_CONTEXT_BOUND_S, (
        f"llm_embedding_neardup in-context median {median:.2f}s "
        f"(samples {[round(s, 2) for s in samples]}) exceeds the "
        f"{EMBEDDING_NEARDUP_IN_CONTEXT_BOUND_S}s pin after heavy-query "
        "churn — a heap-sensitive stage is back (VERDICT r11 item 1)"
    )
