"""Query/oracle registry.

Every operator from SURVEY.md §2 registers here as a ``(spark, sf_dir) ->
DataFrame`` callable plus (when SQL-expressible) a DuckDB oracle SQL string
over the same parquet tables. The driver hash-compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so SURVEY.md §7.5's
determinism rules (UTC, in-query rounding, identical aliases, unique sort
keys, sorted collects) are enforced at registration call sites.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from engine.det import portable_round_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Session invariants every query depends on (SURVEY.md §7.5.1): the driver
# owns the SparkSession, so each query defensively pins runtime confs.
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
}


def _pin_confs(spark: SparkSession) -> None:
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


def query(
    qid: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``qid``; optionally with a DuckDB oracle.

    ``oracle`` may be a SQL string, or a zero-arg callable returning one
    for oracles COMPOSED from other registered oracles (e.g.
    llm_ann_recall) — callables are resolved by :func:`resolve_oracles`
    after every module has imported, so composition never constrains
    module registration order (which the driver's capped correctness
    sweep walks; see engine/__init__).

    Queries without an oracle get the driver's weaker rows-only check
    (SURVEY.md §2 'no-oracle' rows).
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, **kw: Any) -> DataFrame:
            _pin_confs(spark)
            return fn(spark, sf_dir, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__  # lets tests audit the
        # registration window by module (tests/test_plans.py)
        wrapped.__wrapped__ = fn  # lets inspect.unwrap reach the REAL
        # operator body — source-scanning pins (e.g. the no-driver-stage
        # pin on llm_embedding_neardup) would otherwise silently inspect
        # this 2-line wrapper and pass vacuously (ADVICE r12)
        if qid in QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        QUERIES[qid] = wrapped
        if oracle is not None:
            # ROUND() in oracle strings is rewritten to the portable
            # floor-based form so both engines round identically
            # (engine.det); callables are rewritten when resolved.
            ORACLES[qid] = (
                oracle if callable(oracle) else portable_round_sql(oracle)
            )
        return wrapped

    return deco


def promote(window_ids: list[str]) -> None:
    """Pin the driver's correctness window: reorder ``QUERIES`` so
    ``window_ids`` occupy the first positions, in the given order.

    The driver checks queries in registration (dict) order and caps the
    per-round report at 50 rows (CORRECTNESS_r01-r06 each hold exactly
    50). Through round 6 the window was steered purely by module import
    order in ``engine/__init__``, which works for whole-module rotations
    but cannot place a single re-check query from a large, already-green
    module (e.g. ``llm_lsh_neardup`` inside engine.scale_ops) into the
    window without dragging its 14 siblings along. ``promote`` decouples
    window membership from import order: ``engine/__init__`` names the
    round's exact window after all modules have registered.

    Raises on unknown or duplicate ids so a typo'd rotation fails at
    import time (i.e. in every test run), not silently at driver time.
    """
    seen: set[str] = set()
    for qid in window_ids:
        if qid not in QUERIES:
            raise ValueError(f"promote: unknown query id: {qid}")
        if qid in seen:
            raise ValueError(f"promote: duplicate query id: {qid}")
        seen.add(qid)
    rest = [q for q in QUERIES if q not in seen]
    reordered = {q: QUERIES[q] for q in list(window_ids) + rest}
    QUERIES.clear()
    QUERIES.update(reordered)


def resolve_oracles() -> None:
    """Resolve deferred (callable) oracles in place.

    Called once at the end of ``engine/__init__`` — by then every
    composed-from oracle is a registered string (already
    portable-rounded at its own registration; re-rewriting is a no-op
    on rewritten text, so only the composing SQL's own ROUND() calls
    change here).
    """
    for qid, o in list(ORACLES.items()):
        if callable(o):
            ORACLES[qid] = portable_round_sql(o())
