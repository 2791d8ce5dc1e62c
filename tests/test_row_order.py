"""Row-order-permutation sweep (SURVEY.md §5 adversarial-input layer):
every deterministic query's RESULT must be invariant to the physical
row order of its input files — on a 1000-executor cluster reading
100 TB, file listing order, split assignment, and shuffle arrival order
all vary run to run, so any operator whose answer depends on parquet
row order (a first()/limit without a total sort key, an id assigned by
physical position, a float reduction whose rounding doesn't absorb
reassociation) produces FLAPPING results in production — the worst
failure mode, because it passes any single-run test.

Tier design (strictly stronger than the other twins' exact tier): the
Spark side reads a row-SHUFFLED copy of every fixture table while the
DuckDB oracle reads the CANONICAL fixtures. The two see different
physical orders of the same multiset, so hash equality proves the
declared semantics are a pure function of table CONTENTS. (Comparing
both engines on the twin would be weaker: a shared file-order
dependence would cancel out.)

The survival tier runs the 6 no-oracle queries on the twin; the
sketch-grain ones (approx_distinct / approx_quantile / hll_drift /
percentile_drift) are order-sensitive BY DESIGN at the internal-state
level, which is exactly why they are declared rows-only for the driver
too.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, materialize

# One deterministic permutation per table (seeded per table index so
# the twins differ table-to-table but never run-to-run). The base seed
# is env-overridable so CI / soak runs can sweep MANY permutations —
# each distinct order is a fresh chance to catch a float reduction
# sitting on a rounding boundary (the q9 / sql_scalar_subquery class).
import os

_SEED = int(os.environ.get("ENGINE_ROWORDER_SEED", str(0x5208)), 0)

# ENGINE_ROWORDER_FAMILY=sumavg restricts the oracled tier to the
# SUM/AVG-bearing oracle family (the r10 quantization-audit population)
# so multi-seed soak runs at sf0.1 spend their wall-clock on the class
# that has actually flapped (q9 / sql_scalar_subquery / agg_unpivot)
# instead of re-running bit-stable string/count ops eight times.
# ENGINE_ROWORDER_FAMILY=moment selects the higher-moment /
# order-statistic folds (the class with no lossless integer form —
# small, so soaks afford many more seeds per hour). Both predicates
# live ONCE in tests/conftest.py, shared with the family-collapse pin
# and the composed skew sweep (ADVICE r10). An unrecognized value
# FAILS COLLECTION rather than silently widening the soak to all 283
# oracles — a typo'd invocation must not record a green run against
# the wrong population (ADVICE r10).
from tests.conftest import moment_family, sumavg_family

_FAMILY = os.environ.get("ENGINE_ROWORDER_FAMILY")
if _FAMILY == "sumavg":
    _ORACLED_IDS = sumavg_family()
elif _FAMILY == "moment":
    _ORACLED_IDS = moment_family()
elif _FAMILY is None or _FAMILY == "":
    _ORACLED_IDS = sorted(engine.ORACLES)
else:
    raise ValueError(
        f"ENGINE_ROWORDER_FAMILY={_FAMILY!r} is not a known soak family "
        "(expected 'sumavg', 'moment', or unset)"
    )


@pytest.fixture(scope="session")
def shuffled_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("roworder_sf")
    for i, t in enumerate(TABLES):
        src = pathlib.Path(SF_DIR) / f"{t}.parquet"
        tbl = pq.read_table(src)
        rng = np.random.RandomState(_SEED + i)
        perm = rng.permutation(len(tbl)) if len(tbl) else []
        pq.write_table(tbl.take(pa.array(perm, type=pa.int64())),
                       out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize(
    "qid", sorted(set(engine.QUERIES) - set(engine.ORACLES))
)
def test_no_oracle_query_survives_shuffled_rows(spark, shuffled_sf_dir, qid):
    df = engine.QUERIES[qid](spark, shuffled_sf_dir)
    assert materialize(df) >= 0
    assert len(df.schema.fields) > 0


def test_soak_families_are_nonempty():
    """Both soak-family predicates must keep matching a real population:
    an oracle refactor that rewrote SUM/AVG into window syntax or moved
    the moment folds engine-side would silently shrink the multi-seed
    soaks to nothing while every per-op test stayed green. Bounds, not
    exact counts, so adding operators never breaks this. Guards the
    SAME conftest helpers the soak parametrizes on (ADVICE r10: a copy
    of the predicate here would de-sync from the sweep silently)."""
    sumavg = sumavg_family()
    moments = moment_family()
    assert len(sumavg) >= 150, f"sumavg family collapsed: {len(sumavg)}"
    assert len(moments) >= 10, f"moment family collapsed: {len(moments)}"
    for known in ("agg_stats", "agg_corr_matrix", "udf_apply_in_pandas"):
        assert known in moments, f"{known} left the moment family"


@pytest.mark.parametrize("qid", _ORACLED_IDS)
def test_result_invariant_to_row_order(spark, shuffled_sf_dir, ddb, qid):
    """Spark on the shuffled twin vs the oracle on the CANONICAL
    fixtures: equality means the result is a pure function of table
    contents, independent of physical row order."""
    spark_df = engine.QUERIES[qid](spark, shuffled_sf_dir)
    oracle_pdf = ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[roworder-twin]")
