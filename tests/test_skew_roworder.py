"""Composed skew × row-order sweep (VERDICT r9 item 4 / r8 item 8).

The three historical rounding flaps (q9 at sf0.001, sql_scalar_subquery
at sf0.01, agg_unpivot at sf0.1) each surfaced at exactly ONE scale
factor and ONE data shape — so the order×skew×scale cube needs the
composed corner checked, not just the two faces: a HOT KEY concentrates
a group's addends into one giant fold (maximizing accumulated drift)
while ROW SHUFFLING permutes the fold's order (maximizing the chance a
drifted value crosses a rounding boundary). This sweep composes both
twins over the SUM/AVG-bearing oracle family — the population the r10
quantization audit converted or cleared (BASELINE.md r10).

Construction: the skew twin (tests/test_skewed_keys.py — ~50 % of
orders/events/lineitem on one key + 6-hour tied-timestamp grid) is
row-SHUFFLED per table for the Spark side, while the DuckDB oracle
reads the CANONICAL (unshuffled) skew twin. Hash equality therefore
proves each result is a pure function of the skewed table CONTENTS —
under the adversarial key distribution, at whatever SF the run sets
(ENGINE_TEST_SF_DIR; the r10 closing sweep records sf0.1).

The permutation seed is env-overridable (ENGINE_ROWORDER_SEED) so soak
runs sweep many orders; the default differs from test_row_order's so
the two sweeps never test the same permutation twice.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import engine
from engine.session import TABLES
from tests.conftest import assert_frames_match, duck_connect
from tests.test_skewed_keys import skew_sf_dir  # noqa: F401  (fixture)

_SEED = int(os.environ.get("ENGINE_ROWORDER_SEED", str(0x5209)), 0)

# The audited population: every oracled op whose oracle folds a SUM or
# AVG — the SHARED conftest predicate (ADVICE r10: three hand-copied
# predicates risked silent de-sync), so new operators join
# automatically and the family-collapse pin guards this exact list.
# ENGINE_SKEW_ROWORDER_ALL=1 widens the sweep to EVERY oracled op —
# the composed twin's first full-registry run at sf0.1 caught a
# tie-order-sensitive oracle (stream_session) that nine rounds of
# single-face sweeps never reached, so the wide mode is worth its cost
# on closing sweeps.
from tests.conftest import sumavg_family

if os.environ.get("ENGINE_SKEW_ROWORDER_ALL"):
    SUMAVG_FAMILY = sorted(engine.ORACLES)
else:
    SUMAVG_FAMILY = sumavg_family()


def test_family_is_nonempty_and_large():
    """The family matched ~155 ops when the audit ran; a collapse to a
    handful means the registry or the match broke, not the ops."""
    assert len(SUMAVG_FAMILY) > 100, SUMAVG_FAMILY[:10]


@pytest.fixture(scope="session")
def skew_shuffled_sf_dir(skew_sf_dir, tmp_path_factory):  # noqa: F811
    """Row-shuffled copy of the skew twin (Spark side)."""
    out = tmp_path_factory.mktemp("skew_roworder_sf")
    for i, t in enumerate(TABLES):
        tbl = pq.read_table(pathlib.Path(skew_sf_dir) / f"{t}.parquet")
        rng = np.random.RandomState(_SEED + i)
        perm = rng.permutation(len(tbl)) if len(tbl) else []
        pq.write_table(
            tbl.take(pa.array(perm, type=pa.int64())), out / f"{t}.parquet"
        )
    return str(out)


@pytest.fixture(scope="session")
def skew_oracle(skew_sf_dir):  # noqa: F811
    """DuckDB over the CANONICAL skew twin — different physical order
    from the Spark side by construction."""
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{skew_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", SUMAVG_FAMILY)
def test_sumavg_invariant_on_skewed_shuffled_rows(
    spark, skew_shuffled_sf_dir, skew_oracle, qid
):
    spark_df = engine.QUERIES[qid](spark, skew_shuffled_sf_dir)
    oracle_pdf = skew_oracle.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[skew-roworder]")
