"""Empty-input robustness: every registered query must plan and execute
over a schema-identical but EMPTY copy of the fixture tables.

At 100 TB, empty inputs are routine — a filter that matches nothing, a
partition with no files, a fresh date with no events yet — and an
operator that crashes on them (``first()[0]`` on no rows, schema
inference over a zero-partition write, ``np.stack`` of zero arrays)
takes the whole pipeline down. This sweep found and pinned 7 such
crashes in round 5 (packed-bitset width, embedding dim, broadcast
matmul, two partitioned read-backs).
"""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR

ALL_IDS = sorted(engine.QUERIES)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    """Schema-preserving empty twin of the fixture dir — written with
    pyarrow as SINGLE FILES (the fixture layout contract, BASELINE.md:
    'one parquet file per table'), so the streaming file-replay
    operators exercise their copy path too."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        src = pathlib.Path(SF_DIR) / f"{t}.parquet"
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="session")
def onerow_sf_dir(tmp_path_factory):
    """First row of every fixture table: the degenerate-statistics twin
    (min == max ranges, single-member groups, no joinable FK partners)
    that crashes range math the empty twin short-circuits past — caught
    agg_histogram's zero-width-bucket divide in round 5."""
    out = tmp_path_factory.mktemp("onerow_sf")
    for t in TABLES:
        src = pathlib.Path(SF_DIR) / f"{t}.parquet"
        pq.write_table(pq.read_table(src).slice(0, 1), out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("qid", ALL_IDS)
def test_query_survives_empty_input(spark, empty_sf_dir, qid):
    df = engine.QUERIES[qid](spark, empty_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("qid", ALL_IDS)
def test_query_survives_single_row_input(spark, onerow_sf_dir, qid):
    df = engine.QUERIES[qid](spark, onerow_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
