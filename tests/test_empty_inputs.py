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
from tests.conftest import SF_DIR, assert_frames_match, duck_connect, materialize

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
    assert materialize(df) >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("qid", ALL_IDS)
def test_query_survives_single_row_input(spark, onerow_sf_dir, qid):
    df = engine.QUERIES[qid](spark, onerow_sf_dir)
    assert materialize(df) >= 0
    assert len(df.schema.fields) > 0


# ---------------------------------------------------------------------------
# EXACT tiers (r7): the empty and one-row limits must also ORACLE-match
# — landing them caught sql_unpivot_surface's oracle silently dropping
# absent event types, sink_compaction's oracle hardcoding writer file
# counts that shrink with tiny inputs, events_user_overlap_jaccard's
# |A∪B|=0 ANSI abort, and llm_length_ks_audit's na·nb=0 abort.
# ---------------------------------------------------------------------------

# df_transpose_surface: DataFrame.transpose() makes one OUTPUT COLUMN
# per input row, so its schema is data-defined — a static oracle can
# mirror it at the canonical grain but not across row-count twins;
# the survival tier still runs it everywhere.
_SCHEMA_DATA_DEFINED = {"df_transpose_surface"}

# One-row exclusion: for a 1-row input Spark's round-robin repartition
# writer emits TWO part files where the input-aware oracle formula
# (files = LEAST(target, GREATEST(rows, 1))) predicts one — writer
# task-layout internals, not data semantics; empty + canonical are
# exact, one-row keeps the survival assertion.
_ONEROW_EXCLUDED = {"sink_compaction"} | _SCHEMA_DATA_DEFINED
_EMPTY_EXCLUDED = _SCHEMA_DATA_DEFINED


def _twin_ddb(sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def empty_ddb(empty_sf_dir):
    con = _twin_ddb(empty_sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def onerow_ddb(onerow_sf_dir):
    con = _twin_ddb(onerow_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "qid", sorted(set(engine.ORACLES) - _EMPTY_EXCLUDED)
)
def test_oracle_pair_under_empty_input(spark, empty_sf_dir, empty_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, empty_sf_dir)
    oracle_pdf = empty_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[empty-twin]")


@pytest.mark.parametrize(
    "qid", sorted(set(engine.ORACLES) - _ONEROW_EXCLUDED)
)
def test_oracle_pair_under_single_row(spark, onerow_sf_dir, onerow_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, onerow_sf_dir)
    oracle_pdf = onerow_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[onerow-twin]")
