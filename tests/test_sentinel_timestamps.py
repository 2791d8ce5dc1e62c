"""Sentinel-timestamp sweep (SURVEY.md §5 adversarial-input layer): the
temporal family must SURVIVE a twin where ~1 event in 50 carries the
warehouse "no end date" sentinel TIMESTAMP '9999-12-31 23:59:59' and
~1 in 50 carries epoch 0 — both endemic in real feeds (NULL-avoiding
schemas, zeroed clocks, unit-confused producers). Year 9999 sits far
outside pandas' datetime64[ns] range (which ends 2262-04-11), so every
Arrow/pandas conversion path — grouped/cogrouped/map UDFs, pandas
round-trips — is one coercion away from an OutOfBounds abort; it also
stresses window frames and gap math with ±8000-year spans and
watermarks that leap past all other data.

Two tiers since r7. The EXACT tier compares every oracled query
against its oracle ON the twin via the collect-based comparator
(pandas timestamp[ns] cannot represent year 9999, so toPandas() — the
standard harness hop — raises even where both engines agree; collect()
returns python datetimes, which carry year 9999 fine). Landing the
tier surfaced one real scale hazard: the two dense-day-spine ops
(ts_gap_fill, ts_interpolate_linear) exploded to ~3M spine days per
user when one sentinel landed — both now carry an explicit 1990..2100
epoch-domain ingest guard on both engines (clock garbage is
quarantined, the spine stays bounded under arbitrary input).

The survival tier remains registry-wide — with sentinel instants injected,
different-but-valid results are expected (the sentinel becomes the max
everywhere, gaps become astronomical); the differential suite owns
value correctness on the canonical fixtures.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import duck_connect, SF_DIR, materialize, assert_frames_match_collected


@pytest.fixture(scope="session")
def sentinel_ts_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sentinelts_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (SELECT event_id,
                    CASE WHEN event_id % 50 = 11
                           THEN TIMESTAMP '9999-12-31 23:59:59'
                         WHEN event_id % 50 = 29
                           THEN TIMESTAMP '1970-01-01 00:00:00'
                         ELSE ts END AS ts,
                    user_id, event_type, value, props
                    FROM '{src}/events.parquet')
                    TO '{out}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


# Registry-wide, not just the temporal family: the crash this sweep
# caught was in a query whose UDF never READS ts — any operator that
# merely carries the column across an Arrow/pandas boundary is exposed.
@pytest.mark.parametrize("qid", sorted(engine.QUERIES))
def test_query_survives_sentinel_timestamps(spark, sentinel_ts_sf_dir, qid):
    df = engine.QUERIES[qid](spark, sentinel_ts_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def sentinel_ddb(sentinel_ts_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sentinel_ts_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_sentinel_timestamps(
    spark, sentinel_ts_sf_dir, sentinel_ddb, qid
):
    assert_frames_match_collected(
        engine.QUERIES[qid](spark, sentinel_ts_sf_dir),
        sentinel_ddb,
        engine.ORACLES[qid],
        qid=f"{qid}[sentinel-twin]",
    )
