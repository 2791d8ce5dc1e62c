"""Differential test: every registered oracle pair, Spark vs DuckDB
(SURVEY.md §5.2 item 1 — mirrors the driver's CORRECTNESS check).

No-oracle queries get a rows-run smoke check instead (driver parity).
"""

from __future__ import annotations

import pytest

import engine
from tests.conftest import SF_DIR, assert_frames_match

ORACLE_IDS = sorted(engine.ORACLES)
NO_ORACLE_IDS = sorted(set(engine.QUERIES) - set(engine.ORACLES))


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_oracle_pair(spark, ddb, qid):
    spark_df = engine.QUERIES[qid](spark, SF_DIR)
    oracle_pdf = ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=qid)


@pytest.mark.parametrize("qid", NO_ORACLE_IDS)
def test_no_oracle_smoke(spark, qid):
    df = engine.QUERIES[qid](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
