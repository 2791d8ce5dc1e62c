"""Duplicate-rows sweep (SURVEY.md §5 adversarial-input layer): every
registered query must SURVIVE a fixture twin where primary keys are NOT
unique — at 100 TB, at-least-once delivery, ingest replays, and
backfill overlaps make duplicate event_ids and doc_ids routine, and an
operator that assumes key uniqueness (a window keyed on the id, a
join that silently fans out, a reassembly that expects one row per key)
should degrade to a different-but-valid answer, never abort.

The twin duplicates ~10 % of events VERBATIM (the replay shape:
identical event_id AND payload) and re-keys ~10 % of documents onto an
EXISTING doc_id while keeping their own text (the backfill-collision
shape: same key, DIFFERENT payload — harsher than verbatim, since
"pick either" tie-breaks become visible and per-key aggregates see
conflicting values). lineitem gets a verbatim ~5 % duplication so the
relational family sees non-unique (orderkey, linenumber) too.

Only survival is asserted, not value equality: with duplicated input,
different-but-valid results are expected (counts shift, survivors may
change) — the differential suite owns value correctness on the
canonical fixtures.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import duck_connect, SF_DIR


@pytest.fixture(scope="session")
def dup_rows_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("duprows_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "events":
            # Replay shape: ~10% of events appear twice, byte-identical.
            con.execute(
                f"""COPY (
                    SELECT * FROM '{src}/events.parquet'
                    UNION ALL
                    SELECT * FROM '{src}/events.parquet'
                    WHERE event_id % 10 = 3)
                    TO '{out}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "documents":
            # Backfill-collision shape: ~10% of docs are re-keyed onto
            # the doc_id below them — same key, DIFFERENT text.
            con.execute(
                f"""COPY (
                    SELECT * FROM '{src}/documents.parquet'
                    UNION ALL
                    SELECT doc_id - 1 AS doc_id, text, lang, source,
                           n_chars
                    FROM '{src}/documents.parquet'
                    WHERE doc_id % 10 = 4 AND doc_id > 0)
                    TO '{out}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                    SELECT * FROM '{src}/lineitem.parquet'
                    UNION ALL
                    SELECT * FROM '{src}/lineitem.parquet'
                    WHERE l_orderkey % 20 = 9)
                    TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


@pytest.mark.parametrize("qid", sorted(engine.QUERIES))
def test_query_survives_duplicate_keys(spark, dup_rows_sf_dir, qid):
    df = engine.QUERIES[qid](spark, dup_rows_sf_dir)
    assert df.count() >= 0
