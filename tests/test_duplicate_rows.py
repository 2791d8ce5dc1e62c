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

Two assertion tiers (upgraded in r7 from survival-only):

- EXACT: every oracled query outside the doc-identity family must
  hash-match its DuckDB oracle ON THE TWIN — both engines see the same
  duplicated data, so a divergence means the Spark plan or the oracle
  spelling silently assumed key uniqueness (this tier caught four
  oracle join-back fan-outs on its first run: fn_explode_outer and the
  three multimodal feature oracles, all re-keyed onto synthetic row
  ids).
- SURVIVAL: the doc-identity family (_DOC_IDENTITY_QIDS below) — the
  dedup/near-dup/decontamination evaluators whose semantic SUBJECT is
  the document id. For them, unique doc_id is a declared INPUT
  CONTRACT: a real pipeline assigns content-stable ids (llm_exact_dedup
  is the assigner in this engine) before near-dup runs, and "the
  Jaccard of doc 7" is semantically ill-posed when two different texts
  claim id 7. They must still run to completion on the twin.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, duck_connect, materialize


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


# The dedup/near-dup/decontamination evaluators: doc identity IS their
# semantics, so duplicate doc_ids with conflicting payloads make their
# question ill-posed (which text is "doc 7"?). Unique ids are their
# declared input contract; everything else must stay oracle-exact.
_DOC_IDENTITY_QIDS = {
    "llm_decontaminate_lsh",
    "llm_dedup_clusters",
    "llm_dedup_recall",
    "llm_dedup_survivors",
    "llm_jaccard_neardup",
    "llm_lsh_neardup",
    "llm_ngram_lsh",
    "llm_ngram_novelty",
    "llm_simhash_recall",
}


@pytest.fixture(scope="session")
def dup_ddb(dup_rows_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dup_rows_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.QUERIES))
def test_query_survives_duplicate_keys(spark, dup_rows_sf_dir, qid):
    df = engine.QUERIES[qid](spark, dup_rows_sf_dir)
    assert materialize(df) >= 0


@pytest.mark.parametrize(
    "qid", sorted(set(engine.ORACLES) - _DOC_IDENTITY_QIDS)
)
def test_oracle_pair_under_duplicate_keys(spark, dup_rows_sf_dir, dup_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, dup_rows_sf_dir)
    oracle_pdf = dup_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[dup-twin]")
