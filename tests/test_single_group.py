"""Single-group-collapse sweep (SURVEY.md §5 adversarial-input layer):
the grouped surface must SURVIVE twins where the grouping key has ONE
value — at 100 TB this is the hot-key limit (a bot account owning a
whole shard's events; a monolingual crawl slice) and the worst case for
every ``partitionBy(user_id)`` window (one partition holds everything),
for cohort analytics (cohorts of size one / size N with no second
cohort to compare), for A/B machinery (a variant group can be EMPTY —
assignment is hashed from the collapsed key), and for per-language
machinery (one stratum, chi²-style expected counts built from a single
label, per-lang vocabularies becoming global).

Only survival is asserted — with one group, degenerate-but-valid
results are expected (a Welch test with an empty arm has no t; a
retention matrix has one cohort row); the differential suite owns value
correctness on the canonical fixtures.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import duck_connect, SF_DIR, materialize, assert_frames_match
from tests.test_degenerate_text import _TEXT_QIDS
from tests.test_tied_timestamps import _TEMPORAL_QIDS

# Documents consumers that group/stratify/window by lang on top of the
# text surface itself.
_LANG_EXTRA_QIDS = [
    "llm_domain_mixture",
    "llm_sample_stratified",
    "llm_kfold_split",
    "llm_train_test_split",
    "llm_temperature_mixture",
    "llm_curriculum_stages",
    "llm_mixture_epochs",
    "llm_shard_manifest",
    "llm_quality_buckets",
    "llm_length_ks_audit",
    "llm_langid_confusion",
    "llm_stopword_profile",
    "llm_zipf_slope",
    "llm_tfidf_topterms",
]


@pytest.fixture(scope="session")
def one_user_sf_dir(tmp_path_factory):
    """Events twin where EVERY event belongs to the corpus's min
    user_id (hot-key limit; event identity and ordering untouched)."""
    out = tmp_path_factory.mktemp("oneuser_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (SELECT event_id, ts,
                    (SELECT min(user_id) FROM '{src}/events.parquet')
                      AS user_id,
                    event_type, value, props
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


@pytest.fixture(scope="session")
def one_lang_sf_dir(tmp_path_factory):
    """Documents twin where EVERY document carries the corpus's min
    lang (monolingual-slice limit; text untouched)."""
    out = tmp_path_factory.mktemp("onelang_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (SELECT doc_id, text,
                    (SELECT min(lang) FROM '{src}/documents.parquet')
                      AS lang,
                    source, n_chars
                    FROM '{src}/documents.parquet')
                    TO '{out}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


@pytest.mark.parametrize("qid", _TEMPORAL_QIDS)
def test_query_survives_one_user(spark, one_user_sf_dir, qid):
    df = engine.QUERIES[qid](spark, one_user_sf_dir)
    assert materialize(df) >= 0


@pytest.mark.parametrize("qid", sorted(set(_TEXT_QIDS) | set(_LANG_EXTRA_QIDS)))
def test_query_survives_one_lang(spark, one_lang_sf_dir, qid):
    df = engine.QUERIES[qid](spark, one_lang_sf_dir)
    assert materialize(df) >= 0


def test_one_user_semantics_fully_determined(spark, one_user_sf_dir):
    """Where one user makes the answer a theorem, pin the value, not
    just survival: every active day has DAU = WAU = 1; every event-type
    pair shares the single user exactly (jaccard 1, |both| = |either|
    = 1); exactly one first-seen day corpus-wide, and each day's
    new + returning = 1."""
    rows = engine.QUERIES["events_dau_wau"](
        spark, one_user_sf_dir
    ).collect()
    assert rows and all(r["dau"] == 1 and r["wau"] == 1 for r in rows)

    rows = engine.QUERIES["events_user_overlap_jaccard"](
        spark, one_user_sf_dir
    ).collect()
    assert rows and all(
        r["n_both"] == 1 and r["n_either"] == 1 and r["jaccard"] == 1.0
        for r in rows
    )

    rows = engine.QUERIES["events_new_vs_returning"](
        spark, one_user_sf_dir
    ).collect()
    assert rows
    assert sum(r["n_new"] for r in rows) == 1
    assert all(r["n_new"] + r["n_returning"] == 1 for r in rows)


# EXACT tier (r7): the one-user / one-lang limits came back clean on
# the full-registry compare, so they are locked in — a future operator
# whose math degenerates at a single group diverges here, not at 100 TB.


@pytest.fixture(scope="session")
def one_user_ddb(one_user_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{one_user_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def one_lang_ddb(one_lang_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{one_lang_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_one_user(spark, one_user_sf_dir, one_user_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, one_user_sf_dir)
    oracle_pdf = one_user_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[one-user-twin]")


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_one_lang(spark, one_lang_sf_dir, one_lang_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, one_lang_sf_dir)
    oracle_pdf = one_lang_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[one-lang-twin]")
