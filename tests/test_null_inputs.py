"""NULL-injection sweep (SURVEY.md §5 adversarial-input layer): every
registered query must SURVIVE a fixture twin with NULLs sprinkled into
the nullable payload columns (documents.text, events.value,
events.props) — at 100 TB, nulls in optional fields are routine (fetch
failures, schema drift, upstream bugs), and an operator that assumes
non-null payloads aborts a 10⁶-task job on one poisoned row.

This sweep found 6 real crashes when first run (round 5): the four
multimodal feature extractors and the audio op fed None where bytes
were promised (fixed: NULL payloads drop at ingest — the asset-pipeline
convention), the text sink serialized NULL rows as lost lines (fixed:
text format cannot represent NULL, filter + documented), and the Arrow
Python UDF crashed on None (fixed: NULL-safe return).

Payload-null tiers assert survival (aggregates skip nulls by SQL
semantics; the differential suite owns value correctness on canonical
fixtures). The r7 NULL-JOIN-KEY tier goes further: a twin nulls ~5 %
of o_custkey / user_id / l_suppkey — orphaned foreign keys and
anonymous sessions, routine at 100 TB — and every oracled query must
hash-match its oracle ON THE TWIN. Its first run caught four real
divergences (events_dau_wau, events_new_vs_returning, join_asof,
ts_interpolate_linear): Spark windows group all NULL keys into ONE
partition while SQL equality joins match none of them, so anonymous
rows were attributed engine-dependently. Fixed with the explicit
policy: per-user analytics drop NULL-user rows at ingest on both
sides; the as-of join keeps NULL-key rows but never matches them
(LEFT semantics, like the oracle's ASOF ON equality).
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, duck_connect, materialize


@pytest.fixture(scope="session")
def nulls_sf_dir(tmp_path_factory):
    """Fixture twin with ~2 % NULLs in nullable payload columns (never
    in keys/timestamps — those are structural)."""
    out = tmp_path_factory.mktemp("nulls_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (SELECT doc_id,
                    CASE WHEN doc_id % 50 = 7 THEN NULL ELSE text END AS text,
                    lang, source, n_chars
                    FROM '{src}/documents.parquet')
                    TO '{out}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            con.execute(
                f"""COPY (SELECT event_id, ts, user_id, event_type,
                    CASE WHEN event_id % 50 = 7 THEN NULL ELSE value END
                      AS value,
                    CASE WHEN event_id % 40 = 3 THEN NULL ELSE props END
                      AS props
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


@pytest.mark.parametrize("qid", sorted(engine.QUERIES))
def test_query_survives_null_payloads(spark, nulls_sf_dir, qid):
    df = engine.QUERIES[qid](spark, nulls_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def all_nulls_sf_dir(tmp_path_factory):
    """The harsher twin: the nullable payload columns are 100 % NULL
    (a whole dead shard — every fetch failed, every value dropped by
    upstream schema drift). Distinct failure class from the 2 % twin:
    per-GROUP aggregates over the payload all go NULL at once
    (min_max/sum None into arithmetic), not just per-row paths.
    Found udf_apply_in_arrow's range arithmetic crashing on an
    all-NULL group when first run (round 6)."""
    out = tmp_path_factory.mktemp("allnull_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (SELECT doc_id, CAST(NULL AS VARCHAR) AS text,
                    lang, source, n_chars
                    FROM '{src}/documents.parquet')
                    TO '{out}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            con.execute(
                f"""COPY (SELECT event_id, ts, user_id, event_type,
                    CAST(NULL AS DOUBLE) AS value,
                    CAST(NULL AS VARCHAR) AS props
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


@pytest.mark.parametrize("qid", sorted(engine.QUERIES))
def test_query_survives_all_null_payloads(spark, all_nulls_sf_dir, qid):
    df = engine.QUERIES[qid](spark, all_nulls_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    """Fixture twin with serialization-hostile text: embedded commas,
    quotes, newlines, tabs, and non-ASCII — the content that breaks
    naive CSV/text exporters. Found: the line-oriented text sink cannot
    represent embedded newlines (fixed: excluded by contract, like
    NULLs); CSV/JSON/XML roundtrips survive via their quoting rules."""
    out = tmp_path_factory.mktemp("adv_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (SELECT doc_id,
                    CASE doc_id % 7
                      WHEN 0 THEN 'comma, separated, "quoted" field'
                      WHEN 1 THEN 'line1' || chr(10) || 'line2 embedded'
                      WHEN 2 THEN 'unicode δοκιμή 测试 🚀 ok'
                      WHEN 3 THEN 'tab' || chr(9) || 'separated'
                      ELSE text END AS text,
                    lang, source, n_chars
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


# The ops that SERIALIZE or parse text content — the surface hostile
# strings actually stress; the rest of the registry treats text as an
# opaque value and is covered by the null sweep above.
_ADVERSARIAL_QIDS = [
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_xml_roundtrip",
    "source_text_roundtrip",
    "source_orc_roundtrip",
    "llm_chat_template",
    "fn_csv_parse",
    "llm_token_count",
    "llm_text_stats",
    "fn_array",
    "llm_exact_dedup",
    "llm_prefix_cluster",
    "udtf_python",
]


@pytest.mark.parametrize("qid", _ADVERSARIAL_QIDS)
def test_query_survives_hostile_strings(spark, adversarial_sf_dir, qid):
    df = engine.QUERIES[qid](spark, adversarial_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def negative_sf_dir(tmp_path_factory):
    """Fixture twin with ~11 % of event values NEGATED — refunds/
    chargebacks are routine in real value streams, and the statistical
    family (sqrt of variance terms, log-space means, sign-dependent
    medians) must not assume positivity. Full-registry probe found 0
    crashes; this pins the sqrt/log-bearing subset so a future edit
    cannot regress it."""
    out = tmp_path_factory.mktemp("neg_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (SELECT event_id, ts, user_id, event_type,
                    CASE WHEN event_id % 9 = 4 THEN -value ELSE value END
                      AS value, props
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


_NEGATIVE_QIDS = [
    "events_ab_welch",
    "events_anomaly_mad",
    "events_anomaly_zscore",
    "ts_seasonal_decompose",
    "agg_regr_family",
    "ts_autocorr",
    "agg_geomean",
    "agg_gini_concentration",
    "events_wilson_alert",
    "ts_cusum_change",
    "agg_stats",
    "win_pareto_days",
]


@pytest.mark.parametrize("qid", _NEGATIVE_QIDS)
def test_stat_ops_survive_negative_values(spark, negative_sf_dir, qid):
    df = engine.QUERIES[qid](spark, negative_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def null_keys_sf_dir(tmp_path_factory):
    """Fixture twin with ~5 % NULL JOIN KEYS (orphaned orders/lineitems,
    anonymous events) — keys, not payloads, unlike the tiers above."""
    out = tmp_path_factory.mktemp("nullkeys_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "orders":
            con.execute(
                f"""COPY (SELECT * REPLACE (
                    CASE WHEN o_orderkey % 20 = 11 THEN NULL
                         ELSE o_custkey END AS o_custkey)
                    FROM '{src}/orders.parquet')
                    TO '{out}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            con.execute(
                f"""COPY (SELECT * REPLACE (
                    CASE WHEN event_id % 20 = 11 THEN NULL
                         ELSE user_id END AS user_id)
                    FROM '{src}/events.parquet')
                    TO '{out}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (SELECT * REPLACE (
                    CASE WHEN l_orderkey % 20 = 11 THEN NULL
                         ELSE l_suppkey END AS l_suppkey)
                    FROM '{src}/lineitem.parquet')
                    TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


@pytest.fixture(scope="session")
def null_keys_ddb(null_keys_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_keys_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_null_join_keys(
    spark, null_keys_sf_dir, null_keys_ddb, qid
):
    spark_df = engine.QUERIES[qid](spark, null_keys_sf_dir)
    oracle_pdf = null_keys_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[nullkey-twin]")
