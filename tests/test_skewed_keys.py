"""Hot-key (skew) differential sweep (SURVEY.md §5 adversarial-input
layer): at 100 TB the dominant operational hazard for joins and
keyed aggregates is a HOT KEY — one customer holding half the orders,
one user emitting half the events (a bot, a default/sentinel id, a
null-bucket surrogate). The existing sweeps cover duplicates, ties,
nulls, zeros, and giant payloads, but none makes a single join/group
key dominate at volume.

This twin re-keys ~50 % of orders onto the minimum custkey, ~50 % of
events onto the minimum user_id, and ~50 % of lineitem onto the
minimum suppkey — primary keys stay UNIQUE, so every deterministic
query must produce the SAME answer Spark-side and DuckDB-side on the
twin: the sweep asserts full frame equality against the registered
oracle, not mere survival. Two latent-bug classes this catches that
the canonical fixtures cannot:

- partitioning-/salting-sensitivity: an operator whose result depends
  on how a hot key's rows land in partitions (join_skew_salted's
  salt leaking into output, an accumulation order observable through
  under-rounded floats) diverges from the single-threaded oracle;
- tie-break nondeterminism: merging users creates CROSS-USER tied
  (user_id, ts) pairs the canonical fixture never had — a window that
  orders by ts without a unique tiebreak goes engine-dependent here
  (both this sweep and the tied-timestamps sweep assert value
  equality against the oracle, registry-wide).

Scope: EVERY oracled query in the registry (upgraded in r7 from a
curated 50-query subset once the full-registry compare came back
clean) — queries whose inputs are untouched by the re-keying are
cheap at this SF and guard against future operators quietly joining
through the skewed columns.
"""

from __future__ import annotations

import pathlib

import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, duck_connect


@pytest.fixture(scope="session")
def skew_sf_dir(tmp_path_factory):
    """Fixture twin with one dominant key per fact table (~50 % of
    rows), primary keys untouched."""
    out = tmp_path_factory.mktemp("skew_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    hot_cust = con.execute(
        f"SELECT MIN(c_custkey) FROM '{src}/customer.parquet'"
    ).fetchone()[0]
    hot_user = con.execute(
        f"SELECT MIN(user_id) FROM '{src}/events.parquet'"
    ).fetchone()[0]
    hot_supp = con.execute(
        f"SELECT MIN(s_suppkey) FROM '{src}/supplier.parquet'"
    ).fetchone()[0]
    for t in TABLES:
        if t == "orders":
            con.execute(
                f"""COPY (
                    SELECT o_orderkey,
                           CASE WHEN o_orderkey % 2 = 0 THEN {hot_cust}
                                ELSE o_custkey END AS o_custkey,
                           * EXCLUDE (o_orderkey, o_custkey)
                    FROM '{src}/orders.parquet')
                    TO '{out}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            # The hot user's events also snap to a 6-hour grid: the
            # canonical fixture's timestamps are globally unique AND
            # near-evenly spaced (~43 min apart at sf0.001), so any
            # finer grid leaves the merged user with zero tied
            # (user_id, ts) pairs and the tie-break half of the sweep
            # would be vacuous. The coarse grid stacks many events on
            # identical instants — the offline-queue-flush shape at a
            # volume the tied-timestamps sweep never reaches.
            con.execute(
                f"""COPY (
                    SELECT event_id,
                           CASE WHEN event_id % 2 = 0
                                THEN time_bucket(INTERVAL 6 HOUR, ts)
                                ELSE ts END AS ts,
                           CASE WHEN event_id % 2 = 0 THEN {hot_user}
                                ELSE user_id END AS user_id,
                           event_type, value, props
                    FROM '{src}/events.parquet')
                    TO '{out}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                    SELECT * REPLACE (
                        CASE WHEN l_orderkey % 2 = 0 THEN {hot_supp}
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
def skew_ddb(skew_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{skew_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_skew_twin_is_actually_skewed(skew_ddb):
    """The twin must put ≥40 % of each fact on its hot key — otherwise
    the sweep silently tests nothing — and the hot user must actually
    carry tied (user_id, ts) pairs (the canonical fixture's timestamps
    are globally unique, so the grid-snap is what makes the tie-break
    assertions non-vacuous)."""
    n_tied = skew_ddb.execute(
        "SELECT COUNT(*) FROM (SELECT user_id, ts, COUNT(*) c "
        "FROM events GROUP BY 1, 2 HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert n_tied > 0, "no tied (user_id, ts) pairs — tie sweep vacuous"
    for sql, lo in [
        ("SELECT MAX(n)::DOUBLE / SUM(n) FROM (SELECT COUNT(*) n "
         "FROM orders GROUP BY o_custkey)", 0.4),
        ("SELECT MAX(n)::DOUBLE / SUM(n) FROM (SELECT COUNT(*) n "
         "FROM events GROUP BY user_id)", 0.4),
        ("SELECT MAX(n)::DOUBLE / SUM(n) FROM (SELECT COUNT(*) n "
         "FROM lineitem GROUP BY l_suppkey)", 0.4),
    ]:
        share = skew_ddb.execute(sql).fetchone()[0]
        assert share >= lo, f"twin not skewed: {sql} -> {share}"


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_hot_key(spark, skew_sf_dir, skew_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, skew_sf_dir)
    oracle_pdf = skew_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[skew-twin]")
