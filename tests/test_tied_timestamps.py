"""Tied-timestamp sweep (SURVEY.md §5 adversarial-input layer): the
temporal family must SURVIVE a twin where every event of ~1 user in 7
collapses onto a single instant — at 100 TB, batched/replayed clients
and second-granularity clocks produce exactly this (a device flushes an
offline queue with one timestamp), and it is the worst case for the
order-by-ts surface: zero inter-event gaps, zero session/streak
durations, total order ties inside every window frame, degenerate
OHLC/EWMA/interpolation spans, self-joining as-of keys.

Two assertion tiers (upgraded in r7 from survival-only):

- EXACT: every oracled query in the registry must hash-match its
  DuckDB oracle ON THE TWIN — both engines see the same tied data, so
  a divergence means a tie-break left to partition order rather than a
  unique sort key. This tier's first run caught four real ones (the
  max_by(close, ts) daily close in ts_ewma_smooth /
  ts_interpolate_linear / ts_gap_fill / win_nth_value — arbitrary
  among tied timestamps, now a lexicographic struct max over the
  unique (ts, event_id) prefix).
- SURVIVAL: the temporal family additionally runs against the harsher
  all-events-at-one-instant user shape below just to prove no abort;
  the exact tier already owns value correctness.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, duck_connect, materialize

# The ts-ordering consumers of events: sequence analytics, time-series,
# windows ordered by ts, streaming (event-time), temporal joins, and
# the grouped-UDF ops that sort within groups.
_TEMPORAL_QIDS = [
    "events_ab_welch",
    "events_active_streak_max",
    "events_anomaly_mad",
    "events_anomaly_zscore",
    "events_attribution_linear",
    "events_cooccurrence",
    "events_dau_wau",
    "events_funnel",
    "events_gap_percentiles",
    "events_hourly_profile",
    "events_markov_transitions",
    "events_new_vs_returning",
    "events_path_topk",
    "events_retention",
    "events_rfm",
    "events_survival_curve",
    "events_user_overlap_jaccard",
    "events_wilson_alert",
    "events_window_funnel",
    "ts_asof_nearest",
    "ts_autocorr",
    "ts_cusum_change",
    "ts_ewma_smooth",
    "ts_gap_fill",
    "ts_interpolate_linear",
    "ts_naive_forecast_eval",
    "ts_ohlc_bars",
    "ts_peak_days",
    "ts_rolling_zscore",
    "ts_seasonal_decompose",
    "win_gap_islands",
    "win_lag_lead",
    "win_moving_avg",
    "win_nth_value",
    "win_ntile_cume",
    "win_pareto_days",
    "win_pct_change",
    "win_quantile_normalize",
    "win_range_interval",
    "win_rolling_median",
    "win_running_distinct",
    "win_sessionize",
    "win_weighted_ma",
    "stream_dedup",
    "stream_foreach_batch_merge",
    "stream_session",
    "stream_sliding",
    "stream_stream_join",
    "stream_tumbling",
    "stream_tws_counter",
    "stream_user_state",
    "stream_watermark_design",
    "join_asof",
    "join_interval_overlap",
    "join_range_theta",
    "merge_scd2_versions",
    "udf_apply_in_pandas",
    "udf_apply_in_arrow",
]


@pytest.fixture(scope="session")
def tied_ts_sf_dir(tmp_path_factory):
    """Fixture twin where users with user_id%7=2 have ALL their events
    at their first-seen instant (offline-queue flush shape)."""
    out = tmp_path_factory.mktemp("tiedts_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (SELECT event_id,
                    CASE WHEN user_id % 7 = 2
                         THEN min(ts) OVER (PARTITION BY user_id)
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


@pytest.mark.parametrize("qid", _TEMPORAL_QIDS)
def test_query_survives_tied_timestamps(spark, tied_ts_sf_dir, qid):
    df = engine.QUERIES[qid](spark, tied_ts_sf_dir)
    assert materialize(df) >= 0


@pytest.fixture(scope="session")
def tied_ddb(tied_ts_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tied_ts_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_tied_timestamps(spark, tied_ts_sf_dir, tied_ddb, qid):
    spark_df = engine.QUERIES[qid](spark, tied_ts_sf_dir)
    oracle_pdf = tied_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[tied-twin]")
