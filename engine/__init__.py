"""PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities surveyed in SURVEY.md (the reference repo,
alehakad/FootballDataEngeneering @ /root/reference, contains no code —
README.md:1-2 + LICENSE only — so the capability contract is SURVEY.md §2's
operator inventory: relational batch analytics over a star schema, an events
stream, and LLM-data-pipeline operators, all designed for 100 TB scale).

Importing this package populates the query/oracle registry (see
``engine.registry``); ``__spark_entry__.py`` is a thin shim over it.
"""

from engine import registry as registry  # noqa: F401

# Importing the operator modules registers their queries/oracles.
#
# ORDER MATTERS for the driver's correctness sweep: it checks queries in
# registration order and caps the per-round report at 50 rows
# (CORRECTNESS_r01-r06 each held exactly the first 50 registrations).
# Through round 6 the window was steered by module import order; from
# round 7 the exact window is pinned explicitly via
# ``registry.promote(_R7_WINDOW)`` at the bottom of this file (import
# order alone cannot place a single re-check query from a large
# already-green module into the window without dragging its siblings).
#
# Round-7 window (exactly 50, per VERDICT r6 items 1-2): the ENTIRE
# remaining 41-op untested backlog — seeds14-27, every operator that has
# never held a driver correctness row — plus 9 re-check slots for the
# r6-changed code paths and one rows-only→oracle upgrade representative
# (enumerated at _R7_RECHECKS below). This finishes the rotation begun
# in r5: after a green r7, all 289 registered operators have a driver
# row and the window discipline can retire to steady-state re-checks.
from engine import seeds14 as seeds14  # noqa: F401
from engine import seeds15 as seeds15  # noqa: F401
from engine import seeds16 as seeds16  # noqa: F401
from engine import seeds17 as seeds17  # noqa: F401
from engine import seeds18 as seeds18  # noqa: F401
from engine import seeds19 as seeds19  # noqa: F401
from engine import seeds20 as seeds20  # noqa: F401
from engine import seeds21 as seeds21  # noqa: F401
from engine import seeds23 as seeds23  # noqa: F401
from engine import seeds24 as seeds24  # noqa: F401
from engine import seeds25 as seeds25  # noqa: F401
from engine import seeds26 as seeds26  # noqa: F401
from engine import seeds27 as seeds27  # noqa: F401

# Proven families (green in a prior round) register after the backlog;
# promote() below makes the exact order past position 50 irrelevant to
# the driver window, but keeping backlog-first import order means the
# file still reads in rotation order.
from engine import seeds8 as seeds8  # noqa: F401
from engine import seeds9 as seeds9  # noqa: F401
from engine import seeds10 as seeds10  # noqa: F401
from engine import seeds11 as seeds11  # noqa: F401
from engine import seeds12 as seeds12  # noqa: F401
from engine import seeds13 as seeds13  # noqa: F401
from engine import seeds22 as seeds22  # noqa: F401
from engine import seeds5 as seeds5  # noqa: F401
from engine import seeds6 as seeds6  # noqa: F401
from engine import seeds7 as seeds7  # noqa: F401
from engine import streaming_ext as streaming_ext  # noqa: F401
from engine import pipeline_ops as pipeline_ops  # noqa: F401
from engine import surface4 as surface4  # noqa: F401
from engine import tpch4 as tpch4  # noqa: F401
from engine import curation2 as curation2  # noqa: F401
from engine import tpch_ext as tpch_ext  # noqa: F401
from engine import windows_ext as windows_ext  # noqa: F401
from engine import training_ops as training_ops  # noqa: F401
from engine import llm_ops as llm_ops  # noqa: F401
from engine import ext_ops as ext_ops  # noqa: F401
from engine import streaming as streaming  # noqa: F401
from engine import udx as udx  # noqa: F401
from engine import analytics_ops as analytics_ops  # noqa: F401
from engine import text_source as text_source  # noqa: F401
from engine import scale_ops as scale_ops  # noqa: F401
from engine import multimodal as multimodal  # noqa: F401
from engine import composite as composite  # noqa: F401
from engine import relational as relational  # noqa: F401
from engine import functions as functions  # noqa: F401
from engine import windows as windows  # noqa: F401

# Deferred (callable) oracles compose other registered oracles; resolve
# them now that every module has imported.
registry.resolve_oracles()

# Round-7 re-check slots (VERDICT r6 item 2) — exactly the 9 spare
# window positions after the 41-op backlog. Selection, from the list
# enumerated in r6 (each holds a green prior driver row + the
# post-change sf0.1 differential, BASELINE.md):
#   llm_lsh_neardup, llm_ngram_lsh    r6 materialize_tok + spread +
#                                     chunked char_shingles rewrite
#   llm_dedup_clusters, llm_dedup_survivors, llm_dedup_pipeline
#                                     the full dedup-memo trio (r6
#                                     dedup_labels memo / shared edges)
#   llm_simhash_neardup               r6 simhash_neardup_pairs split —
#                                     executes _simhash_df too, so it
#                                     covers the llm_simhash change with
#                                     one slot
#   llm_fingerprint                   giant-doc fix representative
#                                     (token array bound outside the
#                                     transform lambda)
#   udf_apply_in_pandas               sentinel-ts fix representative
#                                     (input projected to consumed
#                                     columns before the Python channel)
#   source_csv_roundtrip              the rows-only→full-oracle upgrade
#                                     representative (r6 gave it a real
#                                     oracle; driver last saw rows-only)
# Deferred to the ROUND-8 window (first in line once r7 is green): the
# oracle upgrades without a driver hash row —
# source_json_roundtrip, source_orc_roundtrip, source_text_roundtrip,
# sink_partitioned_parquet, llm_minhash_sketch, and
# stream_watermark_design (upgraded rows-only→full oracle in r7: the
# single-file availableNow replay in complete mode is deterministic
# and equals the batch 1-h × event_type aggregate) — plus
# llm_ngram_novelty and llm_decontaminate (spread/giant-doc-touched
# producers covered locally by the sf0.1 sweep but not yet re-checked
# driver-side), join_asof (r7 tie-rule fix: clicks sort before
# purchases at equal ts, found by the hot-key sweep
# tests/test_skewed_keys.py; re-verified locally at 3 SFs + the skew
# twin, last driver row r1), and the r7 deterministic-close quartet
# (ts_ewma_smooth, ts_interpolate_linear, ts_gap_fill, win_nth_value —
# max_by(close, ts) replaced by a struct max over the unique
# (ts, event_id) prefix after the tied-timestamps exact sweep caught
# the tie ambiguity; re-verified at 3 SFs + all three twins) plus the
# four rid-re-keyed oracles (fn_explode_outer, mm_image_features,
# mm_image_resize, mm_audio_features — oracle-side join-back fan-out
# under duplicate ids, Spark side untouched). The r7 NULL-join-key
# policy also touched ts_interpolate_linear (covered by the quartet
# slot) and join_asof (already listed); events_dau_wau and
# events_new_vs_returning sit INSIDE the r7 window, so their policy
# filters get driver rows this round.
#
# r7 late-round zero/empty/onerow/nonfinite hardening (every adversarial
# twin upgraded from survival-only to exact-oracle tiers; the r8 window
# should re-check the CHANGED ops whose last driver row predates the
# change): try_divide fixes — agg_stats, agg_skew_kurtosis,
# events_ab_welch, win_pct_change, win_ratio_to_report, win_pareto_days,
# llm_zipf_slope, q8_market_share, q14_promo_revenue,
# events_user_overlap_jaccard, mm_embedding_centroids (try_cast
# quantization), fn_math (oracle LN-guard); grouping-sets empty-input
# HAVING guards — agg_cube, agg_rollup, agg_grouping_sets,
# agg_grouping_sets_df; sink_compaction (input-aware oracle file
# counts). The window ops touched late in r7 (agg_grouping_id_surface,
# df_observe_metrics, ts_naive_forecast_eval, llm_survivor_policy_longest,
# llm_length_ks_audit, sql_unpivot_surface) get fresh r7 driver rows
# automatically. All changed pairs re-verified
# at sf0.01 canonical + the relevant twins (BASELINE.md r7 entries).
# NO new seed operators this round (freeze holds until the backlog is
# zero; registry stays at 289).
_R7_RECHECKS = [
    "llm_lsh_neardup",
    "llm_ngram_lsh",
    "llm_dedup_clusters",
    "llm_dedup_survivors",
    "llm_dedup_pipeline",
    "llm_simhash_neardup",
    "llm_fingerprint",
    "udf_apply_in_pandas",
    "source_csv_roundtrip",
]

_R7_BACKLOG_MODULES = {
    f"engine.seeds{n}" for n in (14, 15, 16, 17, 18, 19, 20, 21,
                                 23, 24, 25, 26, 27)
}

# The 41 never-driver-checked ops, in their module registration order,
# then the 9 re-checks = the exact 50-row round-7 driver window
# (pinned by tests/test_plans.py::test_round7_correctness_window_priority).
_R7_WINDOW = [
    q
    for q in registry.QUERIES
    if registry.QUERIES[q].__module__ in _R7_BACKLOG_MODULES
] + _R7_RECHECKS
registry.promote(_R7_WINDOW)

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
