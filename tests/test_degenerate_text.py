"""Degenerate-text sweep (SURVEY.md §5 adversarial-input layer): every
documents.text consumer must SURVIVE empty (''), whitespace-only, and
single-character documents — at 100 TB these are routine (scraper got a
200 with an empty body, OCR produced blank pages, a boilerplate filter
stripped everything), and the quality/tokenize/shingle family divides
by word counts, shingle counts, and distinct-token counts that all hit
ZERO on such rows.

n_chars is kept consistent with the rewritten text (length drift is a
different failure; this sweep isolates the zero-denominator /
empty-collection surface).

Only survival is asserted — with degenerate rows present,
different-but-valid results are expected (a zero-word doc legitimately
gets NULL quality ratios); the differential suite owns value
correctness on the canonical fixtures.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR, assert_frames_match, duck_connect, materialize

# Every query that consumes documents.text, directly or through the
# shared token/shingle/simhash helpers.
_TEXT_QIDS = [
    "dq_constraint_report",
    "fn_aes_roundtrip",
    "fn_array",
    "fn_array_doc_stats",
    "fn_csv_parse",
    "fn_explode_outer",
    "fn_hash",
    "fn_regexp_extract_report",
    "fn_url_parse",
    "llm_bigram_surprisal",
    "llm_block_dedup",
    "llm_bm25_topk",
    "llm_chat_template",
    "llm_chunk_roundtrip",
    "llm_chunk_split",
    "llm_code_fraction",
    "llm_containment_neardup",
    "llm_cross_source_overlap",
    "llm_curriculum_stages",
    "llm_dataset_card",
    "llm_decontaminate",
    "llm_decontaminate_lsh",
    "llm_dedup_clusters",
    "llm_dedup_pipeline",
    "llm_dedup_recall",
    "llm_dedup_survivors",
    "llm_doc_entropy",
    "llm_domain_mixture",
    "llm_edit_distance_dedup",
    "llm_exact_dedup",
    "llm_fingerprint",
    "llm_gopher_quality",
    "llm_inverted_index",
    "llm_jaccard_neardup",
    "llm_kfold_split",
    "llm_lang_id",
    "llm_langid_confusion",
    "llm_length_ks_audit",
    "llm_lsh_neardup",
    "llm_minhash_sketch",
    "llm_mixture_epochs",
    "llm_multimodal_join",
    "llm_ngram_jaccard",
    "llm_ngram_lsh",
    "llm_ngram_novelty",
    "llm_pii_mask",
    "llm_prefix_cluster",
    "llm_quality_buckets",
    "llm_quality_filter",
    "llm_quality_score",
    "llm_repetition_filter",
    "llm_sample_stratified",
    "llm_seq_packing",
    "llm_shard_manifest",
    "llm_simhash",
    "llm_simhash_neardup",
    "llm_simhash_recall",
    "llm_stopword_profile",
    "llm_survivor_policy_longest",
    "llm_temperature_mixture",
    "llm_text_stats",
    "llm_tfidf_topterms",
    "llm_token_count",
    "llm_token_regex",
    "llm_train_test_split",
    "llm_unigram_surprisal",
    "llm_winsorize_clip",
    "llm_zipf_slope",
    "mm_audio_features",
    "mm_frame_sample",
    "mm_image_features",
    "mm_image_resize",
    "mm_payload_dedup",
    "source_schema_evolution",
    "source_text_roundtrip",
    "sql_lateral_view_explode",
    "udf_cogroup_pandas",
    "udtf_python",
]


@pytest.fixture(scope="session")
def degenerate_text_sf_dir(tmp_path_factory):
    """Fixture twin where ~18 % of docs are degenerate: empty
    (doc_id%13=3), whitespace-only (doc_id%17=5), single-char
    (doc_id%19=7); n_chars tracks the rewrite."""
    out = tmp_path_factory.mktemp("degtext_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                    WITH rewritten AS (
                      SELECT doc_id,
                        CASE
                          WHEN doc_id % 13 = 3 THEN ''
                          WHEN doc_id % 17 = 5 THEN '   ' || chr(9) || '  '
                          WHEN doc_id % 19 = 7 THEN 'x'
                          ELSE text END AS text,
                        lang, source
                      FROM '{src}/documents.parquet')
                    SELECT doc_id, text, lang, source,
                           CAST(length(text) AS INT) AS n_chars
                    FROM rewritten)
                    TO '{out}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


@pytest.mark.parametrize("qid", _TEXT_QIDS)
def test_query_survives_degenerate_text(spark, degenerate_text_sf_dir, qid):
    df = engine.QUERIES[qid](spark, degenerate_text_sf_dir)
    assert materialize(df) >= 0


# EXACT tier (r7): full-registry oracle equality on the degenerate-text
# twin — landing it caught llm_survivor_policy_longest's INT32 overflow
# in the n_chars·10⁸ survivor pack (now explicitly BIGINT on both
# engines).


@pytest.fixture(scope="session")
def degen_ddb(degenerate_text_sf_dir):
    con = duck_connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_text_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(engine.ORACLES))
def test_oracle_pair_under_degenerate_text(
    spark, degenerate_text_sf_dir, degen_ddb, qid
):
    spark_df = engine.QUERIES[qid](spark, degenerate_text_sf_dir)
    oracle_pdf = degen_ddb.execute(engine.ORACLES[qid]).fetchdf()
    assert_frames_match(spark_df, oracle_pdf, qid=f"{qid}[degen-twin]")
