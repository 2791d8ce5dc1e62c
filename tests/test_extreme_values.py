"""Non-finite-float sweep (SURVEY.md §5 adversarial-input layer): the
embedding-consuming family must SURVIVE vectors containing NaN and
±Infinity — at 100 TB, a handful of poisoned embeddings are routine
(fp16 overflow upstream, a zero-division in the embedder, truncated
writes), and a similarity/clustering operator that aborts or hangs on
one non-finite component kills the whole index build.

Only survival is asserted, not value equality: NaN comparison/sort
semantics legitimately differ across engines (Spark orders NaN last
and groups NaN==NaN; IEEE comparisons inside DuckDB differ), so a
value-differential on poisoned vectors would flag semantics, not
defects.  The differential suite owns value correctness on the
canonical (all-finite) fixtures; this sweep pins "no crash, no hang,
no poisoned-row job abort".
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import engine
from engine.session import TABLES
from tests.conftest import duck_connect, SF_DIR

# Every query that reads embeddings.embedding (directly or, for
# llm_ann_recall, through its two composed searches).
_EMBEDDING_QIDS = [
    "llm_cosine_topk",
    "llm_ann_lsh",
    "llm_ann_ivf",
    "llm_ann_range",
    "llm_ann_recall",
    "llm_embedding_neardup",
    "llm_semdedup",
    "llm_kmeans",
    "emb_quantize_audit",
    "mm_embedding_centroids",
    "mm_label_balance_chi2",
    "udf_cogroup_pandas",
    "udf_map_in_arrow",
    "fn_lambda_surface",
    "llm_multimodal_join",
]


@pytest.fixture(scope="session")
def nonfinite_sf_dir(tmp_path_factory):
    """Fixture twin where ~12 % of embedding vectors carry one
    non-finite component: NaN (vec_id%23=5), +Inf (vec_id%29=7),
    -Inf (vec_id%31=11).  Keys/labels stay clean — poisoning is in the
    float payload only, the shape real pipelines see."""
    out = tmp_path_factory.mktemp("nonfinite_sf")
    con = duck_connect()
    src = pathlib.Path(SF_DIR)
    for t in TABLES:
        if t == "embeddings":
            con.execute(
                f"""COPY (SELECT vec_id,
                    CAST(list_transform(
                        range(1, len(embedding) + 1),
                        i -> CASE
                          WHEN i = 1 AND vec_id % 23 = 5
                            THEN 'NaN'::FLOAT
                          WHEN i = 2 AND vec_id % 29 = 7
                            THEN 'Infinity'::FLOAT
                          WHEN i = 3 AND vec_id % 31 = 11
                            THEN '-Infinity'::FLOAT
                          ELSE embedding[i] END
                    ) AS FLOAT[]) AS embedding,
                    label
                    FROM '{src}/embeddings.parquet')
                    TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()
    return str(out)


@pytest.mark.parametrize("qid", _EMBEDDING_QIDS)
def test_query_survives_nonfinite_embeddings(spark, nonfinite_sf_dir, qid):
    df = engine.QUERIES[qid](spark, nonfinite_sf_dir)
    assert df.count() >= 0
