"""Hot-bucket adversarial check for the MinHash-LSH dedup family: a
corpus where ONE band bucket holds most of the corpus (60 byte-identical
boilerplate docs — every signature, hence every band hash, equal) plus a
few token-disjoint distinct docs.

This is the known worst case of LSH banding at 100 TB (boilerplate /
templated crawl pages): all identical docs collide into a single bucket,
so the candidate set is quadratic in the group size. For the *pairs*
contract that is not wasted work — every candidate IS a true near-dup
(Jaccard exactly 1.0), so candidates == output — and the linear-output
scale path is the clustering form, which must collapse the clique to one
component with one canonical survivor. This test pins both behaviors
end-to-end through the registered queries on a scratch corpus.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

import engine

N_DUP = 60  # one bucket holding 60 docs → C(60,2) = 1770 candidate pairs
DUP_TEXT = "spark join filter window shuffle broadcast partition agg"
DISTINCT_TEXTS = {  # pairwise token-disjoint → no cross near-dups
    100: "alpha bravo charlie delta echo",
    101: "foxtrot golf hotel india juliet",
    102: "kilo lima mike november oscar",
    103: "papa quebec romeo sierra tango",
    104: "uniform victor whiskey xray yankee",
}


@pytest.fixture(scope="module")
def hotbucket_sf_dir(spark):
    tmp = tempfile.mkdtemp(prefix="lsh_hotbucket_")
    rows = [
        (i, DUP_TEXT, "en", f"src{i % 3}", len(DUP_TEXT))
        for i in range(N_DUP)
    ] + [
        (i, t, "en", "srcx", len(t)) for i, t in DISTINCT_TEXTS.items()
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_identical_docs_pairs_are_exactly_the_clique(spark, hotbucket_sf_dir):
    pairs = engine.QUERIES["llm_lsh_neardup"](spark, hotbucket_sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    want_keys = {
        (a, b) for a in range(N_DUP) for b in range(a + 1, N_DUP)
    }
    assert set(got) == want_keys  # no distinct-doc pair sneaks in
    assert all(j == 1.0 for j in got.values())


def test_identical_docs_collapse_to_one_component(spark, hotbucket_sf_dir):
    labels = engine.QUERIES["llm_dedup_clusters"](
        spark, hotbucket_sf_dir
    ).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.is_canonical) for r in labels}
    assert len(by_doc) == N_DUP + len(DISTINCT_TEXTS)
    for i in range(N_DUP):
        assert by_doc[i] == (0, 1 if i == 0 else 0)
    for i in DISTINCT_TEXTS:
        assert by_doc[i] == (i, 1)  # token-disjoint docs stay singletons


def test_identical_docs_single_survivor_absorbs_all(spark, hotbucket_sf_dir):
    surv = engine.QUERIES["llm_dedup_survivors"](
        spark, hotbucket_sf_dir
    ).collect()
    by_doc = {r.doc_id: r.n_members for r in surv}
    assert by_doc[0] == N_DUP
    assert all(by_doc[i] == 1 for i in DISTINCT_TEXTS)
    assert set(by_doc) == {0, *DISTINCT_TEXTS}
