"""Curation batch 2: anomaly scoring, the dataset card, and embedding
quantization — the remaining audit/publishing steps of a training-data
pipeline (SURVEY.md §2.J family).

Registered AFTER the proven families (round-4 correctness-window seeds;
see engine/__init__), fully oracled and in the local differential suite
immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.det import pround
from engine.registry import query
from engine.session import load
from engine.splits import SPLIT_CASE_SQL, split_col

Z_THRESHOLD = 2.0
QUANT_LEVELS = 255  # int8-style scalar quantization


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT user_id,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type,
           ROUND(e.value, 4) AS value,
           ROUND((e.value - s.mu) / NULLIF(s.sigma, 0), 4) AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.n_events >= 2
      AND ABS(ROUND((e.value - s.mu) / NULLIF(s.sigma, 0), 4))
            > {Z_THRESHOLD}
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly detection: events whose value deviates
    more than {Z_THRESHOLD}σ from that user's own mean — the outlier
    gate of a metrics pipeline.

    One user_id aggregate (mean + sample stddev, Welford-style partial
    merge under the hood) joined back to the stream on the same key —
    the partitioning is reused, so this is one shuffle + one co-hashed
    join at any scale. σ=0 users (constant values) are excluded via
    NULLIF rather than dividing by zero. The |z| > {Z_THRESHOLD} gate is
    applied to the ROUNDED z (4 dp, identically on both engines): raw
    AVG/STDDEV doubles differ across summation orders, so an unrounded
    threshold can flip membership of a value within an ulp of 2.0 —
    the same determinism rule q15 uses (SURVEY.md §7.5).
    """
    e = load(spark, sf_dir, "events")
    stats = e.groupBy(F.col("user_id").alias("uid")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n_events"),
    )
    z = (F.col("value") - F.col("mu")) / F.nullif(
        F.col("sigma"), F.lit(0.0)
    )
    return (
        e.join(stats, e["user_id"] == stats["uid"])
        .filter(
            (F.col("n_events") >= 2)
            & (F.abs(pround(z, 4)) > Z_THRESHOLD)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            pround(F.col("value"), 4).alias("value"),
            pround(z, 4).alias("zscore"),
        )
    )


@query(
    "llm_dataset_card",
    oracle=f"""
    SELECT lang,
           {SPLIT_CASE_SQL} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
           ROUND(MIN(CAST(n_chars AS DOUBLE)), 2) AS min_chars,
           ROUND(MAX(CAST(n_chars AS DOUBLE)), 2) AS max_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per (language × train/eval split) doc and token
    counts plus length stats — the summary table published next to
    every released corpus, and the quickest smoke test that a split or
    filter upstream silently changed the data distribution.

    Reuses the ONE split definition (engine.splits) so the card can
    never disagree with the split operators. Single map-side-combined
    aggregate over bounded (lang × split) keys.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", split_col().alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            pround(F.avg(F.col("n_chars").cast("double")), 2).alias(
                "avg_chars"
            ),
            pround(F.min(F.col("n_chars").cast("double")), 2).alias(
                "min_chars"
            ),
            pround(F.max(F.col("n_chars").cast("double")), 2).alias(
                "max_chars"
            ),
        )
    )


@query(
    "emb_quantize_audit",
    oracle=f"""
    WITH el AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings,
           UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS t(i)
    ), rng AS (
      SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM el GROUP BY i
    ), q AS (
      SELECT el.vec_id, el.x,
             rng.lo + FLOOR((el.x - rng.lo) / NULLIF(rng.hi - rng.lo, 0)
                            * {QUANT_LEVELS} + 0.5)
                      * (rng.hi - rng.lo) / {QUANT_LEVELS} AS xq
      FROM el JOIN rng ON el.i = rng.i
    )
    SELECT vec_id,
           ROUND(SQRT(AVG((x - xq) * (x - xq))), 6) AS rms_error,
           ROUND(MAX(ABS(x - xq)), 6) AS max_error
    FROM q GROUP BY vec_id
    """,
)
def emb_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8-style) embedding quantization audit: per-dimension
    min/max ranges over the corpus, each component snapped to
    {QUANT_LEVELS} levels, and the per-vector reconstruction error
    (RMS + max) — the accuracy check run before shipping a quantized
    ANN index.

    Per-dim ranges are a 64-row aggregate broadcast back onto the
    exploded components (posexplode keeps JVM-side); the quantize and
    error math is identical floor-arithmetic on both engines. Two
    shuffles (dim ranges, per-vector error), both map-side combined.
    """
    emb = load(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    rng = el.groupBy("i").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    step = (F.col("hi") - F.col("lo")) / QUANT_LEVELS
    xq = F.col("lo") + F.floor(
        (F.col("x") - F.col("lo"))
        / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
        * QUANT_LEVELS
        + 0.5
    ) * step
    err = F.col("x") - F.col("xq")
    return (
        el.join(F.broadcast(rng), "i")
        .withColumn("xq", xq)
        .groupBy("vec_id")
        .agg(
            pround(F.sqrt(F.avg(err * err)), 6).alias("rms_error"),
            pround(F.max(F.abs(err)), 6).alias("max_error"),
        )
    )


def _semdedup_oracle() -> str:
    from engine.scale_ops import (
        COSINE_NEARDUP_T,
        KMEANS_ITERS,
        K_KMEANS,
        _lloyd_cte,
    )

    last = KMEANS_ITERS
    return f"""
    WITH {_lloyd_cte(K_KMEANS)}, pairs AS (
      SELECT aa.vec_id AS va, ab.vec_id AS vb, aa.cid
      FROM a{last} aa JOIN a{last} ab
        ON aa.cid = ab.cid AND ab.vec_id < aa.vec_id
    ), dots AS (
      SELECT p.va, p.vb,
             SUM(ea.x * eb.x) AS dot,
             SUM(ea.x * ea.x) AS na,
             SUM(eb.x * eb.x) AS nb
      FROM pairs p
      JOIN el ea ON ea.vec_id = p.va
      JOIN el eb ON eb.vec_id = p.vb AND eb.d = ea.d
      GROUP BY 1, 2
    ), dup AS (
      SELECT DISTINCT va AS vec_id
      FROM dots WHERE dot / (SQRT(na) * SQRT(nb)) >= {COSINE_NEARDUP_T}
    )
    SELECT a.vec_id, CAST(a.cid AS INT) AS cluster,
           CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS INT)
             AS is_kept
    FROM a{last} a LEFT JOIN dup ON a.vec_id = dup.vec_id
    """


@query("llm_semdedup", oracle=_semdedup_oracle)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public): k-means
    the embedding corpus, then dedup WITHIN clusters only — a vector is
    dropped when a lower-id member of its own cluster sits above the
    cosine threshold (greedy keep-lowest-id, deterministic; the paper
    keeps the member farthest from the centroid — same mechanics,
    different survivor rule).

    This is the bucketed scale path of ``llm_embedding_neardup``: the
    pair space shrinks from O(n²) to O(Σ cluster²), the exact shape that
    makes semantic dedup feasible at 100 TB — k scales with the corpus
    so each cluster's pair block stays bounded. Reuses the in-plan Lloyd
    assignment (engine.scale_ops._lloyd — no driver centroid state); the
    within-cluster cosines are a per-cluster numpy block matmul in
    applyInPandas (one Arrow batch per cluster), the same f64 math as
    the oracle — an interpreted per-element zip_with fold here measured
    8.9 s vs 1.3 s for the matmul at sf0.1, the round-1
    embedding_neardup lesson again.
    """
    import numpy as np
    import pandas as pd

    from engine.scale_ops import (
        COSINE_NEARDUP_T,
        K_KMEANS,
        _lloyd,
        _lloyd_el,
    )

    emb = load(spark, sf_dir, "embeddings")
    assign, _cent = _lloyd(_lloyd_el(emb), K_KMEANS)
    members = assign.join(emb.select("vec_id", "embedding"), "vec_id")

    def cluster_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        cos = (mat @ mat.T) / np.outer(
            np.sqrt((mat * mat).sum(axis=1)),
            np.sqrt((mat * mat).sum(axis=1)),
        )
        # lower-triangle check: row i is a dup if any j < i (smaller id,
        # ids sorted ascending) has cosine ≥ threshold
        lower = np.tril(cos >= COSINE_NEARDUP_T, k=-1)
        dup = lower.any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cid"].iloc[0],
                "is_kept": (~dup).astype("int32"),
            }
        )

    return members.groupBy("cid").applyInPandas(
        cluster_dups, schema="vec_id long, cluster int, is_kept int"
    )
