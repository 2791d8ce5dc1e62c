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
      AND ABS((e.value - s.mu) / NULLIF(s.sigma, 0)) > {Z_THRESHOLD}
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
    NULLIF rather than dividing by zero.
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
        .filter((F.col("n_events") >= 2) & (F.abs(z) > Z_THRESHOLD))
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
