"""User-defined function surface (SURVEY.md §2.K): plain Python UDF,
vectorized pandas UDFs (scalar + grouped-agg), applyInPandas grouped-map,
mapInPandas, and a Python UDTF (Spark 4).

UDFs are the engine's slow path by design (SURVEY.md: "UDFs are the slow
path"): everything expressible with built-ins elsewhere stays JVM-side;
this module exists to prove the full Python-boundary surface with
Arrow-batched transfer. Every UDF body is pure and SQL-mirrorable so the
DuckDB oracle checks semantics (SURVEY.md §7.6.6).

At 100 TB: pandas UDFs stream Arrow record batches per partition —
no per-row pickling, state bounded by batch size
(spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from engine.det import cents_col, cents_sql, exact_avg, exact_avg_sql, exact_sum, exact_sum_sql, pround
from engine.registry import query
from engine.session import load


def _np_round4(x: pd.Series) -> pd.Series:
    """The portable round (engine.det) in numpy: identical IEEE ops."""
    return np.floor(x * 10_000 + 0.5) / 10_000


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS band
    FROM orders
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain row-at-a-time Python UDF: price band label
    (SURVEY.md §2.K udf_python_scalar). The logic is SQL-expressible by
    design so the oracle checks semantics; production code would use
    CASE WHEN (JVM-side) — this exercises the pickled-row UDF path."""

    @udf("string")
    def band(total: float) -> str:
        if total < 100_000:
            return "low"
        if total < 300_000:
            return "mid"
        return "high"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", band("o_totalprice").alias("band"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS disc_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF over Arrow batches: discounted price
    (SURVEY.md §2.K udf_pandas_scalar)."""

    @pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(disc_price("l_extendedprice", "l_discount"), 2).alias("disc_price"),
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT c_mktsegment,
           ROUND(MAX(c_acctbal)
                 - SUM(FLOOR(c_acctbal * 100 + 0.5))
                   / COUNT(c_acctbal) / 100.0, 4) AS demeaned_max
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDAF (Series → scalar) in groupBy().agg()
    (SURVEY.md §2.K udf_pandas_grouped_agg): per-segment demeaned max.

    The mean folds exact integer cents (r10 quantization audit): the
    pandas group arrives in shuffle order, so a raw double .mean() is
    order-dependent at scale; integer-valued float additions are exact
    at any order until 2^53, and both engines run the same SUM/COUNT
    division chain. MAX is an order-independent selection.
    """

    @pandas_udf("double")
    def demeaned_max(bal: pd.Series) -> float:
        cents = np.floor(bal * 100 + 0.5)
        return float(bal.max() - cents.sum() / bal.count() / 100.0)

    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        pround(demeaned_max("c_acctbal"), 4).alias("demeaned_max")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score normalize event values per user
    (SURVEY.md §2.K udf_apply_in_pandas).

    Rounding happens inside the pandas body with the same portable
    floor-formula as engine.det (numpy doubles are IEEE, so both sides
    round identically); single-event users yield NULL (stddev_samp of a
    1-row group is NULL in SQL, NaN→None here).

    r10 quantization audit: CLEARED, not converted — the z-score's
    σ is a sqrt of a second moment that has no lossless integer form
    (and z is scale-invariant, so quantizing the input cannot remove
    the moment's own double fold). Drift bound: per-user groups are
    activity-bounded, giving n·eps·|Σ| many orders below the 1e-4
    output grain; the multi-seed row-order soak (BASELINE.md r10)
    backs this empirically.

    The input is PROJECTED to the three consumed columns before the
    groupBy: Spark cannot prune columns through applyInPandas (the
    grouped-map UDF receives every input column), so without the
    select the full row — ts, event_type, the props JSON — round-trips
    through Arrow into pandas for a 3-column computation: wasted
    serialization bandwidth at any scale, and a crash with sentinel
    dates (the grouped-map path coerces timestamp[us] → [ns], which
    overflows past year 2262 — the 9999-12-31 'no end date' sentinel
    aborted here; tests/test_sentinel_timestamps.py).
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # numpy throughout (r14): the grouped-map surface calls this once
        # per user group, so per-call pandas overhead multiplies by the
        # group count. ddof=1 + the explicit n>1 guard reproduces
        # STDDEV_SAMP exactly (NaN for 1-row groups); NaN rides the
        # float64 column out and becomes SQL NULL in the JVM projection
        # below — the old per-group astype(object).where(...) built an
        # object array per group just to hand Arrow a null mask, the
        # single biggest per-group cost in this op (measured).
        v = pdf["value"].to_numpy(dtype=np.float64)
        valid = v[~np.isnan(v)]  # pandas std/mean skip NaN (SQL semantics)
        if len(valid) > 1:
            std = valid.std(ddof=1)
            z = _np_round4((v - valid.mean()) / std)
        else:
            z = np.full(len(v), np.nan)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "z": z,
            }
        )

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, z double"
    )
    # NaN → NULL once, vectorized, JVM-side (same contract as before:
    # every NaN this body can produce — 1-row groups, NULL inputs — was
    # mapped to None in-Python previously).
    return out.select(
        "event_id",
        "user_id",
        F.when(F.isnan("z"), F.lit(None)).otherwise(F.col("z")).alias("z"),
    )


@query(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, user_id, value * 2 AS v2
    FROM events
    WHERE value > 100
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise mapInPandas filter+project over Arrow batch
    iterators (SURVEY.md §2.K udf_map_in_pandas). Input projected to
    the consumed columns first — Spark cannot prune columns through
    the opaque Python function, so without the select every events
    byte (ts, event_type, props) rides the Arrow channel for nothing
    (same waste udf_apply_in_pandas had; see its docstring)."""

    def flt(batches):
        for pdf in batches:
            keep = pdf[pdf["value"] > 100]
            yield pd.DataFrame(
                {
                    "event_id": keep["event_id"],
                    "user_id": keep["user_id"],
                    "v2": keep["value"] * 2,
                }
            )

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.mapInPandas(flt, schema="event_id long, user_id long, v2 double")


@query(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS token,
           UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')))) - 1 AS pos
    FROM documents
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): explode text into (doc_id, token, pos) via
    LATERAL join (SURVEY.md §2.K udtf_python). Oracle uses DuckDB's
    positional zip of parallel UNNESTs (no WITH ORDINALITY in 1.0)."""

    @udtf(returnType="token string, pos int")
    class SplitTokens:
        def eval(self, text):
            # NULL text → zero output rows, matching what UNNEST of a
            # NULL split yields in the oracle (nulls-twin sweep).
            if text is None:
                return
            for i, tkn in enumerate(text.split(" ")):
                yield tkn, i

    spark.udtf.register("split_tokens", SplitTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.token, s.pos
        FROM udtf_docs d, LATERAL split_tokens(d.text) s
        """
    )
