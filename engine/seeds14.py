"""Round-14 seed operators — modern Spark 4 session/engine surfaces:
the VARIANT semi-structured type, named SQL parameter binding,
DataFrame.observe() metric accumulators, CACHE TABLE with an
InMemoryRelation-pinned second read, and the from_csv parsing
expression — 5 operators, all oracled.

Reference parity note: /root/reference (alehakad/FootballDataEngeneering)
contains no code (README.md:1-2 + LICENSE only — SURVEY.md §0), so these
extend SURVEY.md §2's own declared inventory. Registered PAST the
round-5 correctness window; rotate FIRST next round with seeds8-13.

Import discipline: leaf modules only at module scope — see seeds8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.session import load


def _cents(col: str = "value") -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


_CENTS_SQL = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"

PARAM_TYPE = "purchase"
PARAM_MIN_VALUE = 50.0


# ---------------------------------------------------------------------------
# fn_variant_surface — Spark 4 VARIANT semi-structured type
# ---------------------------------------------------------------------------


@query(
    "fn_variant_surface",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(CASE WHEN CAST(props::JSON ->> 'k' AS BIGINT) > 50
                      THEN 1 END) AS BIGINT) AS n_big_k
    FROM events GROUP BY 1
    """,
)
def fn_variant_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type surface (new in Spark 4):
    ``parse_json`` ingests the props JSON into a binary VARIANT column
    and ``variant_get`` extracts typed paths — the schema-on-read
    answer to evolving telemetry payloads, replacing per-query
    get_json_object string re-parsing with a parse-once binary
    encoding.

    At 100 TB the difference is material: VARIANT parses each payload
    ONCE at ingest (and columnar-shreds common paths in newer
    writers), while the string-JSON path re-tokenizes per expression —
    fn_json keeps the legacy surface for comparison. The oracle reads
    the same field through DuckDB's JSON extraction; typed-path
    extraction semantics must agree exactly.
    """
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count(F.when(F.col("k") > 50, 1)).cast("bigint").alias("n_big_k"),
    )


# ---------------------------------------------------------------------------
# sql_named_parameters — parameterized SQL binding
# ---------------------------------------------------------------------------


@query(
    "sql_named_parameters",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents
    FROM events
    WHERE event_type = '{PARAM_TYPE}' AND value >= {PARAM_MIN_VALUE!r}
    GROUP BY 1
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (`spark.sql(query, args={...})` —
    Spark 4's injection-safe parameter markers): the filter values
    arrive as ``:event_type`` / ``:min_value`` BINDINGS, never string
    interpolation — the API surface every multi-tenant query service
    needs (plan caching by query text, no quoting bugs, no SQL
    injection).

    Parameters fold to literals during analysis, so the physical plan
    (pushed filters included — the predicate reaches the parquet scan)
    is identical to the inlined query the oracle runs.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("np_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM np_events
        WHERE event_type = :event_type AND value >= :min_value
        GROUP BY 1
        """,
        args={"event_type": PARAM_TYPE, "min_value": PARAM_MIN_VALUE},
    )


# ---------------------------------------------------------------------------
# df_observe_metrics — in-flight metric accumulators
# ---------------------------------------------------------------------------


@query(
    "df_observe_metrics",
    oracle=f"""
    SELECT 'n_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value
    FROM events
    UNION ALL
    SELECT 'cents_total', CAST(COALESCE(SUM({_CENTS_SQL}), 0) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'n_purchases',
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM events
    """,
)
def df_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.observe()` metric accumulators: row count, exact cent
    total, and purchase count collected AS A SIDE EFFECT of one pass
    (the production pattern: data-quality counters ride along with the
    real job instead of paying a second scan — at 100 TB the free
    metrics pass IS the feature).

    The observed map is materialized by a noop-sink write (nothing to
    the driver but the 3 metrics), then surfaced as the result rows the
    oracle recomputes with plain aggregates. Integer metrics only, so
    accumulator merge order is irrelevant.
    """
    from pyspark.sql import Observation

    e = load(spark, sf_dir, "events")
    obs = Observation("dq")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_cents()).alias("cents_total"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # empty input: SUM observes NULL (count observes 0) — normalize so
    # the metrics row set stays total (hypothesis/empty-sweep-proofed).
    rows = [
        ("n_rows", int(m["n_rows"] or 0)),
        ("cents_total", int(m["cents_total"] or 0)),
        ("n_purchases", int(m["n_purchases"] or 0)),
    ]
    return spark.createDataFrame(rows, "metric string, value bigint")


# ---------------------------------------------------------------------------
# maint_cache_table — CACHE TABLE + InMemoryRelation read
# ---------------------------------------------------------------------------


@query(
    "maint_cache_table",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents
    FROM events GROUP BY 1
    """,
)
def maint_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CACHE TABLE` surface: the events projection cached into the
    columnar in-memory store, the result computed FROM THE CACHE
    (tests pin InMemoryRelation in the second read's plan), then
    uncached — the hot-dimension / iterative-reuse layer every
    multi-pass pipeline (kmeans, CC, CUSUM-over-many-metrics) leans
    on.

    Cached or not, results must be identical — that is exactly what the
    oracle checks. UNCACHE in a finally block keeps the shared session
    clean for the other 246 queries (catalog hygiene, the
    join_bucketed_colocated rule).
    """
    import uuid

    e = load(spark, sf_dir, "events").select("event_type", _cents().alias("c"))
    name = f"cache_t_{uuid.uuid4().hex[:8]}"
    e.createOrReplaceTempView(name)
    try:
        spark.sql(f"CACHE TABLE {name}_c AS SELECT * FROM {name}")
        out = spark.table(f"{name}_c").groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("cents"),
        )
        rows = out.collect()
    finally:
        spark.sql(f"UNCACHE TABLE IF EXISTS {name}_c")
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, "event_type string, n bigint, cents bigint")


# ---------------------------------------------------------------------------
# fn_csv_parse — from_csv expression surface
# ---------------------------------------------------------------------------


@query(
    "fn_csv_parse",
    oracle="""
    WITH r AS (
      SELECT doc_id,
             lang || ',' || source || ',' || CAST(n_chars AS VARCHAR)
               AS line
      FROM documents
    )
    SELECT doc_id,
           STRING_SPLIT(line, ',')[1] AS lang_p,
           STRING_SPLIT(line, ',')[2] AS source_p,
           CAST(STRING_SPLIT(line, ',')[3] AS BIGINT) AS n_chars_p
    FROM r
    """,
)
def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`from_csv` expression surface: an embedded CSV line (built
    in-query — the fixtures carry no raw CSV column) parsed back into a
    typed struct per row — the in-row codec for log lines and legacy
    feeds, the CSV sibling of fn_json/from_json.

    Schema-directed parsing (never inference row-by-row), whole
    operation JVM-side in a map-only plan; the oracle proves the same
    decomposition with portable string splitting. The roundtrip
    (build → parse → compare) makes delimiter/quoting drift visible in
    the hash.
    """
    d = load(spark, sf_dir, "documents")
    line = F.concat_ws(
        ",", F.col("lang"), F.col("source"), F.col("n_chars").cast("string")
    )
    parsed = F.from_csv(
        line, "lang_p string, source_p string, n_chars_p bigint"
    )
    return d.select("doc_id", parsed.alias("p")).select(
        "doc_id", "p.lang_p", "p.source_p", "p.n_chars_p"
    )
