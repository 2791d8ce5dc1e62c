"""Round-19 seed operators — the Spark 4 custom Python DataSource API:
a partition-parallel synthetic connector whose content is closed-form
deterministic, so the full connector contract (schema declaration,
partition planning, per-partition reads) is oracle-checkable — 1
operator, oracled.

Reference parity note: /root/reference (alehakad/FootballDataEngeneering)
contains no code (README.md:1-2 + LICENSE only — SURVEY.md §0), so this
extends SURVEY.md §2's own declared inventory. Registered PAST the
round-5 correctness window; rotate FIRST next round with seeds8-18.

Import discipline: leaf modules only at module scope — see seeds8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.session import load

PYDS_N = 10_000
PYDS_PARTS = 8


@query(
    "source_python_datasource",
    oracle=f"""
    WITH s AS (
      SELECT UNNEST(GENERATE_SERIES(0, {PYDS_N - 1})) AS x
    )
    SELECT CAST(x % {PYDS_PARTS} AS INT) AS part,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sum_x,
           CAST(SUM(x * x) AS BIGINT) AS sum_sq
    FROM s GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DataSource (Spark 4 `pyspark.sql.datasource`): a
    from-scratch connector registered with
    ``spark.dataSource.register`` — schema declaration, PARTITION
    PLANNING (8 strided splits), and per-partition iterator reads —
    then aggregated per partition so every split's content is
    hash-checked against the closed-form oracle.

    This is the extension point for sources Spark lacks natively
    (internal APIs, bespoke formats): the reader contract mirrors DSv2
    — `partitions()` runs on the driver (plan-time metadata, like a
    catalog listing), `read(partition)` runs ON EXECUTORS in parallel,
    one task per split, so a 1000-split custom source scales exactly
    like a parquet scan (modulo the Python-worker row path; Arrow
    batch readers are the fast variant of the same API). The synthetic
    integer stream makes the oracle exact: each partition p must
    contribute precisely {{x ≡ p (mod 8)}}.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class StrideReader(DataSourceReader):
        def __init__(self, opts):
            self.n = int(opts.get("n", "10"))
            self.parts = int(opts.get("parts", "4"))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            i = partition.value
            for v in range(i, self.n, self.parts):
                yield (i, v, v * v)

    class StrideSource(DataSource):
        @classmethod
        def name(cls):
            return "engine_stride"

        def schema(self):
            return "part int, x bigint, x_sq bigint"

        def reader(self, schema):
            return StrideReader(self.options)

    spark.dataSource.register(StrideSource)
    df = (
        spark.read.format("engine_stride")
        .option("n", str(PYDS_N))
        .option("parts", str(PYDS_PARTS))
        .load()
    )
    return df.groupBy("part").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("x_sq").cast("bigint").alias("sum_sq"),
    )
