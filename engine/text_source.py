"""Line-oriented text source (SURVEY.md §2.A family).

Lives in its own module (not engine.relational) so it can register
inside the driver's capped correctness window in round 3 — it was the
one query left without any driver row after rounds 1-2 (registered past
both rounds' 50-row cap).
"""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.registry import query
from engine.roundtrip import SCRATCH, roundtrip_verified_big
from engine.session import load


@query(
    "source_text_roundtrip",
    oracle="""
    SELECT SUBSTRING(text, 1, 1) AS first_char,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars
    FROM documents
    WHERE text IS NOT NULL
      AND STRPOS(text, CHR(10)) = 0
      AND STRPOS(text, CHR(13)) = 0
    GROUP BY 1
    """,
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text write→read roundtrip (SURVEY.md §2.A family).

    Oracled since r6 (was rows-only): the per-first-char audit of the
    read-back lines must hash-match DuckDB's same aggregate on the
    source rows under the identical representability filter — both
    engines count Unicode code points (Spark ``length`` ≡ DuckDB
    ``LENGTH``), so the compare verifies the UTF-8 write→read chain.

    ``spark.read.text`` is the raw-corpus ingestion path an LLM pipeline
    starts from (one line = one record, schema = a single ``value``
    string). Documents' text is single-line in the fixtures, so the
    write→read is lossless; the content assertion compares the full
    line multisets, and the returned audit aggregate (per-first-char
    line counts + total chars) keeps the driver-side result small and
    stable.
    """
    out = SCRATCH / f"text_{uuid.uuid4().hex}"
    # The line-oriented text format CANNOT represent NULL (serializes
    # as an empty line, reads back as "") or EMBEDDED NEWLINES (one
    # line = one record by definition: a 2-line text reads back as two
    # rows) — filter both before the write, the contract every text
    # exporter enforces; the roundtrip assert then guards exactly the
    # representable rows. Both cases found by the nulls/adversarial
    # twin sweeps, where the assert correctly reported lost rows.
    lines = (
        load(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & ~F.col("text").contains("\n")
            & ~F.col("text").contains("\r")
        )
        .select(F.col("text").alias("value"))
    )
    try:
        lines.write.mode("overwrite").text(str(out))
        back = spark.read.text(str(out))
        audit = (
            roundtrip_verified_big(lines, back)
            .groupBy(F.substring("value", 1, 1).alias("first_char"))
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(F.length("value")).alias("n_chars"),
            )
            .orderBy("first_char")
        )
        # Force before the scratch dir is removed: the plan reads `out`.
        return audit.sparkSession.createDataFrame(
            audit.collect(), schema=audit.schema
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
