"""Unit pins for the r10 quantization helpers (engine/det.py).

The 49 converted operators all flow through cents_col/exact_sum/
exact_avg (or their SQL twins), so the helpers' corner semantics are
pinned once here instead of re-derived per operator: exact recovery of
on-grain values (including negatives — acctbals), NULL propagation
matching SUM/AVG's skip behavior, and the SQL twins generating text
that DuckDB parses to the same values Spark computes.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from engine.det import (
    cents_col,
    cents_sql,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)

# On-grain doubles, including a negative balance and the knife-edge
# representation cases (x.xx5 has no exact double; 0.07*100 ≈ 7.0000…4,
# 0.29*100 ≈ 28.999…96 — floor(+0.5) must recover the integer both ways).
VALS = [0.07, 0.29, -994.30, 123456.78, 0.0, -0.01, 99999.99]


def test_cents_col_recovers_exact_integers(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "x double")
    got = [r[0] for r in df.select(cents_col(F.col("x"))).collect()]
    assert got == [round(v * 100) for v in VALS]


def test_cents_col_null_propagates(spark):
    df = spark.createDataFrame([(None,), (1.25,)], "x double")
    got = [r[0] for r in df.select(cents_col(F.col("x"))).collect()]
    assert got == [None, 125]


def test_exact_sum_and_avg_match_sql_twins(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "x double")
    s_sum, s_avg = df.agg(
        exact_sum(cents_col(F.col("x")), 100).alias("s"),
        exact_avg(cents_col(F.col("x")), 100, 4).alias("a"),
    ).collect()[0]
    con = duckdb.connect()
    vals_sql = ", ".join(f"({v!r})" for v in VALS)
    o_sum, o_avg = con.execute(
        f"""SELECT {exact_sum_sql(cents_sql('x'), 100)},
                   {exact_avg_sql(cents_sql('x'), 100, 4)}
            FROM (VALUES {vals_sql}) t(x)"""
    ).fetchone()
    assert s_sum == o_sum
    assert s_avg == o_avg


def test_exact_avg_null_group_yields_null(spark):
    """All-NULL input: SUM is NULL, COUNT is 0 — the division must give
    NULL (AVG semantics), not a divide abort, on both engines."""
    df = spark.createDataFrame([(None,), (None,)], "x double")
    row = df.agg(exact_avg(cents_col(F.col("x")), 100).alias("a")).collect()
    assert row[0][0] is None
    con = duckdb.connect()
    got = con.execute(
        f"""SELECT {exact_avg_sql(cents_sql('x'), 100)}
            FROM (VALUES (CAST(NULL AS DOUBLE)), (NULL)) t(x)"""
    ).fetchone()[0]
    assert got is None
