"""Zero-values robustness: every registered query must plan and execute
over a fixture twin whose MEASURE columns are all degenerate — empty
text, zero prices/quantities/values, zero-norm embeddings — with keys,
enums, and timestamps intact.

This is the class the empty and single-row sweeps cannot reach: groups
that EXIST but sum to zero (an ANSI divide-by-zero job abort, not a
NULL), constant series with n > 1 (stddev exactly 0, unlike the
single-row NULL), and zero-norm vectors (cosine 0/0). At 100 TB these
are routine — a crawl shard of boilerplate-stripped empty docs, a
refunded-to-zero order day, a null-imputed embedding batch — and one
unguarded division takes down the whole job under Spark 4's default
ANSI mode. Found llm_code_fraction's Σn_chars=0 abort on landing
(engine/seeds27.py, fixed with try_divide; DuckDB's divide-by-zero is
NULL, so oracles already agree with the try_* semantics).
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import engine
from engine.session import TABLES
from tests.conftest import SF_DIR

ALL_IDS = sorted(engine.QUERIES)

# measure columns to degenerate, per table (keys/enums/dates untouched)
ZERO_COLS: dict[str, dict[str, object]] = {
    "customer": {"c_acctbal": 0.0},
    "supplier": {"s_acctbal": 0.0},
    "part": {"p_retailprice": 0.0, "p_size": 0},
    "orders": {"o_totalprice": 0.0},
    "lineitem": {
        "l_quantity": 0.0,
        "l_extendedprice": 0.0,
        "l_discount": 0.0,
        "l_tax": 0.0,
    },
    "events": {"value": 0.0},
    "documents": {"text": "", "n_chars": 0},
}


def _zeroed(table: pa.Table, name: str) -> pa.Table:
    for col, val in ZERO_COLS.get(name, {}).items():
        i = table.schema.get_field_index(col)
        typ = table.schema.field(i).type
        arr = pa.array([val] * len(table), type=typ)
        table = table.set_column(i, table.schema.field(i), arr)
    if name == "embeddings":
        i = table.schema.get_field_index("embedding")
        typ = table.schema.field(i).type
        dim = len(table.column(i)[0].as_py()) if len(table) else 0
        arr = pa.array([[0.0] * dim] * len(table), type=typ)
        table = table.set_column(i, table.schema.field(i), arr)
    return table


@pytest.fixture(scope="session")
def zero_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("zero_sf")
    for t in TABLES:
        src = pathlib.Path(SF_DIR) / f"{t}.parquet"
        pq.write_table(_zeroed(pq.read_table(src), t), out / f"{t}.parquet")
    return str(out)


@pytest.mark.parametrize("qid", ALL_IDS)
def test_query_survives_zeroed_measures(spark, zero_sf_dir, qid):
    df = engine.QUERIES[qid](spark, zero_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
