"""Driver-contract mimic: every ``queries()`` entry with an ``oracle_sql()``
twin must match DuckDB row-for-row (order-insensitive, columns aligned by
name) at sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return f"{v:.4f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    s_rows, o_rows = _normalize(sdf), _normalize(odf)
    assert len(s_rows) == len(o_rows), f"{name}: {len(s_rows)} vs {len(o_rows)} rows"
    mismatches = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatches, (
        f"{name}: first mismatch at {mismatches[0]}:\n"
        f" spark:  {s_rows[mismatches[0]]}\n"
        f" oracle: {o_rows[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"sink", "role_group", "ts_day", "n"}


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_no_oracle_queries_run(spark, name):
    # queries without a SQL oracle still must run and return a stable schema
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns
    df.collect()
