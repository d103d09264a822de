"""Vectorized parse + route stage.

The reference parses row-at-a-time with a compiled DFA regex and reused
capture buffers (alb.rs:199-243, classic_lb.rs:109-139). The Spark-native
equivalent is ONE pandas UDF over Arrow batches: a single
``Series.str.extract`` pass per dialect extracts every capture group of a
batch at once (vectorized C loop inside pandas — no per-row Python), and
the Classic grammar is only attempted on the rows that failed ALB, so each
line is scanned at most twice, like the reference's per-dialect dispatch.

Output is one struct column ``parsed`` with:
  sink      — 'alb' | 'classic_lb' | 'malformed'  (the routing key)
  alb_*     — 33 string fields (alb.rs:8-86 order), null unless sink='alb'
  clb_*     — 18 string fields (classic_lb.rs:8-46 order), null unless
              sink='classic_lb'

All fields stay strings with "-"/"-1" sentinels verbatim, exactly like the
reference (it never converts types — README.md:28).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elb_pipeline.dialects import (
    ALB,
    ALB_FIELDS,
    CLASSIC,
    CLASSIC_FIELDS,
    SINK_ALB,
    SINK_CLASSIC,
    SINK_MALFORMED,
)

ALB_COLS = [f"alb_{f}" for f in ALB_FIELDS]
CLB_COLS = [f"clb_{f}" for f in CLASSIC_FIELDS]
PARSED_FIELDS = ["sink", *ALB_COLS, *CLB_COLS]
PARSED_SCHEMA = T.StructType(
    [T.StructField(name, T.StringType(), True) for name in PARSED_FIELDS]
)


def parse_route_batch(text: pd.Series) -> pd.DataFrame:
    """Parse + route one Arrow batch (pure pandas; unit-testable without Spark)."""
    idx = text.index
    n = len(text)

    # One extract pass for all 33 ALB groups (non-matching rows → all-NaN).
    alb = text.str.extract(ALB.regex)
    alb_ok = alb[0].notna().to_numpy()

    # Classic attempted only on the ALB-rejects — per-dialect fallthrough.
    clb = pd.DataFrame(
        np.full((n, len(CLASSIC_FIELDS)), np.nan, dtype=object), index=idx
    )
    rest = ~alb_ok
    if rest.any():
        clb.loc[rest] = text[rest].str.extract(CLASSIC.regex).to_numpy()
    clb_ok = clb[0].notna().to_numpy()

    sink = np.where(alb_ok, SINK_ALB, np.where(clb_ok, SINK_CLASSIC, SINK_MALFORMED))

    out = pd.DataFrame(index=idx)
    out["sink"] = sink
    for i, col in enumerate(ALB_COLS):
        out[col] = alb[i]
    for i, col in enumerate(CLB_COLS):
        out[col] = clb[i]
    # NaN → None so Arrow serializes proper nulls for string columns.
    return out.astype(object).where(out.notna(), None)


_parse_udf = F.pandas_udf(parse_route_batch, PARSED_SCHEMA)


def with_parsed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``parsed`` struct + top-level ``sink`` routing column."""
    return df.withColumn("parsed", _parse_udf(F.col(text_col))).withColumn(
        "sink", F.col("parsed.sink")
    )


def alb_field(name: str) -> Column:
    return F.col(f"parsed.alb_{name}").alias(name)


def classic_field(name: str) -> Column:
    return F.col(f"parsed.clb_{name}").alias(name)
