"""Dead-letter diagnostics — failed-position for malformed lines.

The reference walks a dense DFA byte-by-byte to report the first byte
index at which a malformed line can no longer match (parse.rs:22-41,
rendered to stderr with an underline, main.rs:230-245). Python has no
streaming-DFA stdlib, so we report at *field* granularity instead: the
number of leading fields that parse cleanly and the character offset where
the best dialect's match goes dead. Diagnostic-only — never part of the
output-equality contract (the reference prints it to stderr, not stdout).

Vectorized as a pandas UDF that is only ever applied to the (small)
malformed sink, so the per-line prefix probing cost is bounded by the
dead-letter rate, mirroring the reference's error fast-path (alb.rs:199-203
allocates only on failure).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elb_pipeline.dialects import ALB, CLASSIC, Dialect

_DIAG_SCHEMA = T.StructType(
    [
        T.StructField("dialect", T.StringType()),
        T.StructField("fields_ok", T.IntegerType()),
        T.StructField("failed_position", T.IntegerType()),
    ]
)


def _probe(d: Dialect, line: str) -> tuple[int, int]:
    """(leading fields matched, char offset where the match dies)."""
    fields_ok, pos = 0, 0
    for k, rx in enumerate(d.prefix_regexes(), start=1):
        m = rx.match(line)
        if not m:
            break
        fields_ok, pos = k, m.end()
    return fields_ok, pos


def _diagnose_batch(text: pd.Series) -> pd.DataFrame:
    out = {"dialect": [], "fields_ok": [], "failed_position": []}
    for line in text:
        if line is None:
            out["dialect"].append(None)
            out["fields_ok"].append(None)
            out["failed_position"].append(None)
            continue
        best = max(
            ((d, *_probe(d, line)) for d in (ALB, CLASSIC)),
            key=lambda t: (t[1], t[2]),
        )
        out["dialect"].append(best[0].name)
        out["fields_ok"].append(best[1])
        out["failed_position"].append(best[2])
    return pd.DataFrame(out)


diagnose_udf = F.pandas_udf(_diagnose_batch, _DIAG_SCHEMA)


def diagnosis(text_col: str = "text") -> Column:
    return diagnose_udf(F.col(text_col))
