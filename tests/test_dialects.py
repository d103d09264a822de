"""Pure-Python grammar tests against the reference golden vectors.

The expected JSON strings are copied verbatim from the reference's own
unit tests (alb.rs:246-355, classic_lb.rs:143-189) — they ARE the spec.
"""

from __future__ import annotations

import json

import pytest

from elb_pipeline.dialects import (
    ALB,
    ALB_PATTERN,
    CLASSIC,
    CLASSIC_PATTERN,
    parse_line,
)
from elb_pipeline.goldens import (
    ALB_GOLDENS,
    CLASSIC_GOLDENS,
    MALFORMED_GOLDENS,
    POOL_SINKS,
    TEXT_POOL,
)


def _json(fields: dict) -> str:
    return json.dumps(
        {k: v for k, v in fields.items() if v is not None}, separators=(",", ":")
    )


@pytest.mark.parametrize("line,expected", ALB_GOLDENS, ids=range(len(ALB_GOLDENS)))
def test_alb_golden(line, expected):
    sink, fields = parse_line(line)
    assert sink == "alb"
    assert _json(fields) == expected


@pytest.mark.parametrize(
    "line,expected", CLASSIC_GOLDENS, ids=range(len(CLASSIC_GOLDENS))
)
def test_classic_golden(line, expected):
    sink, fields = parse_line(line)
    assert sink == "classic_lb"
    assert _json(fields) == expected


@pytest.mark.parametrize("line", MALFORMED_GOLDENS, ids=range(len(MALFORMED_GOLDENS)))
def test_malformed_golden(line):
    sink, fields = parse_line(line)
    assert sink == "malformed"
    assert fields is None


def test_trailing_newline_tolerance():
    # grammars accept one optional trailing \n (alb.rs:189, classic_lb.rs:99)
    for line, _ in ALB_GOLDENS + CLASSIC_GOLDENS:
        stripped = line.rstrip("\n")
        assert parse_line(stripped)[0] == parse_line(stripped + "\n")[0] != "malformed"


def test_dialects_disjoint_on_pool():
    # ALB starts with a scheme token (alb.rs:102), Classic with a timestamp
    # (classic_lb.rs:62): no line may match both grammars.
    for line in TEXT_POOL:
        assert not (ALB.regex.match(line) and CLASSIC.regex.match(line))


def test_duckdb_re2_routing_parity():
    """The SAME pattern strings must route identically under DuckDB's RE2 —
    this is what makes the DuckDB oracle a genuine cross-check."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for line, expected_sink in zip(TEXT_POOL, POOL_SINKS):
        alb = con.execute(
            "select regexp_full_match(?, ?)", [line, ALB_PATTERN]
        ).fetchone()[0]
        clb = con.execute(
            "select regexp_full_match(?, ?)", [line, CLASSIC_PATTERN]
        ).fetchone()[0]
        got = "alb" if alb else ("classic_lb" if clb else "malformed")
        assert got == expected_sink, line[:80]
