"""Dead-letter diagnostics — failed-position for malformed lines.

The reference walks a dense DFA byte-by-byte and reports the index of the
first byte at which the line can no longer lead to any match
(``try_find_failed_position``, parse.rs:22-41; rendered to stderr with an
underline, main.rs:230-245). Two-level reproduction here, both vectorized
enough to run inside the fused Arrow parse stage:

1. ``fields_ok`` — how many leading *fields* of each dialect's grammar are
   well-formed. Computed with a **vectorized binary search** over the
   cumulative prefix patterns (prefix k matches ⇒ prefix k-1 matches, so
   the predicate is monotone in k): ~log2(33) RE2 match passes over the
   malformed subset instead of 33 (or a per-row Python loop, as in round 1).

2. ``failed_position`` — the BYTE-exact reference semantics: the smallest
   L such that no extension of line[:L+1] can match the full anchored
   pattern, found by bisection over the monotone DFA-alive predicate
   ``regex.fullmatch(pattern, prefix, partial=True)`` (the ``regex``
   module's partial matching is exactly "some completion could match" —
   the dead-state test of parse.rs:30-33). Patterns and lines are matched
   as *bytes* so positions agree with the reference byte-for-byte,
   asserted on the reference's negative golden vectors. The bisection
   starts at the greedy field-prefix match end (a proven-alive lower
   bound), so it runs O(log residual) partial matches per dead letter —
   and only on dead letters, mirroring the reference's error fast-path
   asymmetry (alb.rs:199-203 allocates only on failure).

``nearest_dialect`` is the dialect with the most well-formed leading
fields (ties resolve to ALB, the reference CLI's default dialect,
main.rs:29-30) — our per-row analog of the reference's fixed per-run
dialect choice (main.rs:82-85).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import regex as _regex

from elb_pipeline.dialects import ALB, CLASSIC, Dialect

DIAG_FIELDS = ["nearest_dialect", "fields_ok", "failed_position"]

_PARTIAL_CACHE: dict[str, "_regex.Pattern[bytes]"] = {}
_PREFIX_CACHE: dict[tuple[str, int], str] = {}


def _partial_rx(d: Dialect) -> "_regex.Pattern[bytes]":
    rx = _PARTIAL_CACHE.get(d.name)
    if rx is None:
        rx = _PARTIAL_CACHE[d.name] = _regex.compile(d.pattern.encode())
    return rx


def _prefix_pattern(d: Dialect, k: int) -> str:
    """Anchored pattern matching lines whose first k fields are well-formed."""
    key = (d.name, k)
    pat = _PREFIX_CACHE.get(key)
    if pat is None:
        pat = _PREFIX_CACHE[key] = "^(?:" + "".join(d.parts[:k]) + ")"
    return pat


def fields_ok_arrow(text: pa.Array, d: Dialect) -> np.ndarray:
    """Vectorized binary search: per row, the max k such that the line's
    first k fields match ``d``'s grammar. Monotone in k, so ~log2(K)
    RE2 passes over (subsets of) the array. Null text → 0."""
    n = len(text)
    k_max = len(d.parts)
    lo = np.zeros(n, dtype=np.int32)  # prefix lo is known to match (0 = trivially)
    hi = np.full(n, k_max, dtype=np.int32)  # max still possible
    valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
    hi[~valid] = 0
    while True:
        active = lo < hi
        if not active.any():
            break
        mid = (lo + hi + 1) >> 1
        for m in np.unique(mid[active]):
            rows = active & (mid == m)
            mask = pa.array(rows)
            sub = text.filter(mask)
            ok_sub = pc.fill_null(
                pc.match_substring_regex(sub, pattern=_prefix_pattern(d, int(m))),
                False,
            ).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(rows)
            lo[idx[ok_sub]] = m
            hi[idx[~ok_sub]] = m - 1
    return lo


def _greedy_prefix_end(line: bytes, d: Dialect, k: int) -> int:
    """Byte offset where the greedy match of prefix k ends (alive lower
    bound for the dead-byte bisection). k = 0 → 0."""
    if k <= 0:
        return 0
    m = _regex.match(("^(?:" + "".join(d.parts[:k]) + ")").encode(), line)
    return m.end() if m else 0


def failed_position_bytes(line: bytes, d: Dialect, start: int = 0) -> int:
    """Reference ``try_find_failed_position`` semantics (parse.rs:22-41):
    the index of the first byte whose consumption makes the full anchored
    pattern unmatchable; len(line) if every byte is consistent but EOI
    kills it (truncated line). Bisection over the monotone alive
    predicate ``fullmatch(..., partial=True)``."""
    rx = _partial_rx(d)

    def alive(i: int) -> bool:
        return rx.fullmatch(line, 0, i, partial=True) is not None

    n = len(line)
    if alive(n):
        return n  # all bytes alive; the line is a truncated prefix (EOI dies)
    # smallest L in (start, n] with alive(L) false, then position = L - 1
    lo, hi = start, n  # alive(lo) True, alive(hi) False
    while hi - lo > 1:
        mid = (lo + hi) >> 1
        if alive(mid):
            lo = mid
        else:
            hi = mid
    return hi - 1


def diagnose_arrow(text: pa.Array) -> list[pa.Array]:
    """(nearest_dialect, fields_ok, failed_position) arrays for a batch of
    malformed lines. fields_ok: vectorized RE2 binary search per dialect;
    failed_position: byte-exact bisection, per row, malformed rows only."""
    if not isinstance(text, pa.Array):
        text = pa.array(text, pa.string())
    n = len(text)
    alb_k = fields_ok_arrow(text, ALB)
    clb_k = fields_ok_arrow(text, CLASSIC)

    lines = text.to_pylist()
    dialects: list[str | None] = [None] * n
    fields_ok = np.zeros(n, dtype=np.int32)
    positions = np.zeros(n, dtype=np.int32)
    valid = np.ones(n, dtype=bool)
    for i, line in enumerate(lines):
        if line is None:
            valid[i] = False
            continue
        raw = line.encode()
        ka, kc = int(alb_k[i]), int(clb_k[i])
        # ties resolve to ALB — the reference CLI's default dialect
        # (main.rs:29-30); also keeps the rule SQL-expressible for the
        # DuckDB oracle.
        d, k = (CLASSIC, kc) if kc > ka else (ALB, ka)
        dialects[i] = d.name
        fields_ok[i] = k
        positions[i] = failed_position_bytes(raw, d, _greedy_prefix_end(raw, d, k))
    vmask = pa.array(valid)
    return [
        pa.array(dialects, pa.string()),
        pc.if_else(vmask, pa.array(fields_ok), pa.scalar(None, pa.int32())),
        pc.if_else(vmask, pa.array(positions), pa.scalar(None, pa.int32())),
    ]


def with_diagnosis(df, text_col: str = "text"):
    """Append (nearest_dialect, fields_ok, failed_position) to a frame of
    (presumed malformed) lines — standalone variant of the diagnosis that
    ``parse.routed_json_both(with_diag=True)`` fuses into the hot path."""
    from collections.abc import Iterator

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("nearest_dialect", T.StringType(), True),
            T.StructField("fields_ok", T.IntegerType(), True),
            T.StructField("failed_position", T.IntegerType(), True),
        ]
    )

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.schema.get_field_index(text_col)
            text = batch.column(idx)
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            diag = diagnose_arrow(text.cast(pa.string()))
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, *diag],
                names=[*batch.schema.names, *DIAG_FIELDS],
            )

    return df.mapInArrow(gen, out_schema)
