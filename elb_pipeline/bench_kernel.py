"""Picklable parse-kernel benchmark unit (multiprocessing-friendly).

One call = route-match (both grammars) + ALB field extraction over
``n_rows`` of the deterministic golden line mix, pure pyarrow/RE2 —
exactly the per-row work one executor core performs in the pipeline's
parse stage. Returns rows/sec for this process.
"""

from __future__ import annotations

import time


def parse_kernel_rate(n_rows: int) -> float:
    import pyarrow as pa
    import pyarrow.compute as pc

    from elb_pipeline.dialects import ALB_NAMED_PATTERN, CLASSIC_NAMED_PATTERN
    from elb_pipeline.goldens import TEXT_POOL

    lines = [TEXT_POOL[(i * 7 + 3) % len(TEXT_POOL)] for i in range(n_rows)]
    arr = pa.array(lines, pa.string())
    # small warm-up compile
    pc.extract_regex(arr.slice(0, 100), pattern=ALB_NAMED_PATTERN)
    t0 = time.monotonic()
    pc.match_substring_regex(arr, pattern=ALB_NAMED_PATTERN)
    pc.match_substring_regex(arr, pattern=CLASSIC_NAMED_PATTERN)
    pc.extract_regex(arr, pattern=ALB_NAMED_PATTERN)
    return n_rows / (time.monotonic() - t0)
