"""Picklable parse-kernel benchmark unit (multiprocessing-friendly).

One call = the FULL fused per-row kernel the pipeline's hot stage runs
(route + both-dialect field extraction + NDJSON assembly via
``parse.route_json_arrow``) over ``n_rows`` of the deterministic golden
line mix, in Spark-sized Arrow batches, pure pyarrow/RE2. Returns
rows/sec for this process. Process-isolated runs of this kernel model
N → 4N *executors* (independent machines with independent memory buses)
more faithfully than thread-scaling inside one shared-memory box.
"""

from __future__ import annotations

import time

BATCH_ROWS = 20_000  # matches spark.sql.execution.arrow.maxRecordsPerBatch


def parse_kernel_rate(n_rows: int) -> float:
    import pyarrow as pa

    from elb_pipeline.goldens import TEXT_POOL
    from elb_pipeline.parse import _pin_worker_pools, route_json_arrow

    _pin_worker_pools()
    lines = [TEXT_POOL[(i * 7 + 3) % len(TEXT_POOL)] for i in range(n_rows)]
    arr = pa.array(lines, pa.string())
    route_json_arrow(arr.slice(0, 1000))  # warm-up compile
    best = 0.0
    for _ in range(2):  # best-of-2: host-noise bursts only slow a pass
        t0 = time.monotonic()
        for i in range(0, n_rows, BATCH_ROWS):
            route_json_arrow(arr.slice(i, BATCH_ROWS))
        best = max(best, n_rows / (time.monotonic() - t0))
    return best


def cpu_probe_rate(seconds: float = 2.0) -> float:
    """Pure-CPU busy-loop rate (loops/sec) — the hardware-contention
    control: how much compute this box actually delivers at a given
    process count, independent of Spark, Arrow, or memory bandwidth."""
    t0 = time.monotonic()
    x = 0
    iters = 0
    while time.monotonic() - t0 < seconds:
        for _ in range(100_000):
            x += 1
        iters += 1
    return iters / (time.monotonic() - t0)
