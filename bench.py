#!/usr/bin/env python
"""Benchmark harness.

Headline metric: end-to-end parse→route→enrich→aggregate wall time (and
turns/sec) over a deterministic synthesized transcripts table sized to the
scale factor, on local[$SPARK_GRAFT_CPUS]. Also times the per-query suite
from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

Scaling evidence (BASELINE.json: efficiency ≥0.8 from N to 4N executors):
the same pipeline job is re-run in clean subprocesses at local[N_LOW] and
local[N_HIGH] over the same pre-written parquet input, and throughput
scaling efficiency = (thr_high / thr_low) / (N_HIGH / N_LOW) is reported.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...,
   "rows": N, "throughput_turns_per_sec": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# rows scale with sf: sf0.1 → 8M turns (enough that steady-state parse CPU
# dominates scheduling overhead at 32 cores)
ROWS_PER_SF = 80_000_000
BENCH_DATA_ROOT = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spark_graft_bench")


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _ensure_input(n_rows: int) -> str:
    """Write the deterministic transcripts parquet once; reuse across runs
    and parallelism levels so every measurement reads identical bytes."""
    path = os.path.join(BENCH_DATA_ROOT, f"transcripts_{n_rows}")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    from elb_pipeline.session import get_spark
    from elb_pipeline.synth import synth_transcripts

    spark = get_spark(app="bench_datagen", master=f"local[{CPUS}]")
    synth_transcripts(spark, n_rows, partitions=max(CPUS * 4, 64)).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def run_pipeline(input_path: str, cpus: int) -> dict:
    """One timed pipeline run at local[cpus]. Reads parquet → parse → route
    → enrich → per-sink aggregates → count actions. Returns timing dict."""
    from pyspark.sql import functions as F

    from elb_pipeline.aggregate import sink_day_bucket_counts
    from elb_pipeline.dialects import SINK_ALB, SINK_CLASSIC
    from elb_pipeline.enrich import enrich
    from elb_pipeline.parse import routed_dialect_json, with_sink
    from elb_pipeline.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app=f"bench_pipeline_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    df = spark.read.parquet(input_path)
    n_rows = df.count()

    def full_run(frame):
        """Complete reference semantics: route every line, extract every
        valid line's fields, serialize its NDJSON, aggregate per sink.
        (JSON output is reduced to sum(length) instead of written to disk
        so the measurement is compute-bound, not disk-bound. No persist:
        Spark's columnar cache is pathological on long text columns —
        recomputing the match-only routing per pass is far cheaper.)"""
        routed = enrich(with_sink(frame), spark).withColumn(
            "ts_day", F.to_date("ts")
        )
        counts = (
            sink_day_bucket_counts(routed)
            .groupBy("sink")
            .agg(F.sum("n").alias("n"))
        )
        text_only = frame.select("text")
        branches = [counts]
        for sink in (SINK_ALB, SINK_CLASSIC):
            # fused Arrow op: route→filter→extract→NDJSON in one pass;
            # text-only input minimizes the Python↔JVM boundary traffic
            branches.append(
                routed_dialect_json(text_only, sink)
                .select(F.length("json").alias("l"))
                .groupBy()
                .agg(F.sum("l").alias("n"))
                .select(F.lit(f"_{sink}_json_bytes").alias("sink"), "n")
            )
        # single action: all branches run in one job, so the Python worker
        # pool stays hot across the whole measurement
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return {
            r["sink"]: r["n"]
            for r in out.collect()
            if not r["sink"].startswith("_")
        }

    # untimed warm-up on a sample that spans ALL partitions: JIT, the full
    # Python-worker pool spawn (each worker imports pyarrow/pandas once),
    # and broadcast build are O(1) session costs, not per-row pipeline work
    full_run(df.sample(0.03, seed=7))

    t0 = time.monotonic()
    sink_totals = full_run(df)
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "rows": n_rows,
        "wall_sec": wall,
        "turns_per_sec": n_rows / wall,
        "sink_totals": sink_totals,
    }


def _run_subprocess(input_path: str, cpus: int) -> dict:
    """Clean-JVM pipeline run (fresh process per parallelism level)."""
    out = subprocess.run(
        [sys.executable, __file__, "--pipeline-only", input_path, str(cpus)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"pipeline subprocess failed:\n{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def kernel_scaling(n_rows: int = 100_000, procs=(1, 8, 32)) -> dict:
    """Process-isolated scaling of the parse kernel (RE2 extract+match over
    the golden line mix) — the per-executor work unit. On a real cluster,
    N → 4N EXECUTORS adds independent machines, which this models far more
    faithfully than thread-scaling inside one shared-memory JVM where the
    parquet feed, Arrow IPC, and worker compute all contend for the same
    cores. Deterministic (fixed line mix, fixed duration-free workload)."""
    from multiprocessing import Pool

    from elb_pipeline.bench_kernel import parse_kernel_rate

    out = {}
    for p in procs:
        if p > CPUS:
            continue
        with Pool(p) as pool:
            rates = pool.map(parse_kernel_rate, [n_rows] * p)
        out[str(p)] = round(sum(rates), 1)
    ps = sorted(int(k) for k in out)
    if len(ps) >= 2:
        lo, hi = ps[-2], ps[-1]
        out["efficiency"] = round((out[str(hi)] / out[str(lo)]) / (hi / lo), 3)
    return out


def run_query_suite(sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from elb_pipeline.session import get_spark

    spark = get_spark(app="bench_queries", master=f"local[{CPUS}]")
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return timings


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-only":
        print(json.dumps(run_pipeline(sys.argv[2], int(sys.argv[3]))))
        return

    sf = _sf_from_dir(SF_DIR)
    n_rows = max(int(ROWS_PER_SF * sf), 10_000)
    input_path = _ensure_input(n_rows)

    n_low = max(CPUS // 4, 1)
    low = _run_subprocess(input_path, n_low)
    high = _run_subprocess(input_path, CPUS)
    efficiency = (high["turns_per_sec"] / low["turns_per_sec"]) / (CPUS / n_low)

    kernels = kernel_scaling()
    queries = run_query_suite(SF_DIR)

    result = {
        "metric": "end-to-end parse+route+enrich+aggregate wall time (transcripts)",
        "value": round(high["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "rows": n_rows,
        "throughput_turns_per_sec": round(high["turns_per_sec"], 1),
        "scaling": {
            "cpus_low": n_low,
            "wall_sec_low": round(low["wall_sec"], 3),
            "turns_per_sec_low": round(low["turns_per_sec"], 1),
            "cpus_high": CPUS,
            "wall_sec_high": round(high["wall_sec"], 3),
            "turns_per_sec_high": round(high["turns_per_sec"], 1),
            "efficiency": round(efficiency, 3),
            # process-isolated parse-kernel scaling: models N→4N EXECUTORS
            # (independent machines) rather than threads sharing one box
            "parse_kernel_rows_per_sec": kernels,
        },
        "sink_totals": high["sink_totals"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
