#!/usr/bin/env python
"""Round-3 scaling-gate experiment: true N-vs-4N *executors* on one box.

Runs the identical fused pipeline job (bench.run_pipeline) under Spark's
local-cluster mode — 1 executor JVM x 8 cores (affinity: 8 cores) versus
4 executor JVMs x 8 cores (affinity: 32 cores) — in alternating rounds so
adjacent pairs share the host-noise window. Appends one JSON line per run
to BENCH/scaling_experiments.jsonl and prints a summary.

Usage: python BENCH/scaling_experiment.py [rounds] [n_rows] [tag ...]
  tags: lc = local-cluster pair, local = single-JVM local[N] pair
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "scaling_experiments.jsonl")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    tags = sys.argv[3:] or ["lc"]
    parts = os.environ.get("SPARK_GRAFT_INPUT_PARTS")
    input_path = bench._ensure_input(n_rows, int(parts) if parts else None)
    configs = []
    for t in tags:
        if t == "lc":
            t = "lc8"
        if t.startswith("lc"):
            width = int(t[2:])  # cores per executor: lc4 = 1x4 vs 4x4
            configs += [
                (f"lc1x{width}", width, 1),
                (f"lc4x{width}", 4 * width, 4),
            ]
        elif t == "local":
            configs += [("local8", 8, 0), ("local32", 32, 0)]
    per_tag: dict[str, list] = {}
    with open(OUT, "a") as fh:
        for rnd in range(rounds):
            for tag, cpus, nex in configs:
                t0 = time.time()
                try:
                    r = bench._run_subprocess(input_path, cpus, nex)
                except Exception as exc:  # record and continue
                    r = {"error": str(exc)[-2000:], "cpus": cpus}
                r.update(
                    tag=tag,
                    round=rnd,
                    split_mb=os.environ.get("SPARK_GRAFT_SPLIT_MB"),
                    input_parts=parts,
                    driver_cores=os.environ.get("SPARK_GRAFT_DRIVER_CORES"),
                    exec_pin=os.environ.get("SPARK_GRAFT_EXEC_PIN"),
                    n_rows=n_rows,
                    total_wall=round(time.time() - t0, 1),
                )
                fh.write(json.dumps(r) + "\n")
                fh.flush()
                print(json.dumps(r), flush=True)
                per_tag.setdefault(tag, []).append(r)

    def best(tag: str) -> float:
        rs = [r for r in per_tag.get(tag, []) if "turns_per_sec" in r]
        return max((r["turns_per_sec"] for r in rs), default=0.0)

    seen_widths = sorted(
        {int(tag.split("x")[1]) for tag, *_ in configs if tag.startswith("lc1x")}
    )
    summary_pairs = [(f"lc1x{w}", f"lc4x{w}", 4) for w in seen_widths]
    summary_pairs.append(("local8", "local32", 4))
    for lo, hi, f in summary_pairs:
        if best(lo) and best(hi):
            print(
                f"SUMMARY {lo}->{hi}: {best(lo):.0f} -> {best(hi):.0f} "
                f"turns/s, efficiency {best(hi) / best(lo) / f:.3f}"
            )


if __name__ == "__main__":
    main()
