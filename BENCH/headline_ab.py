#!/usr/bin/env python
"""Interleaved headline A/B: round-2 code vs current code, same input,
same session window (VERDICT r3 #1).

The r3 driver recorded the thread-mode local[32] headline at 26.2 s best
vs r2's 15.7 s — on a box with a documented 1.5–4× host-noise spread and
measurements taken hours apart. This harness removes the window variable:
it checks the round-2 snapshot out into a worktree and alternates
A(r2-code) / B(current-code) subprocess runs of the IDENTICAL pipeline
job over the IDENTICAL input parquet, so adjacent runs share the noise
window and the per-round ratio isolates the code delta.

Usage:  python BENCH/headline_ab.py [rounds] [rows] [cpus]
Output: one JSON line with per-round walls, per-side bests, and the
        per-round B/A throughput ratios (ratio ≈ 1 ⇒ the r3 regression
        was the window, not the code).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2_COMMIT = "0d7a9ad"  # round 2: end-of-round snapshot
R2_WORKTREE = "/tmp/elb_headline_ab_r2"


def _ensure_r2_worktree() -> str:
    if not os.path.exists(os.path.join(R2_WORKTREE, "bench.py")):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--force", R2_WORKTREE,
             R2_COMMIT],
            check=True,
            capture_output=True,
        )
    return R2_WORKTREE


def _run_side(repo_dir: str, input_path: str, cpus: int,
              legacy_argv: bool) -> dict:
    """One subprocess headline run of a given code tree. The r2 bench's
    --pipeline-only took (input, cpus); the current one takes an extra
    n_execs argument."""
    argv = [sys.executable, os.path.join(repo_dir, "bench.py"),
            "--pipeline-only", input_path, str(cpus)]
    if not legacy_argv:
        argv.append("0")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_dir
    out = subprocess.run(
        argv, cwd=repo_dir, env=env, check=True,
        capture_output=True, text=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, REPO)
    import bench

    bench.CPUS = cpus
    input_path = bench._ensure_input(rows)
    r2_dir = _ensure_r2_worktree()

    a_runs, b_runs, ratios = [], [], []
    for i in range(rounds):
        a = _run_side(r2_dir, input_path, cpus, legacy_argv=True)
        b = _run_side(REPO, input_path, cpus, legacy_argv=False)
        a_runs.append(a)
        b_runs.append(b)
        ratios.append(b["turns_per_sec"] / a["turns_per_sec"])
        print(
            f"# round {i}: r2 {a['wall_sec']:.2f}s "
            f"({a['turns_per_sec']:,.0f}/s)  vs  current "
            f"{b['wall_sec']:.2f}s ({b['turns_per_sec']:,.0f}/s)  "
            f"ratio {ratios[-1]:.3f}",
            file=sys.stderr,
        )

    best_a = max(a_runs, key=lambda r: r["turns_per_sec"])
    best_b = max(b_runs, key=lambda r: r["turns_per_sec"])
    result = {
        "rounds": rounds,
        "rows": rows,
        "cpus": cpus,
        "r2_commit": R2_COMMIT,
        "r2_walls": [round(r["wall_sec"], 3) for r in a_runs],
        "current_walls": [round(r["wall_sec"], 3) for r in b_runs],
        "r2_best_turns_per_sec": round(best_a["turns_per_sec"], 1),
        "current_best_turns_per_sec": round(best_b["turns_per_sec"], 1),
        "ratio_rounds": [round(r, 3) for r in ratios],
        "ratio_median_round": round(sorted(ratios)[len(ratios) // 2], 3),
        "ratio_best": round(
            best_b["turns_per_sec"] / best_a["turns_per_sec"], 3
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
