#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists so per-query iteration doesn't touch it).

Mirrors bench.run_query_suite exactly — same session factory, same
master local[$SPARK_GRAFT_CPUS], same cold per-invocation ELB_MAT_CACHE,
same registry order, same `.count()` action — but adds:

  --queries a,b,c    run only the named queries (still in registry order,
                     so intra-suite matcache reuse matches the real suite
                     ONLY when the prefix that populates the cache is
                     included; use --full for honest end-state numbers)
  --repeats N        re-run the selected queries N times in the same
                     session (first pass is the suite-comparable one; the
                     later passes separate warm-cache compute from the
                     one-time materialization cost)
  --plans DIR        write <query>.txt with explain('formatted') for each
                     selected query (plan capture for plans/r06/)
  --sf DIR           data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)

Prints one JSON line: {"queries": {name: wall_first, ...},
"repeat_walls": {name: [w1, w2, ...]}, "total": sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--plans", default="")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument(
        "--keep-cache",
        action="store_true",
        help="reuse ELB_MAT_CACHE from the environment instead of a cold tmpdir",
    )
    args = ap.parse_args()

    if not args.keep_cache:
        os.environ["ELB_MAT_CACHE"] = tempfile.mkdtemp(prefix="elb_mat_bx_")

    import __spark_entry__ as entry_mod
    from elb_pipeline.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="bench_extra", master=f"local[{cpus}]")
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()]
    reg = entry_mod.queries()
    unknown = [q for q in wanted if q not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sel = {k: v for k, v in reg.items() if not wanted or k in wanted}

    timings: dict[str, float] = {}
    repeat_walls: dict[str, list[float]] = {k: [] for k in sel}
    t_total = time.monotonic()
    for r in range(args.repeats):
        for name, fn in sel.items():
            spark.sparkContext.setJobDescription(f"bx:{name}:r{r}")
            t0 = time.monotonic()
            fn(spark, args.sf).count()
            w = round(time.monotonic() - t0, 3)
            repeat_walls[name].append(w)
            if r == 0:
                timings[name] = w
    total = round(time.monotonic() - t_total, 3)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name, fn in sel.items():
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
    spark.stop()
    print(json.dumps(
        {"queries": timings, "repeat_walls": repeat_walls, "total": total},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
