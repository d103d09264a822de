"""Dedup-suite scaling bench: the SAME MinHash-LSH pipeline at 1x/Kx docs.

The r3 verdict asked for evidence that the dedup suite scales LINEARLY in
document count (constant docs/sec), not just that the sketch kernels got
faster in isolation. There is no sf1 testdata, so this harness builds the
scaled corpus deterministically from sf0.1: replica ``k`` of the planted
``doc_pool`` gets ``doc_id + k*1_000_000`` and a marker token ``zrep<k>``
inserted after every 2nd word. With word-3-gram shingles every trigram of
a replica then contains its marker, so cross-replica shingle sets are
DISJOINT: candidate generation stays per-replica, and the ideal workload
is exactly K x the base. That makes linearity the pass criterion — any
superlinear wall growth would be an all-pairs / bucket-skew pathology in
the pipeline itself. Structural checks: ZERO cross-replica pairs (the
markers make cross-replica shingle sets disjoint, so any such pair is a
banding bug), and per-replica pair counts within a tight band of each
other (exact equality is NOT expected: the marker token changes every
shingle's hash, so each replica is an independent draw of LSH's
probabilistic candidate recall; the exact-Jaccard verify then bounds the
spread).

Run:  python BENCH/dedup_scaling.py            # K = 1, 10, 40
      python BENCH/dedup_scaling.py 1 10 100   # custom replica counts

Prints one JSON line; builder-recorded results live in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICA_STRIDE = 1_000_000  # > max pooled doc_id (~205k): replica ids disjoint


def scaled_pool(docs, k_replicas: int):
    """K disjoint-shingle replicas of the planted dedup pool."""
    from pyspark.sql import functions as F

    from elb_pipeline.dedup import doc_pool

    base = doc_pool(docs)
    reps = []
    for k in range(k_replicas):
        # marker after every 2nd word => every 3-gram contains it
        marked = F.regexp_replace(F.col("text"), r"(\S+ \S+) ", f"$1 zrep{k} ")
        reps.append(
            base.select(
                (F.col("doc_id") + k * REPLICA_STRIDE).alias("doc_id"),
                marked.alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    # one shuffle to spread the unioned pool (same rationale as doc_pool)
    return out.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")


def run_level(spark, k_replicas: int, tag: str = "") -> dict:
    from elb_pipeline.dedup import dup_groups, materialized_signatures, verified_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pool = scaled_pool(docs, k_replicas)
    n_docs = pool.count()

    t0 = time.monotonic()
    sigs = materialized_signatures(pool, cache_key=f"scaling_k{k_replicas}{tag}")
    t_sigs = time.monotonic() - t0

    t0 = time.monotonic()
    from pyspark.sql import functions as F

    pairs = verified_pairs(sigs)
    rep = (F.col("a_id") / REPLICA_STRIDE).cast("long")
    per_rep = (
        pairs.groupBy(
            rep.alias("rep"),
            ((F.col("b_id") / REPLICA_STRIDE).cast("long") != rep).alias("cross"),
        )
        .count()
        .collect()
    )
    n_cross = sum(r["count"] for r in per_rep if r["cross"])
    rep_counts = sorted(r["count"] for r in per_rep if not r["cross"])
    n_pairs = sum(r["count"] for r in per_rep)
    t_pairs = time.monotonic() - t0

    t0 = time.monotonic()
    groups = dup_groups(pairs, cache_key=f"scaling_k{k_replicas}{tag}")
    n_grouped = groups.count()
    t_groups = time.monotonic() - t0

    total = t_sigs + t_pairs + t_groups
    return {
        "k": k_replicas,
        "docs": n_docs,
        "pairs": n_pairs,
        "cross_replica_pairs": n_cross,
        "pairs_per_replica_min_max": [rep_counts[0], rep_counts[-1]],
        "grouped_docs": n_grouped,
        "wall_sigs": round(t_sigs, 3),
        "wall_pairs": round(t_pairs, 3),
        "wall_groups": round(t_groups, 3),
        "wall_total": round(total, 3),
        "docs_per_sec": round(n_docs / total, 1),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 40]

    from elb_pipeline.session import get_spark, perf_conf

    # fresh cache root: every level pays its own materialization write
    os.environ["ELB_MAT_CACHE"] = tempfile.mkdtemp(prefix="elb_dedup_scaling_")
    spark = get_spark(
        app="dedup_scaling",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=perf_conf(),
    )
    repeats = int(os.environ.get("ELB_DEDUP_SCALING_REPEATS", "2"))
    try:
        run_level(spark, 1)  # untimed warm-up: JVM JIT + Python worker pool
        # best-of-N per level: host-noise windows on this box only ever
        # SLOW a run (see BENCH/BASELINE.md), so per-level best is the
        # least-biased steady-state estimate; all walls are reported.
        levels = []
        for k in ks:
            reps = [run_level(spark, k, tag=f"_r{i}") for i in range(repeats)]
            best = min(reps, key=lambda r: r["wall_total"])
            best["wall_total_all_runs"] = [r["wall_total"] for r in reps]
            levels.append(best)
    finally:
        spark.stop()
        shutil.rmtree(os.environ["ELB_MAT_CACHE"], ignore_errors=True)

    base = levels[0]
    structural_ok = all(
        lv["cross_replica_pairs"] == 0
        and lv["docs"] == lv["k"] * base["docs"] // base["k"]
        # per-replica pair counts are i.i.d. draws of LSH recall; a wide
        # spread would mean bucket skew or leakage, not sampling noise
        and lv["pairs_per_replica_min_max"][0]
        >= 0.8 * lv["pairs_per_replica_min_max"][1]
        for lv in levels
    )
    # linearity: docs/sec at the largest K vs the base level (base has
    # fixed Spark-job overhead amortized worst, so >=1.0 is the floor)
    lin = levels[-1]["docs_per_sec"] / base["docs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "minhash-lsh dedup suite scaling (docs/sec vs corpus size)",
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "levels": levels,
                "structural_ok": structural_ok,
                "throughput_ratio_largest_vs_base": round(lin, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
