"""End-to-end pipeline job: parse → route → enrich → fan-out sinks → aggregate.

Observable semantics mirror the reference CLI (main.rs:67-212):

- parse-or-reject per line (alb.rs:199-203 / classic_lb.rs:109-113) →
  routed to three sinks instead of stdout/stderr;
- ``skip`` vs ``strict`` error policy = the ``--skip-parse-errors`` flag
  (main.rs:53-54, 194-203): strict raises if ANY line is malformed, skip
  routes them to the dead-letter sink and continues (like the reference,
  strict failure can leave partial output behind — the CLI too has already
  emitted parsed lines to stdout when it aborts);
- NDJSON output per valid sink, byte-identical to serde_json.

Scale design (the parts the reference cannot express):

- the input is processed in ``n_groups`` conv_id bucket groups
  (crc32-based — version-stable so resume survives upgrades); each group
  commits independently with a manifest (checkpoint.py), so a failed run
  resumes at group granularity. On a real cluster the transcripts Iceberg
  table is bucket-partitioned by conv_id, making each group's scan prune
  to its own files; in local tests the filter is evaluated post-scan.
- within a group the data is read ONCE: valid rows fan out to the alb /
  classic_lb sinks in a single dynamic-partition write
  (``partitionBy(sink, ts_day)``), with per-dialect field extraction and
  NDJSON serialization inline in that same pass. No persist: caching the
  routed frame measured pathological at scale (Spark's columnar cache
  builder crawls on wide text columns), and recomputing the match-only
  routing is far cheaper than materializing it.
- malformed rows (the small minority) get a second, cheap pass that runs
  the failed-position diagnosis only on them — the same error fast-path
  asymmetry as the reference (alb.rs:199-203 allocates only on failure).
- aggregates and per-partition lineage are computed from the written
  output (parquet footer statistics make the counts metadata-cheap), so
  the manifest reflects what is actually on disk, not what was planned.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elb_pipeline import checkpoint
from elb_pipeline.aggregate import conv_bucket
from elb_pipeline.dialects import SINK_ALB, SINK_CLASSIC, SINK_MALFORMED
from elb_pipeline.deadletter import diagnosis
from elb_pipeline.enrich import enrich
from elb_pipeline.parse import routed_dialect_json, routed_filter


class StrictModeError(RuntimeError):
    """Raised in strict mode when any line fails to parse (main.rs:194-203)."""


@dataclass
class JobResult:
    groups_run: list[int] = field(default_factory=list)
    groups_skipped: list[int] = field(default_factory=list)
    sink_counts: dict[str, int] = field(default_factory=dict)
    wall_seconds: float = 0.0


def _group_filter(n_groups: int, group: int) -> F.Column:
    # crc32 is stable across Spark versions (unlike hash/xxhash64 seeds in
    # principle) — resume manifests stay valid across upgrades.
    return F.pmod(F.crc32(F.col("conv_id").cast("binary")), F.lit(n_groups)) == group


def run_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    mode: str = "skip",
    n_groups: int = 4,
    resume: bool = True,
) -> JobResult:
    """Run the full pipeline over ``transcripts`` into ``output_dir``.

    Layout:
      {out}/valid/group=G/sink=.../ts_day=.../   parquet; fields + NDJSON line
      {out}/malformed/group=G/                   dead letter w/ diagnosis
      {out}/aggregates/group=G/                  (sink, conv_bucket, ts_day, n)
      {out}/_manifests/group-GGGG.json           commit marker + metrics
    """
    if mode not in ("skip", "strict"):
        raise ValueError(f"mode must be skip|strict, got {mode!r}")
    t0 = time.monotonic()
    result = JobResult()

    for g in range(n_groups):
        if resume and checkpoint.is_done(output_dir, g):
            result.groups_skipped.append(g)
            continue
        _run_group(spark, transcripts, output_dir, mode, n_groups, g)
        result.groups_run.append(g)

    # roll up job-level sink totals from the manifests
    totals: dict[str, int] = {s: 0 for s in (SINK_ALB, SINK_CLASSIC, SINK_MALFORMED)}
    for g in checkpoint.completed_groups(output_dir):
        for sink, n in checkpoint.read_manifest(output_dir, g)["sink_counts"].items():
            totals[sink] = totals.get(sink, 0) + n
    result.sink_counts = totals
    result.wall_seconds = time.monotonic() - t0
    return result


def _run_group(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    mode: str,
    n_groups: int,
    group: int,
) -> None:
    rows = transcripts.where(_group_filter(n_groups, group))

    base_cols = [
        "conv_id", "turn_idx", "role", "tool", "ts",
        "role_group", "is_human", "tool_family", "is_io", "src_partition",
    ]

    def _finish(df):
        return enrich(df, spark).withColumn("ts_day", F.to_date("ts")).withColumn(
            "src_partition", F.spark_partition_id()
        )

    # ---- pass 1 (the big one): per valid sink, ONE fused Arrow operator
    # does route → in-batch filter → field extraction → NDJSON assembly, so
    # only the surviving rows (+ their json line) ever cross back to the
    # JVM; both sinks land in a single dynamic-partition write.
    alb_rows = _finish(routed_dialect_json(rows, SINK_ALB)).select(
        *base_cols, F.lit(SINK_ALB).alias("sink"), "ts_day", "json"
    )
    clb_rows = _finish(routed_dialect_json(rows, SINK_CLASSIC)).select(
        *base_cols, F.lit(SINK_CLASSIC).alias("sink"), "ts_day", "json"
    )
    (
        alb_rows.unionByName(clb_rows)
        .write.mode("overwrite")
        .partitionBy("sink", "ts_day")
        .parquet(f"{output_dir}/valid/group={group}")
    )

    # ---- pass 2 (small): dead letters with failed-position diagnosis —
    # diagnosis runs ONLY on malformed rows (error fast-path asymmetry)
    (
        _finish(routed_filter(rows, SINK_MALFORMED))
        .select(*base_cols, "ts_day", "text", diagnosis().alias("diag"))
        .write.mode("overwrite")
        .parquet(f"{output_dir}/{SINK_MALFORMED}/group={group}")
    )

    # ---- metrics from what actually landed on disk (footer-cheap counts)
    written_valid = spark.read.parquet(f"{output_dir}/valid/group={group}")
    written_mal = spark.read.parquet(f"{output_dir}/{SINK_MALFORMED}/group={group}")
    written = written_valid.select("sink", "conv_id", "ts_day", "src_partition").unionByName(
        written_mal.select(
            F.lit(SINK_MALFORMED).alias("sink"), "conv_id", "ts_day", "src_partition"
        )
    )

    agg = written.groupBy("sink", conv_bucket(), "ts_day").agg(
        F.count("*").alias("n")
    )
    agg.write.mode("overwrite").parquet(f"{output_dir}/aggregates/group={group}")

    lineage_rows = (
        written.groupBy(F.col("src_partition").alias("partition_id"), "sink")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    sink_counts = {s: 0 for s in (SINK_ALB, SINK_CLASSIC, SINK_MALFORMED)}
    for r in lineage_rows:
        sink_counts[r["sink"]] = sink_counts.get(r["sink"], 0) + r["n"]

    if mode == "strict" and sink_counts.get(SINK_MALFORMED, 0) > 0:
        raise StrictModeError(
            f"strict mode: {sink_counts[SINK_MALFORMED]} malformed line(s) "
            f"in bucket group {group}"
        )

    checkpoint.write_manifest(
        output_dir,
        group,
        {
            "group": group,
            "n_groups": n_groups,
            "mode": mode,
            "sink_counts": sink_counts,
            "lineage": [
                {"partition_id": r["partition_id"], "sink": r["sink"], "n": r["n"]}
                for r in sorted(
                    lineage_rows, key=lambda r: (r["partition_id"], r["sink"])
                )
            ],
        },
    )
