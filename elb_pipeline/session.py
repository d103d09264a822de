"""SparkSession factory with the pipeline's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def perf_conf(heap: str = "24g") -> dict[str, str]:
    """Extra confs for throughput-measured runs (bench / production job).

    - Fixed heap (``-Xms`` == ``-Xmx``) + ``AlwaysPreTouch``: the heap is
      faulted in once at startup instead of growing under load — measured
      on this box, heap growth during the first big action put every core
      into ~90% *system* time (page-fault + TLB-shootdown storms).
    - ParallelGC with a large fixed young gen: the pipeline's garbage is
      almost entirely short-lived Arrow→UnsafeRow buffers; a big eden
      avoids promotion churn.
    """
    xmn = max(int(heap.rstrip("g")) // 2, 1)
    return {
        # -Xmx is derived from spark.driver.memory; pin it to the same value
        # here so -Xms can never exceed it (a mismatched SPARK_DRIVER_MEMORY
        # would otherwise make the JVM refuse to start).
        "spark.driver.memory": heap,
        "spark.driver.extraJavaOptions": (
            f"-Xms{heap} -Xmn{xmn}g -XX:+UseParallelGC -XX:+AlwaysPreTouch"
        ),
        "spark.python.worker.reuse": "true",
    }


def get_spark(
    app: str = "elb_pipeline",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize the JVM↔Python hop in the parse UDF
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        # keep saveAsTable warehouses out of the repo working directory
        .config("spark.sql.warehouse.dir", "/tmp/elb_spark_warehouse")
        # Spark 4.1 checksums every streaming-checkpoint file through a
        # blocking thread-pool hop; on local-FS checkpoints that dominates
        # small-batch state commits (measured: the sessionization drain
        # blew a 120 s budget). Local /tmp checkpoints don't need it; a
        # production HDFS/S3 deployment can re-enable per query.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
