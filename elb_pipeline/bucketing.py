"""Bucketed-table co-location — shuffle-free joins/aggregations on conv_id.

At 100 TB the transcripts table is written ONCE bucketed by ``conv_id``
(Iceberg ``bucket(N, conv_id)`` partition transform, or Hive-style
``bucketBy`` as demonstrated here). Every downstream join or aggregation
keyed on conv_id then reads pre-partitioned data: Catalyst proves the
required distribution from the bucket spec and plans NO Exchange — the
single biggest shuffle in a conversation-level pipeline (re-keying 10^12
turns by conversation) disappears from every query that needs it.

tests/test_bucketing.py asserts the exchange-free plans and result
equality with the unbucketed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_TABLE_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = N_TABLE_BUCKETS,
    key: str = "conv_id",
) -> None:
    """Materialize ``df`` as a bucketed+sorted table on ``key``.

    Idempotent: drops the catalog entry AND its leftover warehouse
    location (a managed table's directory survives a dropped in-memory
    catalog from a previous session, and saveAsTable refuses to reuse it).
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "conv_id"
) -> DataFrame:
    """Join two tables bucketed on the same key — planned without any
    Exchange on either side (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key)
