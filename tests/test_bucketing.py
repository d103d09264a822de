"""Bucketed-table co-location: joins and aggregations on the bucket key
must plan WITHOUT an Exchange, and results must equal the shuffled path."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from elb_pipeline.bucketing import colocated_join, write_bucketed
from elb_pipeline.synth import transcripts_from_events

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    t = transcripts_from_events(spark, SF_DIR)
    convs = t.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    write_bucketed(t, "tb_transcripts")
    write_bucketed(convs, "tb_conv_stats")

    # at test scale the planner would BROADCAST these tiny tables (also a
    # no-fact-shuffle plan); disable it so the plan exercises the bucketed
    # sort-merge path a 100 TB fact-to-fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "tb_transcripts", "tb_conv_stats")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located: bucket spec satisfies the join distribution BOTH sides
        assert "Exchange" not in plan

        # and the result equals the plain (shuffling) join
        plain = t.join(convs, "conv_id")
        assert joined.count() == plain.count()
        got = joined.groupBy().agg(F.sum("n_turns").alias("s")).first()["s"]
        want = plain.groupBy().agg(F.sum("n_turns").alias("s")).first()["s"]
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark):
    t = transcripts_from_events(spark, SF_DIR)
    write_bucketed(t, "tb_transcripts_agg")
    bucketed = spark.table("tb_transcripts_agg")
    agg = bucketed.groupBy("conv_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)
    want = {
        r["conv_id"]: r["n"]
        for r in t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    got = {r["conv_id"]: r["n"] for r in agg.collect()}
    assert got == want
