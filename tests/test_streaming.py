"""Streaming smoke: the stateless parse/route stages run unchanged under
Structured Streaming, and windowed per-sink counts equal the batch counts."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from elb_pipeline.dialects import parse_line
from elb_pipeline.streaming import run_stream_to_memory
from elb_pipeline.synth import transcripts_from_events

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_counts_match_batch(spark, tmp_path):
    t = transcripts_from_events(spark, SF_DIR)
    path = str(tmp_path / "stream_in")
    t.write.mode("overwrite").parquet(path)

    out = run_stream_to_memory(spark, path, query_name="t_counts")
    got = collections.Counter()
    for r in out.groupBy("sink").agg(F.sum("n").alias("n")).collect():
        got[r["sink"]] = r["n"]

    want = collections.Counter(
        parse_line(r["text"])[0] for r in t.select("text").collect()
    )
    assert dict(got) == dict(want)


def test_streaming_fused_json_matches_batch(spark, tmp_path):
    """The fused route+extract+NDJSON+diagnosis operator runs unchanged
    under readStream and emits byte-identical output to the batch path."""
    from elb_pipeline.parse import routed_json_both
    from elb_pipeline.streaming import run_json_stream_to_memory

    t = transcripts_from_events(spark, SF_DIR)
    path = str(tmp_path / "stream_in_json")
    t.write.mode("overwrite").parquet(path)

    streamed = run_json_stream_to_memory(spark, path, query_name="t_json")
    batch = routed_json_both(spark.read.parquet(path), with_diag=True)

    key = ["conv_id", "turn_idx"]
    cols = key + ["sink", "json", "mal_text", "fields_ok", "failed_position"]
    got = {tuple(r[k] for k in key): tuple(r[c] for c in cols[2:])
           for r in streamed.select(*cols).collect()}
    want = {tuple(r[k] for k in key): tuple(r[c] for c in cols[2:])
            for r in batch.select(*cols).collect()}
    assert got == want and len(got) > 0
