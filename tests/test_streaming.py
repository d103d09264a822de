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


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionization: the LAST update emitted per
    conversation must carry the full batch-computed totals."""
    from elb_pipeline.parse import with_sink
    from elb_pipeline.streaming import run_sessions_to_memory

    t = transcripts_from_events(spark, SF_DIR)
    path = str(tmp_path / "stream_in_state")
    t.write.mode("overwrite").parquet(path)

    out = run_sessions_to_memory(spark, path, query_name="t_sessions")
    # keep the final (highest n_turns) update per conversation
    latest = {}
    for r in out.collect():
        cur = latest.get(r["conv_id"])
        if cur is None or r["n_turns"] > cur["n_turns"]:
            latest[r["conv_id"]] = r

    batch = (
        with_sink(t)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum((F.col("sink") == "malformed").cast("long")).alias("n_malformed"),
            F.max("ts").alias("last_ts"),
        )
    )
    want = {r["conv_id"]: r for r in batch.collect()}
    assert set(latest) == set(want)
    for cid, r in latest.items():
        w = want[cid]
        assert (r["n_turns"], r["n_malformed"], r["last_ts"]) == (
            w["n_turns"], w["n_malformed"], w["last_ts"]
        ), cid


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the update function
    (the end-to-end streaming run of the timeout path is wall-clock
    dependent and flaky in CI; the accumulate path is covered end-to-end
    by test_stateful_sessionization)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_session_update_fn_accumulates_and_closes():
    import pandas as pd

    from elb_pipeline.streaming import _session_update_fn

    fn = _session_update_fn(idle_timeout_ms=1234)
    ts1 = pd.Timestamp("2024-01-01 10:00:00")
    ts2 = pd.Timestamp("2024-01-01 11:00:00")
    pdf = pd.DataFrame({"sink": ["alb", "malformed", "alb"], "ts": [ts2, ts1, ts1]})

    # fresh conversation: accumulate + arm the timeout
    state = _FakeState()
    (out,) = list(fn(("conv-x",), iter([pdf]), state))
    assert out.iloc[0].tolist() == ["conv-x", 3, 1, ts2, False]
    assert state.get == (3, 1, ts2) and state.timeout_ms == 1234

    # second batch: running totals keep growing
    (out2,) = list(fn(("conv-x",), iter([pdf]), state))
    assert out2.iloc[0].tolist() == ["conv-x", 6, 2, ts2, False]

    # idle timeout: closed row emitted, state removed
    state.hasTimedOut = True
    (closed,) = list(fn(("conv-x",), iter([]), state))
    assert closed.iloc[0].tolist() == ["conv-x", 6, 2, ts2, True]
    assert state.removed
