"""Source-mixture sampler: the invariants the oracle-parity test can't
see (rate algebra, binding source, determinism) plus the plan audit —
value parity itself runs in tests/test_entry_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elb_pipeline.mixture import source_mixture, source_rates
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def mix(docs):
    return source_mixture(docs).toPandas().sort_values("source")


def test_binding_source_keeps_everything(mix):
    """≥1 source sits at rate 1.0 (it bounds the achievable budget) and
    the hash gate — frac ∈ [0,1) — keeps all of its docs and tokens."""
    binding = mix[mix["rate_6"] == 1.0]
    assert len(binding) >= 1
    assert (binding["n_kept"] == binding["n_total"]).all()
    assert (binding["tok_kept"] == binding["tok_total"]).all()


def test_rate_algebra_recovers_constant_budget(docs):
    """r = w·B/T  ⇒  r·T/w is the SAME budget B for every source — an
    exact algebraic identity of the decomposition, not a statistical one.
    Recompute w from the source-name weight rule and invert."""
    rates = source_rates(docs).toPandas()
    u = rates["source"].str.slice(3).astype(int) % 3 + 1
    w = u / u.sum()
    budget = rates["rate"] * rates["tok_total"] / w
    assert np.allclose(budget, budget.iloc[0], rtol=1e-12)
    # and B really is the min over T/w (the binding source's capacity)
    assert np.isclose(budget.iloc[0], (rates["tok_total"] / w).min())


def test_kept_never_exceeds_total(mix):
    assert (mix["n_kept"] <= mix["n_total"]).all()
    assert (mix["tok_kept"] <= mix["tok_total"]).all()
    assert (mix["rate_6"] <= 1.0).all() and (mix["rate_6"] > 0.0).all()


def test_deterministic_across_runs(docs, mix):
    again = source_mixture(docs).toPandas().sort_values("source")
    assert mix.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_mixture_plan_broadcasts_rates(spark):
    """The S-row rates side must broadcast (never sort-merge the corpus)
    and the only SinglePartition exchange feeds the per-source aggregate
    (the O(#sources) budget arithmetic), not a corpus scan."""
    import io
    import contextlib

    import __spark_entry__ as entry_mod

    df = entry_mod.q_source_mixture(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    lines = p.splitlines()
    single = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
    assert len(single) == 1, p
    assert "HashAggregate" in lines[single[0] + 1], p
