"""Semantics of the incremental (corpus-refresh) dedup — the driver oracle
(`dedup_incremental`) proves engine parity on the planted pool, but that
pool only produces exact_corpus/near_corpus batch docs (every batch doc is
a clone of an original). This test hand-builds a pool that exercises ALL
five statuses and the greedy precedence rules."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from elb_pipeline.dedup import incremental_dedup, with_signatures

# ~20 distinct words so word-3-gram Jaccard is meaningful; the "near" texts
# append two words (J ~ 18/20 shingles shared > 0.5), the "far" text shares
# almost nothing.
_BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " \
    "kilo lima mike november oscar papa quebec romeo sierra tango"
_OTHER = "one two three four five six seven eight nine ten eleven twelve " \
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
_THIRD = "red orange yellow green blue indigo violet black white gray " \
    "pink brown cyan magenta teal maroon navy olive silver gold"

SPLIT = 100


@pytest.fixture(scope="module")
def statuses(spark):
    pool = spark.createDataFrame(
        [
            # corpus
            Row(doc_id=1, text=_BASE),
            Row(doc_id=2, text=_OTHER),
            # batch
            Row(doc_id=101, text=_BASE),                      # exact_corpus
            Row(doc_id=102, text=_BASE + " zq extra tail"),   # near_corpus
            Row(doc_id=103, text=_OTHER + " aa bb"),          # near_corpus
            Row(doc_id=104, text=_OTHER + " aa bb"),          # exact_batch (dup of 103)
            Row(doc_id=105, text=_THIRD),                     # kept (novel base)
            Row(doc_id=106, text=_THIRD + " zq tail words"),  # near_batch (near 105 only)
            Row(doc_id=107, text="totally different words " * 5),  # kept
        ]
    )
    out = incremental_dedup(pool, with_signatures(pool), SPLIT)
    return {r.doc_id: r.status for r in out.collect()}


def test_all_batch_docs_reported(statuses):
    assert sorted(statuses) == [101, 102, 103, 104, 105, 106, 107]


def test_exact_corpus_beats_everything(statuses):
    assert statuses[101] == "exact_corpus"


def test_near_corpus(statuses):
    assert statuses[102] == "near_corpus"


def test_exact_batch_keeps_min_id(statuses):
    # 103 is the first carrier of its content: kept unless near corpus
    assert statuses[103] == "near_corpus"  # _OTHER + 2 words is near 2
    assert statuses[104] == "exact_batch"


def test_near_batch_smaller_id_wins(statuses):
    # 105 is the batch-only base: no corpus or smaller-batch partner
    assert statuses[105] == "kept"
    # 106 is near 105 ONLY — a batch partner with a smaller id
    assert statuses[106] == "near_batch"


def test_novel_doc_kept(statuses):
    assert statuses[107] == "kept"
