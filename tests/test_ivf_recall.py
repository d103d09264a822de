"""Multi-probe IVF recall on CLUSTERED data — the operator's contract.

The driver's embeddings table is near-uniform on the sphere (max pairwise
cosine ≈ 0.5), so IVF recall there sits at the scan-fraction floor
≈ n_probes/K regardless of implementation (measured series recorded in
q_ann_ivf_recall's docstring / BENCH). The IVF contract — recall ≥ 0.9 at
n_probes=2 — applies when the IVF *assumption* holds: vectors cluster and
pivots approximate centroids. This suite builds that corpus
deterministically:

- 7 well-separated unit centers (seeded RNG), placed at the fixed
  PIVOT_IDS rows so the operator's pivots ARE the centroids;
- 500 members = center + small noise, spread round-robin over clusters;
- the query (vec_id=0) is a BOUNDARY point: normalize(c0 + c1), with its
  true top-10 straddling clusters 0 and 1.

Single-probe must visibly miss the off-cell half (recall < 0.9) and
two-probe must recover it (recall ≥ 0.9) — the exact degradation/repair
pair the multi-probe design exists for (simsearch.py: ann_ivf_topk).
"""

from __future__ import annotations

import numpy as np
import pytest

from elb_pipeline.simsearch import EMB_DIM, PIVOT_IDS, TOPK, ann_ivf_topk


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(20260817)
    k = len(PIVOT_IDS)
    centers = np.stack([_unit(rng.normal(size=EMB_DIM)) for _ in range(k)])
    n = 500
    rows = []
    member_cluster = {}
    for vid in range(n):
        if vid in PIVOT_IDS:
            vec = centers[PIVOT_IDS.index(vid)]
        elif vid == 0:
            vec = _unit(centers[0] + centers[1])  # boundary query
        else:
            c = vid % k
            member_cluster[vid] = c
            # per-dim noise 0.05 → noise NORM ≈ 0.05·√64 = 0.4, member
            # cosine to its center ≈ 0.93 — tight clusters (0.25/dim
            # gives noise norm 2.0: clusters dissolve into the sphere)
            vec = _unit(centers[c] + 0.05 * rng.normal(size=EMB_DIM))
        rows.append((vid, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    vecs = np.array([r[1] for r in rows])
    return df, vecs


def _exact_topk(vecs: np.ndarray, qid: int = 0) -> set[int]:
    q = vecs[qid]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = [
        i for i in np.argsort(-cos, kind="stable") if i != qid
    ]  # ties broken by index like the query's (cos DESC, vec_id)
    return set(int(i) for i in order[:TOPK])


def _ivf_topk(df, n_probes: int) -> set[int]:
    return {
        r["vec_id"] for r in ann_ivf_topk(df, n_probes=n_probes).collect()
    }


def test_boundary_query_straddles_two_cells(clustered):
    _, vecs = clustered
    exact = _exact_topk(vecs)
    k = len(PIVOT_IDS)
    cells = {i % k for i in exact if i not in PIVOT_IDS}
    assert len(cells) >= 2, "fixture must place true neighbors in >1 cell"


def test_single_probe_misses_boundary_neighbors(clustered):
    df, vecs = clustered
    exact = _exact_topk(vecs)
    overlap = len(exact & _ivf_topk(df, n_probes=1))
    assert overlap / TOPK < 0.9, (
        f"single probe recalled {overlap}/{TOPK} — fixture no longer "
        "exercises the cell-boundary miss the multi-probe design targets"
    )


def test_two_probes_meet_recall_gate(clustered):
    df, vecs = clustered
    exact = _exact_topk(vecs)
    overlap = len(exact & _ivf_topk(df, n_probes=2))
    assert overlap / TOPK >= 0.9, f"2-probe recall {overlap}/{TOPK} < 0.9"
