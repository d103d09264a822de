"""A/B micro-bench for the sketch kernels (VERDICT r4 #4 done-criterion).

Times the round-4 kernels (factorize + per-UNIQUE-shingle hashlib loop)
against the round-5 kernels (Arrow dictionary-encode + numpy-batched MD5,
elb_pipeline/md5vec.py) on 20k real-shape documents — the same protocol
as the round-4 table in BENCH/BASELINE.md §"Sketch kernels" (sf0.1
documents replicated to 20k, single process, warm, best of N).

Both variants are run IN THIS PROCESS so the comparison is
noise-interleaved; parity between them is asserted on the fly (the new
kernels must be bit-identical, which tests/test_properties.py and
tests/test_md5vec.py also pin against hashlib and the DuckDB oracle).

Usage: python BENCH/kernel_bench.py [rounds]   (default 3)
Emits one compact JSON line + writes BENCH/kernel_bench_r5.json.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from elb_pipeline.dedup import (  # noqa: E402
    N_SIGS,
    _flatten_counts,
    _minhash_batch,
    _seg_starts,
    _simhash32_batch,
)


def _shingle_words(t: str) -> list:
    """Python twin of dedup._shingles() (word-3-grams, empty under 3 words)."""
    if not isinstance(t, str):
        return []
    ws = t.split(" ")
    if len(ws) < 3:
        return []
    return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]

N_DOCS = 20_000


def _load_docs() -> pd.Series:
    import duckdb

    base = duckdb.sql(
        "select text from '/root/testdata/sf0.1/documents.parquet'"
    ).df()["text"]
    reps = -(-N_DOCS // len(base))
    return pd.concat([base] * reps, ignore_index=True).iloc[:N_DOCS]


# ---- round-4 kernels, reconstructed verbatim shape (per-unique hashlib,
# cumsum-diff votes) so the A/B runs old-vs-new in one process ----------


def minhash_r4(sh: pd.Series) -> pd.Series:
    lists = list(sh)
    flat, cnt = _flatten_counts(lists)
    out: list = [None] * len(lists)
    if not flat:
        return pd.Series(out)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    n_u = len(uniques)
    seeds = [f"#{i}".encode() for i in range(N_SIGS)]
    hexes = np.empty((N_SIGS, n_u), dtype="S32")
    for u_idx, u in enumerate(uniques):
        base = hashlib.md5(u.encode())
        for i, seed in enumerate(seeds):
            h = base.copy()
            h.update(seed)
            hexes[i, u_idx] = h.hexdigest()
    starts = _seg_starts(cnt)
    ne_rows = np.flatnonzero(cnt > 0)
    mins_per_seed = []
    for i in range(N_SIGS):
        arr = hexes[i]
        order = np.argsort(arr, kind="stable")
        ranks = np.empty(n_u, dtype=np.int64)
        ranks[order] = np.arange(n_u)
        min_ranks = np.minimum.reduceat(ranks[codes], starts)
        mins_per_seed.append(arr[order[min_ranks]])
    for pos, row in enumerate(ne_rows):
        out[row] = [mins_per_seed[i][pos].decode() for i in range(N_SIGS)]
    return pd.Series(out)


def simhash_r4(text: pd.Series) -> pd.Series:
    n_rows = len(text)
    lists: list = [None] * n_rows
    for j, t in enumerate(text):
        lists[j] = _shingle_words(t) if t else []
    flat, cnt = _flatten_counts(lists)
    out = np.zeros(n_rows, dtype=np.int64)
    if not flat:
        return pd.Series(out)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    bits_u = np.empty((len(uniques), 32), dtype=np.uint8)
    for u_idx, u in enumerate(uniques):
        b = np.frombuffer(hashlib.md5(u.encode()).digest(), dtype=np.uint8)
        bits_u[u_idx, 0::2] = (b >> 7) & 1
        bits_u[u_idx, 1::2] = (b >> 3) & 1
    ne = cnt[cnt > 0]
    csum = np.cumsum(bits_u[codes], axis=0, dtype=np.int64)
    ends = np.cumsum(ne) - 1
    counts = csum[ends]
    counts[1:] -= csum[ends[:-1]]
    weights = np.int64(1) << np.arange(32, dtype=np.int64)
    vals = ((2 * counts > ne[:, None]) * weights).sum(axis=1)
    out[np.flatnonzero(cnt > 0)] = vals
    return pd.Series(out)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    docs = _load_docs()
    shingles = pd.Series([_shingle_words(t) if t else [] for t in docs])

    variants = {
        "minhash_r4": lambda: minhash_r4(shingles),
        "minhash_r5": lambda: _minhash_batch(shingles),
        "simhash_r4": lambda: simhash_r4(docs),
        "simhash_r5": lambda: _simhash32_batch(docs),
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    results: dict[str, object] = {}
    for fn in variants.values():  # warm numba-free caches / allocators
        pass
    for _ in range(rounds):
        for name, fn in variants.items():  # interleaved
            t0 = time.perf_counter()
            res = fn()
            walls[name].append(time.perf_counter() - t0)
            results[name] = res
    assert list(results["minhash_r4"]) == list(results["minhash_r5"])
    assert results["simhash_r4"].tolist() == results["simhash_r5"].tolist()

    best = {k: min(v) for k, v in walls.items()}
    summary = {
        "metric": "kernel_bench_r5",
        "n_docs": N_DOCS,
        "rounds": rounds,
        "best_sec": {k: round(v, 4) for k, v in best.items()},
        "speedup": {
            "minhash": round(best["minhash_r4"] / best["minhash_r5"], 2),
            "simhash": round(best["simhash_r4"] / best["simhash_r5"], 2),
        },
        "walls": {k: [round(x, 4) for x in v] for k, v in walls.items()},
        "parity": "bit-identical (asserted)",
    }
    with open("BENCH/kernel_bench_r5.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
