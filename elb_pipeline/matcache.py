"""Deterministic parquet materialization for expensive intermediates.

``materialize(df, key)`` writes ``df`` once to a content-keyed /tmp
directory (atomic rename — concurrent first runs never observe a
half-written cache) and returns the read-back frame. This is the
100-TB shape for reused intermediates: a signature/sketch table is
computed ONCE, written as a real table, and every downstream join reads
the parquet — no lingering ``.persist()`` state in a long-lived session
(Spark's in-memory columnar cache also measured pathological on long
text columns; see BENCH/BASELINE.md).

``dir_fingerprint`` keys caches on the INPUT's identity (file names +
sizes + mtimes), so regenerated test data at the same path can never
serve a stale cache.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame

# Bump when the on-disk layout/meaning of cached frames changes in a way
# not captured by callers' params tuples.
MATCACHE_FORMAT_VERSION = "2"


def _cache_root() -> str:
    """Resolved per call so a harness can point ELB_MAT_CACHE at a fresh
    directory mid-process (bench.py does, to time queries cold). The
    default is per-user: a world-shared /tmp path would let one user's
    cache (or a planted directory) be served to another."""
    return os.environ.get("ELB_MAT_CACHE", f"/tmp/elb_mat_cache_{os.getuid()}")


def params_token(params: tuple) -> str:
    """Digest of the algorithm parameters/code a cached frame depends on.
    Folded into every cache key so changing a constant (band count,
    Jaccard threshold, …) or a kernel's source can never serve stale
    parquet from the previous version of the logic — the input-files
    fingerprint alone only protects against changed DATA, not changed
    CODE."""
    h = hashlib.md5(MATCACHE_FORMAT_VERSION.encode())
    for p in params:
        h.update(repr(p).encode())
    return h.hexdigest()[:10]


def dir_fingerprint(path: str) -> str:
    """md5 over (basename, size, mtime_ns) of a parquet file/directory."""
    h = hashlib.md5()
    entries = (
        [path]
        if os.path.isfile(path)
        else sorted(os.path.join(path, f) for f in os.listdir(path))
    )
    for f in entries:
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def cache_path(key: str, params: tuple = ()) -> str:
    """Cache directory a (key, params) pair materializes to."""
    return os.path.join(_cache_root(), f"{key}-v{params_token(params)}")


def lookup(spark, key: str, params: tuple = ()):
    """Return the cached frame for (key, params) if it is already
    materialized, else None. Lets EAGER builders (driver-side fixpoint
    loops like dedup.dup_groups) skip their whole computation on a cache
    hit — ``materialize`` alone only helps LAZY inputs, because the caller
    has already run its Spark jobs by the time materialize() checks the
    cache (measured: every dup-groups consumer re-ran label propagation
    from scratch, ~2-3 s per query at sf0.1)."""
    path = cache_path(key, params)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    return None


def materialize(df: DataFrame, key: str, params: tuple = ()) -> DataFrame:
    """Write ``df`` to the cache under ``key`` (first caller wins the
    atomic rename race) and return the parquet read-back. ``params`` is
    the tuple of algorithm constants / kernel source the frame's contents
    depend on — it is hashed into the directory name, so a logic change
    always misses the old cache instead of silently reusing it."""
    root = _cache_root()
    path = os.path.join(root, f"{key}-v{params_token(params)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:  # lost the race — the winner's copy is complete
            shutil.rmtree(tmp, ignore_errors=True)
    return df.sparkSession.read.parquet(path)
