"""Checkpoint-resume manifests.

The job processes the input in conv_id bucket groups; each completed group
writes a JSON manifest (atomically: tmp file + rename) recording its
per-sink row counts and per-partition lineage. On restart the job skips
every group whose manifest exists — giving idempotent, resumable writes
without a transactional table format. At cluster scale the same manifest
sits next to Iceberg snapshot metadata; here it is a plain directory.
"""

from __future__ import annotations

import json
import os
import tempfile


def manifest_path(output_dir: str, group: int) -> str:
    return os.path.join(output_dir, "_manifests", f"group-{group:04d}.json")


def is_done(output_dir: str, group: int) -> bool:
    return os.path.exists(manifest_path(output_dir, group))


def write_manifest(output_dir: str, group: int, payload: dict) -> str:
    path = manifest_path(output_dir, group)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX
    return path


def read_manifest(output_dir: str, group: int) -> dict:
    with open(manifest_path(output_dir, group)) as f:
        return json.load(f)


def completed_groups(output_dir: str) -> list[int]:
    d = os.path.join(output_dir, "_manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("group-") and name.endswith(".json"):
            out.append(int(name[len("group-") : -len(".json")]))
    return sorted(out)
