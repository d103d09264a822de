"""spark-submit --py-files integration: the north rule's submission shape.

Packages elb_pipeline into a zip, submits run_pipeline.py with
``spark-submit --py-files`` in a clean subprocess (tiny synthesized input),
and checks the job's JSON result — proving the repo runs as a submitted
application, not only as an embedded library.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


@pytest.mark.slow
def test_spark_submit_py_files_runs_job(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")

    zip_path = str(tmp_path / "elb_pipeline.zip")
    pkg = os.path.join(REPO, "elb_pipeline")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "job_out")
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY way to import
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "run_pipeline.py"),
            "--synth-rows", "20000",
            "--groups", "2",
            "--output", out_dir,
            "--ndjson-ordered",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root — no accidental cwd imports
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    counts = payload["sink_counts"]
    assert sum(counts.values()) == 20000
    assert set(counts) == {"alb", "classic_lb", "malformed"}
    assert all(v > 0 for v in counts.values())
    assert os.path.isdir(payload["ndjson_ordered"])
