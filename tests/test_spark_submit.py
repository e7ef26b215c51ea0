"""End-to-end `spark-submit --py-files` job test (north-rule launch mode).

Runs tools/submit_job.py exactly the way a cluster user would: the package
shipped as a zip via --py-files, the entry script COPIED to a scratch
directory outside the repo so every `ddsketchy_spark` import must resolve
from the shipped zip (not the checkout), output parsed from the job's JSON
lines and checked against exact NumPy quantiles within alpha.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALPHA = 0.01


def _exact_bounds(v: np.ndarray, q: float) -> tuple[float, float]:
    """Reference accuracy law (src/ddsketchy_test.rs:76-99): the estimate
    must lie in [(1-a)*lower, (1+a)*upper] with lower/upper the sorted
    values at floor/ceil of q*(n-1)."""
    s = np.sort(v)
    r = q * (len(s) - 1)
    return float(s[int(np.floor(r))]), float(s[int(np.ceil(r))])


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_grouped_job(tmp_path):
    from ddsketchy_spark.data.synth import write_token_table

    table = str(tmp_path / "tokens")
    write_token_table(table, 3000, seed=7, rows_per_file=1000)

    zip_path = str(tmp_path / "ddsketchy_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_job.py"),
         "--make-zip", zip_path],
        check=True, capture_output=True, text=True)
    assert os.path.getsize(zip_path) > 10_000

    # Copy the entry script out of the repo: its own sys.path fallback then
    # points at tmp, so the package import can only come from --py-files.
    entry = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), entry)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(entry),
         "--input", table, "--by", "source", "--quantiles", "0.5,0.99"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
        env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    assert rows and all(r["scope"] == "source" for r in rows)
    got = {r["source"]: r for r in rows}

    pdf = pq.read_table(table, columns=["n_tok", "source"]).to_pandas()
    assert len(got) == pdf["source"].nunique()
    for src, grp in pdf.groupby("source"):
        v = grp["n_tok"].to_numpy(dtype=np.float64)
        r = got[src]
        assert r["count"] == len(v)
        assert r["sum"] == pytest.approx(float(v.sum()))
        for qname, q in (("p50", 0.5), ("p99", 0.99)):
            lo, hi = _exact_bounds(v, q)
            assert (1 - ALPHA) * lo <= r[qname] <= (1 + ALPHA) * hi, (
                src, qname, r[qname], lo, hi)
