"""spark-submit --py-files packaging smoke (north rule execution surface)."""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(["bash", "scripts/package.sh"], cwd=REPO, check=True,
                   capture_output=True)
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", "dist/greenocr_spark.zip",
         "jobs/extract_job.py", "--fixture-pages", "300",
         "--output", str(tmp_path / "out"), "--n-parts", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows_out"] == 300
