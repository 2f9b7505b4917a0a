"""The spark-submit launch surface (north_rule: "launches via spark-submit
--py-files"). Runs the real `spark-submit` binary against the packaged zip —
this is what caught plans/profile.py shadowing the stdlib `profile` module
when the script dir lands at sys.path[0]."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path):
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "package.py")],
                   check=True, capture_output=True)
    out = tmp_path / "tiles_out"
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", os.path.join(REPO, "dist", "planetiler_spark.zip"),
         "-c", "spark.ui.enabled=false",
         os.path.join(REPO, "planetiler_spark", "plans", "pipeline.py"),
         "--n", "800", "--maxzoom", "5", "--cpus", "4", "--out", str(out)],
        capture_output=True, text=True, timeout=300, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads([ln for ln in proc.stdout.splitlines()
                          if ln.startswith("{")][-1])
    assert summary["n_images"] == 800
    assert summary["n_tiles"] > 0 and summary["n_features"] > 0
    assert (out / "tiles" / "_SUCCESS").exists()
