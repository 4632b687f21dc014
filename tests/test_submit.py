"""The deployment surface: `spark-submit --py-files` (north_rule's launch
mode) runs the CLI end-to-end from a zipped package in a fresh JVM —
driver AND executor workers resolve the package from the archive."""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files(tmp_path):
    pkg_zip = shutil.make_archive(
        str(tmp_path / "alas"), "zip",
        root_dir=str(REPO), base_dir="access_log_aggregator_spark",
    )
    out = subprocess.run(
        [
            "/opt/spark/bin/spark-submit", "--master", "local[4]",
            "--py-files", pkg_zip,
            str(REPO / "access_log_aggregator_spark" / "cli.py"),
            "--generate", "600", "--snapshots", "2",
            "--data-dir", str(tmp_path / "data"), "--from-start",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"batches')]
    assert lines, out.stdout[-2000:]
    d = json.loads(lines[-1])
    assert d["rows_in"] == 600
    assert sum(d["sink_counts"].values()) == 600
    assert d["batches"] == 2
    # the reference-format summary table is printed after the JSON line
    assert "Access Log Summary" in out.stdout
