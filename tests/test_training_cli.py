"""E2E: the training-ops CLI entry point, in the process layout a
deployment uses (fresh interpreter per invocation), with the
--materializer flag selecting the durable path — result-identical to
the localCheckpoint default (the library-level equality lives in
tests/test_materializer.py; this pins the OPERATIONAL wiring the
round-4 verdict flagged as missing)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(*argv: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "access_log_aggregator_spark.training_cli",
         "--master", "local[4]", *argv],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.splitlines()[-1])


def _rows(path: str) -> list[tuple]:
    con = duckdb.connect()
    return con.sql(
        f"select * from read_parquet('{path}/*.parquet') order by all"
    ).fetchall()


def test_materializer_flag_is_result_identical_and_durable(tmp_path):
    local_out = str(tmp_path / "local")
    table_out = str(tmp_path / "table")
    mat_dir = str(tmp_path / "mat")

    d1 = _run("minhash-pairs", "--documents", DOCS, "--out", local_out)
    d2 = _run("minhash-pairs", "--documents", DOCS, "--out", table_out,
              "--materializer", f"table:{mat_dir}")
    assert d1["rows"] == d2["rows"] > 0
    assert _rows(local_out) == _rows(table_out)

    # table:DIR keeps the scratch tables: the signature/band SnapshotTables
    # exist with committed manifests (the reuse-across-runs story)
    manifests = list(Path(mat_dir).rglob("manifest.json"))
    assert manifests, "durable materializer wrote no tables"
    names = {p.parent.name for p in manifests}
    assert any("minhash_signatures" in n for n in names), names


def test_bare_table_mode_cleans_up_scratch(tmp_path):
    out = str(tmp_path / "out")
    d = _run("tfidf", "--documents", DOCS, "--out", out,
             "--materializer", "table")
    assert d["rows"] > 0
    # scratch tables (sibling <out>_materialized — INSIDE --out they would
    # be deleted by the overwrite write while the plan still reads them)
    # are removed after the write
    assert not list(Path(out + "_materialized").rglob("manifest.json"))
    # the output itself is intact
    assert len(_rows(out)) == d["rows"]


def test_bad_materializer_mode_fails_fast(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "access_log_aggregator_spark.training_cli",
         "tfidf", "--documents", DOCS, "--out", str(tmp_path / "x"),
         "--materializer", "s3"],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert out.returncode == 2
    assert "--materializer must be" in out.stderr


def test_empty_table_dir_fails_fast(tmp_path):
    """'table:' (empty DIR) would hand TableMaterializer('') = Path('.')
    and scatter scratch tables into the CWD (review) — it must die at
    argparse time like any other bad mode."""
    out = subprocess.run(
        [sys.executable, "-m", "access_log_aggregator_spark.training_cli",
         "tfidf", "--documents", DOCS, "--out", str(tmp_path / "x"),
         "--materializer", "table:"],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert out.returncode == 2
    assert "needs a directory" in out.stderr
