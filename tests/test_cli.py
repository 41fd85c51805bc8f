"""CLI surface test: spark-submit-style invocation in a subprocess
(fresh JVM, no shared session), run + resume."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args):
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "distributed_system___ocr_spark.cli", *args],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_run_and_resume(tmp_path):
    out_dir = str(tmp_path / "out")
    report = str(tmp_path / "report.html")
    info1 = _run_cli(
        "--synthetic", "300", "--output", out_dir, "--run-id", "c1",
        "--report", report, "--seed", "7",
    )
    assert info1["n_extracted_this_run"] > 250
    assert os.path.exists(report)
    with open(report) as f:
        html = f.read()
    assert html.startswith("<html>\n<title>OCR</title>")

    info2 = _run_cli(
        "--synthetic", "300", "--output", out_dir, "--run-id", "c2",
        "--no-manifest", "--seed", "7",
    )
    assert info2["n_extracted_this_run"] == 0  # full resume, zero re-done


def test_cli_report_without_manifest_fails_fast(tmp_path):
    """--report needs the manifest; the combination must be rejected in
    arg validation, BEFORE the pipeline spends a whole run."""
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "distributed_system___ocr_spark.cli",
         "--synthetic", "10", "--output", str(tmp_path / "o"),
         "--run-id", "x", "--report", str(tmp_path / "r.html"),
         "--no-manifest"],
        capture_output=True, text=True, timeout=60, env=env, cwd="/tmp",
    )
    assert out.returncode == 2  # argparse error exit, no Spark startup
    assert "--no-manifest" in out.stderr
