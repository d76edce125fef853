"""The spark-submit entrypoint end to end, in a SUBPROCESS (job.main
stops its SparkSession — running it in-process would kill the suite's
shared session fixture): args → session → one-pass audit-committed
extraction → resumable second run → bench JSON line."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args):
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_parser_spark.job", *args],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_job_main_runs_and_resumes(tmp_path):
    from pdf_parser_spark.synth.pages import write_pages_parquet

    in_dir = tmp_path / "pages"
    in_dir.mkdir()
    write_pages_parquet(str(in_dir / "p1.parquet"), 60)
    out = str(tmp_path / "out")
    base = ["--input", str(in_dir), "--output", out,
            "--buckets", "4", "--local", "4", "--bench"]

    payload = _run_job(["--run-id", "t1", *base])
    assert payload["metric"] == "extraction_docs_per_sec"
    assert payload["docs"] == 60
    assert payload["result"]["processed"] == [0, 1, 2, 3]
    assert os.path.isdir(os.path.join(out, "extracted"))
    assert os.path.isdir(os.path.join(out, "audit"))

    # second invocation resumes: everything committed, nothing reruns
    payload2 = _run_job(["--run-id", "t2", *base])
    assert payload2["result"]["processed"] == []
    assert payload2["result"]["skipped"] == [0, 1, 2, 3]
