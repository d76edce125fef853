"""The spark-submit entrypoint end to end: args → session → one-pass
audit-committed extraction → resumable second run → bench JSON line."""

from __future__ import annotations

import json
import os


def test_job_main_runs_and_resumes(tmp_path, capsys):
    from pdf_parser_spark.job import main
    from pdf_parser_spark.synth.pages import write_pages_parquet

    in_dir = tmp_path / "pages"
    in_dir.mkdir()
    write_pages_parquet(str(in_dir / "p1.parquet"), 60)
    out = str(tmp_path / "out")

    rc = main([
        "--input", str(in_dir), "--output", out, "--run-id", "t1",
        "--buckets", "4", "--local", "4", "--bench",
    ])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["metric"] == "extraction_docs_per_sec"
    assert payload["docs"] == 60
    assert payload["result"]["processed"] == [0, 1, 2, 3]
    assert os.path.isdir(os.path.join(out, "extracted"))
    assert os.path.isdir(os.path.join(out, "audit"))

    # second invocation resumes: everything committed, nothing reruns
    rc2 = main([
        "--input", str(in_dir), "--output", out, "--run-id", "t2",
        "--buckets", "4", "--local", "4", "--bench",
    ])
    assert rc2 == 0
    line2 = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    payload2 = json.loads(line2)
    assert payload2["result"]["processed"] == []
    assert payload2["result"]["skipped"] == [0, 1, 2, 3]
