"""dist/pdf_parser_spark.zip must track the source tree byte-for-byte.

A stale --py-files artifact is the worst kind of skew: executors launched
via spark-submit run OLD code while the driver and oracle run new code
(round-3 ADVICE found exactly this — the zip predated the ObjStm pdfgen
changes). This test fails whenever the zip and the source diverge; the fix
is always `python scripts/make_pyfiles.py` and committing the rebuilt zip.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "dist", "pdf_parser_spark.zip")
PKG = os.path.join(ROOT, "pdf_parser_spark")


def _source_files() -> dict:
    out = {}
    for dirpath, _d, filenames in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, ROOT)] = f.read()
    return out


def test_pyfiles_zip_matches_source_tree():
    assert os.path.exists(ZIP), "dist/pdf_parser_spark.zip missing — run scripts/make_pyfiles.py"
    src = _source_files()
    with zipfile.ZipFile(ZIP) as z:
        names = [n for n in z.namelist() if not n.endswith("/")]
        zipped = {n: z.read(n) for n in names}
    missing = sorted(set(src) - set(zipped))
    extra = sorted(set(zipped) - set(src))
    assert not missing, f"zip is missing source files (rebuild): {missing[:5]}"
    assert not extra, f"zip has files absent from source (rebuild): {extra[:5]}"
    stale = sorted(n for n in src if src[n] != zipped[n])
    assert not stale, f"zip content stale vs source (rebuild): {stale[:5]}"
