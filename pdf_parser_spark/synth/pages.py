"""Build the ``pages(url, warc_ts, html, text, lang)`` input table.

Deterministic (index-keyed, no RNG state) synthesis of the
Common-Crawl-style table named by ``BASELINE.json``'s ``input_hint``:

- 60% quote-PDF documents (5 structural variants, see pdfgen),
- 35% boilerplate HTML pages,
- 5% corrupt/truncated byte blobs (failure-path fixtures),
- 1 in 1000 rows oversized (~100x pages) to exercise skew salting.

``text`` is the GOLDEN expected extraction output, computed by the
generator independently of the parser.
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, Iterator, List

from .htmlgen import make_html_page
from .pdfgen import PdfBuilder, make_quote_pdf, quote_metadata_string

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)
LANGS = ["en", "de", "fr", "es", "zz"]


def make_oversized_pdf(i: int) -> tuple:
    """A ~100-page PDF: the skew fixture (FIXTURES.md §1)."""
    b = PdfBuilder(compress=True)
    for p in range(100):
        pg = b.new_page()
        pg.text(72, 720, f"Jumbo document {i} page {p}")
        for ln in range(30):
            pg.text(72, 700 - 20 * ln, f"Line {ln} of page {p} in doc {i} with filler text")
    b.pages[0].white_text(quote_metadata_string(i))
    return b.build(), b.golden_doc_text(), b.golden_whitetext(0)


def row_kind(i: int) -> str:
    if i % 1000 == 999:
        return "jumbo"
    m = i % 20
    if m < 12:
        return "pdf"
    if m < 19:
        return "html"
    return "corrupt"


def build_pages_rows(n: int, start: int = 0) -> Iterator[Dict]:
    """Yield page rows [start, start+n). Content type cycles by index."""
    for i in range(start, start + n):
        kind = row_kind(i)
        if kind == "jumbo":
            blob, text, _ = make_oversized_pdf(i)
        elif kind == "pdf":
            blob, text, _ = make_quote_pdf(i)
        elif kind == "html":
            blob, text = make_html_page(i)
        else:  # corrupt: a truncated PDF prefix
            whole, _, _ = make_quote_pdf(i)
            blob, text = whole[: 120 + i % 300], ""
        yield {
            "url": f"https://example{i % 97}.test/doc/{i}",
            "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
            "html": blob,
            "text": text,
            "lang": LANGS[i % len(LANGS)],
        }


def write_pages_parquet(path: str, n: int, rows_per_group: int = 2000, start: int = 0) -> None:
    """Write the pages table to parquet with pyarrow (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    buf: List[Dict] = []
    try:
        for row in build_pages_rows(n, start=start):
            buf.append(row)
            if len(buf) >= rows_per_group:
                writer.write_table(pa.Table.from_pylist(buf, schema=schema))
                buf = []
        if buf:
            writer.write_table(pa.Table.from_pylist(buf, schema=schema))
    finally:
        writer.close()
