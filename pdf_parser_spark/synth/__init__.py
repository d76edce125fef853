"""Deterministic synthetic corpus generation (seeded, no external data).

Builds the ``pages(url, warc_ts, html, text, lang)`` input table of
``BASELINE.json``'s ``input_hint`` at any scale: quote-style PDFs with
hidden white-text metadata rows (FIXTURES.md §2), boilerplate HTML
pages (§3), and corrupt-byte failure fixtures. The generator computes
golden extracted text independently of the parser, so byte-identical
comparison is a real test.
"""

from .pdfgen import PdfBuilder, make_quote_pdf  # noqa: F401
from .htmlgen import make_html_page  # noqa: F401
from .pages import build_pages_rows, write_pages_parquet  # noqa: F401
