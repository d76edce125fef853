"""Property-based round-trip: ANY cp1252-encodable text placed by the
builder must come back byte-identical through the from-scratch parser,
across all structural variants (plain/Flate/xref-stream, Td/TD/T*/').

Extends the reference's example-based test strategy (SURVEY §5 notes it
has no property tests) — this is the generative form of the north
star's byte-identical contract. Spark-free: the parser core is pure
Python, so hypothesis can drive thousands of cases cheaply.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_parser_spark.pdfcore import parse_pdf
from pdf_parser_spark.synth.pdfgen import PdfBuilder

# cp1252-safe printable characters (no control chars; backslash, parens
# included on purpose — they exercise literal-string escaping)
_CP1252 = [
    chr(c)
    for c in list(range(0x20, 0x7F)) + list(range(0xA1, 0x100))
    if chr(c).encode("cp1252", errors="ignore")
]
text_line = st.text(alphabet=_CP1252, min_size=0, max_size=120)


@settings(max_examples=150, deadline=None)
@given(
    lines=st.lists(text_line, min_size=1, max_size=8),
    compress=st.booleans(),
    xref_stream=st.booleans(),
    style=st.sampled_from(["TD", "Tstar", "quote"]),
)
def test_text_roundtrip_byte_identical(lines, compress, xref_stream, style):
    b = PdfBuilder(compress=compress, xref_stream=xref_stream)
    pg = b.new_page()
    pg.text_lines(72, 720, lines, style=style)
    doc = parse_pdf(b.build())
    assert doc.num_pages == 1
    assert doc.pages[0].text() == "\n".join(lines)


@settings(max_examples=60, deadline=None)
@given(
    pages=st.lists(st.lists(text_line, min_size=1, max_size=3), min_size=1, max_size=4),
    compress=st.booleans(),
)
def test_multipage_roundtrip(pages, compress):
    b = PdfBuilder(compress=compress)
    for lines in pages:
        pg = b.new_page()
        for i, line in enumerate(lines):
            pg.text(72, 720 - 20 * i, line)
    doc = parse_pdf(b.build())
    assert doc.num_pages == len(pages)
    got = "\f".join(p.text() for p in doc.pages)
    want = "\f".join("\n".join(ls) for ls in pages)
    assert got == want


@settings(max_examples=80, deadline=None)
@given(meta=st.text(alphabet=_CP1252, min_size=0, max_size=200))
def test_whitetext_metadata_roundtrip(meta):
    """The invisible metadata row (transform[0]==0) survives verbatim
    and is separable from visible text by the white-text predicate."""
    b = PdfBuilder()
    pg = b.new_page()
    pg.text(72, 720, "Visible body text")
    pg.white_text(meta)
    doc = parse_pdf(b.build())
    wt = doc.pages[0].whitetext_metadata()
    assert wt == (meta if meta.strip() else "")
