"""htmlcore boilerplate-strip tests: generator goldens vs extractor."""

import pytest

from pdf_parser_spark.htmlcore import extract_main_text
from pdf_parser_spark.synth.htmlgen import make_html_page


@pytest.mark.parametrize("i", list(range(25)))
def test_html_byte_identical_main_text(i):
    html, golden = make_html_page(i)
    text, spans = extract_main_text(html.decode("utf-8"))
    assert text == golden


def test_spans_reconstruct_text():
    html, golden = make_html_page(3)
    text, spans = extract_main_text(html.decode("utf-8"))
    parts = [text[s:e] for s, e in spans]
    assert "\n".join(parts) == text
    assert all(text[s:e].strip() == text[s:e] for s, e in spans)


def test_pure_boilerplate_page_empty():
    html, golden = make_html_page(17)  # i % 17 == 0 → no main content
    assert golden == ""
    text, spans = extract_main_text(html.decode("utf-8"))
    assert text == "" and spans == []


def test_script_style_comment_stripped():
    text, _ = extract_main_text(
        "<html><body><script>var x = '<p>fake paragraph here today now</p>';"
        "</script><style>p{color:red}</style><!-- <p>ghost comment text here</p> -->"
        "<p>real visible paragraph with enough words to keep</p></body></html>"
    )
    assert text == "real visible paragraph with enough words to keep"


def test_link_density_drops_linkfarm():
    text, _ = extract_main_text(
        "<div><a href='/a'>one link</a> <a href='/b'>two link</a> "
        "<a href='/c'>three link</a> <a href='/d'>four link</a></div>"
        "<p>surviving paragraph of ordinary prose with many plain words</p>"
    )
    assert text == "surviving paragraph of ordinary prose with many plain words"


def test_entity_decoding():
    text, _ = extract_main_text(
        "<p>Tom &amp; Jerry say &quot;hello&quot; &#8212; twice &#x41;gain today</p>"
    )
    assert text == 'Tom & Jerry say "hello" — twice Again today'


def test_nav_header_footer_dropped_even_with_long_text():
    text, _ = extract_main_text(
        "<nav><p>this navigation paragraph is long enough to pass the word "
        "count filter easily but must still be dropped</p></nav>"
        "<p>kept main body paragraph with sufficient number of words</p>"
        "<footer><p>footer paragraph also long enough to pass word count "
        "but excluded by ancestry</p></footer>"
    )
    assert text == "kept main body paragraph with sufficient number of words"
