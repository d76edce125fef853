"""HTML main-content extraction (boilerplate stripping), Spark-free.

Text-density / link-density block scoring in the style of the public
Boilerpipe (Kohlschütter et al., WSDM 2010) and JusText algorithms —
the webtext half of the north rule. No reference counterpart exists in
``/root/reference`` (it parses PDFs only); parameters are ours and are
frozen by golden fixtures.
"""

from .extract import extract_main_text, MIN_WORDS, MAX_LINK_DENSITY  # noqa: F401
