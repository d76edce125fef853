"""From-scratch PDF parsing core (pure Python, Spark-free).

Reimplements — from the public PDF 1.7 specification (ISO 32000-1) —
the parsing pipeline the reference consumes through pdf.js
(``/root/reference/src/services/pdfParser/index.ts:23-41`` calls
``getDocument``/``getPage``/``getTextContent``):

- :mod:`.lexer`    — COS object tokenizer (numbers, names, strings,
                     dicts, arrays, keywords).
- :mod:`.filters`  — stream filters: FlateDecode (+PNG/TIFF
                     predictors), LZWDecode, ASCIIHex/ASCII85,
                     RunLength.
- :mod:`.xref`     — cross-reference table/stream walk, trailer chain,
                     object loader incl. object streams.
- :mod:`.cmap`     — ToUnicode CMap (bfchar/bfrange) and standard
                     encoding fallbacks (WinAnsi/Standard/MacRoman).
- :mod:`.content`  — content-stream text interpreter (BT/ET, Tf, Td,
                     TD, Tm, T*, TL, Tc, Tw, Tz, Tj, TJ, ', ") producing
                     positioned text runs with 6-tuple transforms.
- :mod:`.document` — document façade: bytes → pages → TextItems.

Designed to run inside Arrow-batched ``mapInPandas`` workers: no
global state, no I/O, exceptions carry machine-readable error codes.
"""

from .document import PdfDocument, PdfError, TextItem, parse_pdf  # noqa: F401
