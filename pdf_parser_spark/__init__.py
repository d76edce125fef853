"""pdf_parser_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the capabilities of the reference repo
(``colossusofNero/pdf-parser``) Spark-first:

- ``pdfcore``   : from-scratch PDF parser (xref walk, COS tokenizer,
                  FlateDecode/LZW, content-stream text interpretation,
                  ToUnicode CMaps) — pure Python, Spark-free, invoked
                  from vectorized Arrow UDFs only.
- ``htmlcore``  : HTML boilerplate stripping via text/link-density
                  heuristics.
- ``synth``     : deterministic synthetic corpus generator for the
                  ``pages(url, warc_ts, html, text, lang)`` input table.
- ``extract``   : the mapInPandas extraction stage.
- ``fields``    : native-Spark white-text record extraction + formatters.
- ``validate``  : required/format validators as native expressions.
- ``pricing``   : quote pricing engine (broadcast dims + expressions).
- ``depreciation``: MACRS depreciation engine (grid + window functions).
- ``textops``   : dedup / language-id / quality / token counting.
- ``simsearch`` : similarity search over embedding columns.
- ``audit``     : per-partition lineage, metrics, checkpoint/resume.
"""

__version__ = "0.1.0"
