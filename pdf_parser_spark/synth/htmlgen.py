"""Deterministic boilerplate-HTML page generator (FIXTURES.md §3).

Pages carry nav/header/footer link farms, a sidebar, inline script and
style blocks, nested tables, and a main-content region of known
paragraphs. Golden main text is computed HERE (the paragraphs the
generator placed, joined by '\\n') — independent of ``htmlcore``.

Main paragraphs are written pre-collapsed (single spaces, >= 5 words,
no links) so they are invariant under the extractor's whitespace
normalization; boilerplate blocks are either inside
nav/header/footer/aside, link-dense, or too short.
"""

from __future__ import annotations

from typing import List, Tuple

_WORDS = (
    "data systems scale spark parquet shuffle partition broadcast column "
    "vector batch arrow stream window join filter predicate pushdown codegen "
    "catalyst tungsten executor driver cluster memory spill skew salt hash"
).split()


def _sentence(seed: int, n_words: int) -> str:
    ws = [_WORDS[(seed * 31 + k * 17) % len(_WORDS)] for k in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def make_html_page(i: int) -> Tuple[bytes, str]:
    """Build HTML page #i. Returns (html_bytes, golden_main_text)."""
    n_paras = 2 + (i % 4)
    paras: List[str] = [_sentence(i * 7 + p, 8 + ((i + p) % 12)) for p in range(n_paras)]
    pure_boilerplate = i % 17 == 0  # one page with no main content at all

    nav_links = "".join(
        f'<li><a href="/cat/{k}">category {k} link</a></li>' for k in range(6)
    )
    sidebar_links = "".join(
        f'<a href="/tag/{k}">tag{k}</a> ' for k in range(8)
    )
    rows = "".join(
        f"<tr><td>k{r}</td><td><a href='/r/{r}'>row link {r}</a></td></tr>"
        for r in range(3)
    )
    main_html = (
        ""
        if pure_boilerplate
        else "".join(f"<p>{p}</p>\n" for p in paras)
    )
    html = f"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Page {i} — synthetic corpus</title>
<style>body {{ font-family: sans-serif; }} .x{{color:#333}}</style>
<script>var page={i}; function track() {{ console.log("<p>not text</p>"); }}</script>
</head>
<body>
<header><h1><a href="/">Site {i % 13} Home</a></h1>
<nav><ul>{nav_links}</ul></nav>
</header>
<aside class="sidebar">{sidebar_links}<p>short ad</p></aside>
<main>
<article>
{main_html}<table>{rows}</table>
</article>
</main>
<footer>
<p><a href="/about">about</a> | <a href="/terms">terms</a> | <a href="/privacy">privacy</a></p>
<p>copyright {2000 + i % 26} example corp</p>
</footer>
<noscript><p>enable javascript for the full experience please</p></noscript>
</body>
</html>"""
    golden = "" if pure_boilerplate else "\n".join(paras)
    return html.encode("utf-8"), golden
