"""HTML → text extraction kernel.

The north rule requires *byte-identical* extracted text per url versus the
``text`` column of the pages table (BASELINE.json input_hint).  The extractor
implements a readability-style main-content contract:

* main content lives inside the first ``<article>…</article>`` element;
* ``<script>``/``<style>`` blocks anywhere are dropped wholesale;
* each ``<p>…</p>`` inside the article yields one text line; lines join with
  ``"\\n"``;
* inline markup (``<b>``, ``<i>``, ``<a …>``, ``<span …>``) is stripped;
* character entities are HTML-unescaped.

Pure function over one document; the Ray stage maps it over Arrow batches
(string ops dominate; the regexes are compiled once at import).  The inverse
(``promptner_ray.synth.render_html``) encodes text into this shape, which is
what makes byte-identity well-defined and testable.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.DOTALL | re.IGNORECASE)
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html: bytes | str) -> str:
    """Extract the main text from an HTML page (byte-identity contract)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    html = _SCRIPT_STYLE_RE.sub("", html)
    m = _ARTICLE_RE.search(html)
    if m is None:
        return ""
    body = m.group(1)
    lines = []
    for pm in _P_RE.finditer(body):
        content = _TAG_RE.sub("", pm.group(1))
        lines.append(_html.unescape(content))
    return "\n".join(lines)
