"""HTML → text extraction with the byte-identical invariant.

The flagship input table carries both ``html: binary`` and ``text:
large_string`` (BASELINE.json input_hint). When ``text`` is null the extractor
must reproduce it byte-identically from ``html`` — the engine analogue of the
reference's length-preserving control-char scrub
(``lib/inception_preprocessing/retokenization.py:107-141``, which asserts
``len(text) == len(text_clean)``).

The synthetic corpus wraps article text as
``<html><head><title>…</title></head><body><p>…</p>…</body></html>`` with
HTML-escaped payload and ``</p><p>`` as the paragraph separator standing for
``"\\n"`` (sources/pages.py). ``extract_text`` inverts that wrapping exactly.
"""

from __future__ import annotations

import html as _htmlmod
import re

_BODY_RE = re.compile(rb"<body>(.*)</body>", re.S)
_TAG_P_SEP_RE = re.compile(r"</p><p>")
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html: bytes | None) -> str | None:
    """Extract article text from an HTML payload, byte-identically.

    Returns ``None`` when ``html`` is None or has no body.
    """
    if html is None:
        return None
    m = _BODY_RE.search(html)
    if m is None:
        return None
    body = m.group(1).decode("utf-8")
    body = _TAG_P_SEP_RE.sub("\n", body)
    body = _TAG_RE.sub("", body)
    return _htmlmod.unescape(body)


def wrap_html(text: str, title: str = "") -> bytes:
    """Inverse of :func:`extract_text` — used by the synthetic page generator."""
    paras = _htmlmod.escape(text, quote=False).split("\n")
    body = "<p>" + "</p><p>".join(paras) + "</p>"
    return (
        f"<html><head><title>{_htmlmod.escape(title, quote=False)}</title></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")
