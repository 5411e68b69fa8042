"""Outlink extraction — the web-graph construction face of the pipeline.

`tokenize_blocks` deliberately discards tag attributes (its hot path is
the frozen byte-identity spec for TEXT), so link harvesting is its own
single pass over the same decoded markup: every <a href> of a page,
entity-decoded, resolved against the page url (RFC 3986 via urljoin) and
filtered to http(s). Deterministic pure Python — the Spark operator
(`operators/links.extract_links`) is a thin Arrow-batched wrapper, and
the edges feed the host-graph workloads (pr1 host rank, gr1 triangles,
crawl-frontier prioritization).

The reference repo has no web-graph stage; this is an engine addition in
the same class as the dedup/ANN battery (task brief: large-scale
training-data pipeline operations).
"""

from __future__ import annotations

import re
from html import unescape
from urllib.parse import urljoin

from greenocr_spark.extractor.core import decode_bytes

_PDF_MAGIC = b"%PDF-"  # same router predicate as functions/sqlfns.pdf_magic_expr

# href value of an <a> tag: double-quoted, single-quoted, or bare.
# The [^>]*? prefix keeps the scan inside the tag; DOTALL lets attribute
# lists span newlines (seen in pretty-printed markup).
_A_HREF_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")

# first <base href> of the page, same quoting forms as _A_HREF_RE
_BASE_HREF_RE = re.compile(
    r"<base\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_outlinks(raw, base_url: str | None = None) -> list[str]:
    """All unique http(s) outlinks of a page, in first-seen order.

    - bytes decode through the extractor's own decode_bytes (BOM → declared
      charset → utf-8 → latin-1), so charset quirks resolve identically to
      the text path;
    - entity-decoded once (``&amp;`` → ``&``), matching the text spec's
      single-pass decode;
    - relative hrefs resolve against base_url with urljoin (rooted,
      protocol-relative and path-relative forms all covered); without a
      base_url only absolute http(s) hrefs survive;
    - a declared <base href> overrides the page url per HTML semantics:
      the effective base is urljoin(base_url, first base href), so both
      absolute and relative base declarations resolve (ADVICE r04);
    - fragments-only, javascript:/mailto:/tel:/data: and empty hrefs drop;
    - PDF payloads have no markup → [] (the layout branch owns them).
    """
    if raw is None:
        return []
    if isinstance(raw, (bytes, bytearray, memoryview)):
        b = bytes(raw)
        if b[: len(_PDF_MAGIC)] == _PDF_MAGIC:
            return []
        s = decode_bytes(b)
    else:
        s = raw
    bm = _BASE_HREF_RE.search(s)
    if bm:
        declared = unescape(bm.group(1) or bm.group(2) or bm.group(3) or "").strip()
        if declared:
            base_url = urljoin(base_url, declared) if base_url else declared
    out: list[str] = []
    seen: set[str] = set()
    for m in _A_HREF_RE.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = unescape(href).strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        if base_url:
            url = urljoin(base_url, href)
        else:
            url = href
        if not url.lower().startswith(("http://", "https://")):
            continue
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out
