"""sitemap.xml parsing — the url-discovery face of the crawl pipeline.

Subset of the sitemaps.org protocol that corpus pipelines consume:

- ``<url>`` blocks inside a ``<urlset>``: the first ``<loc>`` (required)
  and optional ``<lastmod>`` of each block, in document order;
- XML entities in loc/lastmod are decoded once (``&amp;`` → ``&``) —
  sitemap locs are XML-escaped by spec;
- whitespace inside loc/lastmod is trimmed;
- malformed blocks (no loc, empty loc) are skipped, never raised on;
- ``<sitemapindex>`` child sitemaps are NOT followed (no I/O in a
  parser); their locs are returned with ``is_index=True`` so a frontier
  job can enqueue them.

Deterministic pure Python, regex-based (the same no-DOM stance as the
HTML tokenizer — sitemap XML in the wild is as malformed as HTML).
The Spark operator parses one sitemap per HOST (host-cardinality input,
negligible next to the page corpus) — see battery_ml.map1_sitemap_urls.
"""

from __future__ import annotations

import re
from html import unescape

_URL_BLOCK_RE = re.compile(r"<url\b[^>]*>(.*?)</url\s*>", re.IGNORECASE | re.DOTALL)
_SMAP_BLOCK_RE = re.compile(
    r"<sitemap\b[^>]*>(.*?)</sitemap\s*>", re.IGNORECASE | re.DOTALL
)
_LOC_RE = re.compile(r"<loc\b[^>]*>(.*?)</loc\s*>", re.IGNORECASE | re.DOTALL)
_LASTMOD_RE = re.compile(
    r"<lastmod\b[^>]*>(.*?)</lastmod\s*>", re.IGNORECASE | re.DOTALL
)


def parse_sitemap(text: str | None) -> list[tuple[str, str | None, bool]]:
    """[(loc, lastmod | None, is_index)] in document order."""
    out: list[tuple[str, str | None, bool]] = []
    if not text:
        return out
    for block_re, is_index in ((_URL_BLOCK_RE, False), (_SMAP_BLOCK_RE, True)):
        for block in block_re.findall(text):
            lm = _LOC_RE.search(block)
            if not lm:
                continue
            loc = unescape(lm.group(1)).strip()
            if not loc:
                continue
            mm = _LASTMOD_RE.search(block)
            lastmod = unescape(mm.group(1)).strip() if mm else None
            out.append((loc, lastmod or None, is_index))
    return out
