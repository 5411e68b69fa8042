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
        url = _resolve_href(m.group(1) or m.group(2) or m.group(3) or "", base_url)
        if url is None:
            continue
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out


# a whole <a> ELEMENT (attrs + inner markup up to the first close tag) —
# the anchor-TEXT face needs the element body, not just the href attribute.
# HTML forbids nested <a>, so the non-greedy body is the right boundary;
# an unclosed <a> has no harvestable anchor text and is skipped here
# (its href still counts as an outlink above). The href itself is NOT
# re-parsed from the attrs capture: it comes from matching _A_HREF_RE at
# the element's own start offset, so href tokenization (including its
# behavior on pathological unterminated quotes) is bit-identical to the
# outlink face by construction.
_A_ELEM_RE = re.compile(r"<a\b([^>]*)>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def _resolve_href(href: str, base_url: str | None) -> str | None:
    """The outlink spec's href→url rule (decode/skip/resolve/scheme-filter),
    shared verbatim by the outlink and anchor-text faces so the two can
    never drift. Returns None for dropped hrefs."""
    href = unescape(href).strip()
    if not href or href.startswith("#"):
        return None
    if href.lower().startswith(_SKIP_SCHEMES):
        return None
    url = urljoin(base_url, href) if base_url else href
    if not url.lower().startswith(("http://", "https://")):
        return None
    return url


def extract_anchors(
    raw, base_url: str | None = None, valid: list[str] | None = None
) -> list[tuple[str, str]]:
    """All (target_url, anchor_text) pairs of a page, in document order,
    duplicates KEPT (anchor-text aggregation needs multiplicity).

    - href decoding / base-href override / scheme filtering are the exact
      outlink-spec rules (shared `_resolve_href`), so an anchor's target
      always equals what extract_outlinks would emit for that href;
    - only CLOSED <a …>…</a> elements yield anchors (an unclosed <a> has
      no delimitable text); nested markup inside the element is stripped
      to spaces, entities decoded once, whitespace canonicalized — the
      same canon rule the text spec uses — so anchor text may be '' for
      image-only anchors;
    - PDF / empty / None payloads → [] (no markup);
    - `valid`, when given, MUST be extract_outlinks(raw, base_url) for the
      same payload — the fused extraction path (operators/extract.py,
      with_links + with_anchors) passes its already-computed outlink list
      so the gate below doesn't re-scan; semantics are identical.
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
    # anchor targets are a SUBSET of the outlink face's urls by contract:
    # on pathological markup (unterminated quotes) the two regex scans can
    # tokenize differently, so gate every candidate against the outlink
    # set — a no-op on well-formed markup, and it pins the invariant the
    # fuzz test asserts. Computed BEFORE the base-href override with the
    # page's original base_url (extract_outlinks applies the identical
    # override itself; applying it twice is not idempotent for path-
    # relative <base href> values).
    valid = set(
        extract_outlinks(s, base_url=base_url) if valid is None else valid
    )
    bm = _BASE_HREF_RE.search(s)
    if bm:
        declared = unescape(bm.group(1) or bm.group(2) or bm.group(3) or "").strip()
        if declared:
            base_url = urljoin(base_url, declared) if base_url else declared
    out: list[tuple[str, str]] = []
    for m in _A_ELEM_RE.finditer(s):
        inner = m.group(2)
        hm = _A_HREF_RE.match(s, m.start())
        if not hm:
            continue
        url = _resolve_href(hm.group(1) or hm.group(2) or hm.group(3) or "", base_url)
        if url is None or url not in valid:
            continue
        text = " ".join(unescape(_TAG_RE.sub(" ", inner)).split())
        out.append((url, text))
    return out
