"""Minimal from-scratch PDF text extractor + matching generator.

The layout-parse branch for binary payloads (the Real-ESRGAN raw-binary
branch analog, reference ENHANCMENT24.py:93-107). Scope is frozen to the
subset our generator emits — uncompressed or Flate content streams with
BT/ET, Tf, Td, TD, Tm, Tj, TJ text operators — which also covers a useful
slice of real-world simple PDFs. Reading order: spans sorted by
(page, -y, x), per SURVEY.md §7.2 milestone 7.

Deterministic: no randomness, float64 positions, stable sort.
"""

from __future__ import annotations

import re
import zlib

from greenocr_spark.extractor.core import canon_ws

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_DICT_STREAM_RE = re.compile(rb"<<([^>]*(?:>(?!>)[^>]*)*)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def iter_streams(raw: bytes):
    """Yield content-stream bodies in document order.

    Primary path honors the dictionary's /Length — REQUIRED for Flate
    streams, whose compressed bytes can legally contain the literal
    `\\nendstream` sequence (a naive delimiter scan truncates them).
    Streams without a usable /Length fall back to the delimiter scan."""
    found = False
    for m in _DICT_STREAM_RE.finditer(raw):
        lm = _LENGTH_RE.search(m.group(1))
        start = m.end()
        if lm:
            n = int(lm.group(1))
            if raw[start + n : start + n + 11].lstrip(b"\r\n").startswith(b"endstream"):
                found = True
                yield raw[start : start + n]
                continue
        em = _STREAM_RE.match(raw, m.start() + m.group(0).find(b"stream"))
        if em:
            found = True
            yield em.group(1)
    if not found:
        for m in _STREAM_RE.finditer(raw):
            yield m.group(1)


# --------------------------------------------------------------------------
# Generator (fixtures only — never used in the extraction path)
# --------------------------------------------------------------------------


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages, compress: bool = False) -> bytes:
    """Build a minimal 1..n page PDF. `pages` is a list of pages; each page a
    list of (x, y, text) spans. One content stream per page."""
    out = [b"%PDF-1.4\n"]
    objs = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\nendobj\n".encode()
    )
    for i, spans in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"{page_num} 0 obj\n<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 612 792] /Contents {stream_num} 0 R >>\nendobj\n"
            ).encode()
        )
        ops = []
        for k, (x, y, text) in enumerate(spans):
            # cycle positioning/show operator styles so fixtures exercise
            # every parser path (Td+Tj, Tm+Tj, Td+TJ-array); all three are
            # position-equivalent, so extracted spans are identical
            style = k % 4
            if style == 0:
                ops.append(f"BT /F1 12 Tf {x} {y} Td ({_esc(text)}) Tj ET")
            elif style == 1:
                ops.append(f"BT /F1 12 Tf 1 0 0 1 {x} {y} Tm ({_esc(text)}) Tj ET")
            elif style == 2:
                half = len(text) // 2
                a, b = _esc(text[:half]), _esc(text[half:])
                ops.append(f"BT /F1 12 Tf {x} {y} Td [({a}) -250 ({b})] TJ ET")
            else:
                hx = text.encode("latin-1", errors="replace").hex()
                ops.append(f"BT /F1 12 Tf {x} {y} Td <{hx}> Tj ET")
        body = "\n".join(ops).encode("latin-1", errors="replace")
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b" /Filter /FlateDecode"
        objs.append(
            f"{stream_num} 0 obj\n<< /Length {len(body)}{filt.decode()} >>\nstream\n".encode()
            + body
            + b"\nendstream\nendobj\n"
        )
    for o in objs:
        out.append(o)
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------


# Tokenizer hot-path tables (round-2 rewrite: index bytes as ints — no
# per-byte bytes-object allocation — and match precompiled regexes AT a
# position instead of re.match on a data[i:] copy; token stream is
# byte-identical, pinned by tests/test_pdf.py + the fixture hash gate).
_PDF_WS = frozenset(b" \t\n\r\x0b\x0c")  # == single-byte bytes.isspace()
_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_HEX_WS_RE = re.compile(rb"\s")
_NAME_RE = re.compile(rb"/[^\s\[\]()<>/]*")
_NUM_START = frozenset(b"-+.0123456789")
_NUM_RE = re.compile(rb"[-+.0-9]+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_ESC_MAP = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}


def _tokenize_content(data: bytes):
    """Yield tokens from a content stream: ('str', text), ('num', float),
    ('op', name), ('arr', [tokens])."""
    i, n = 0, len(data)
    ws = _PDF_WS
    while i < n:
        c = data[i]
        if c in ws:
            i += 1
        elif c == 0x28:  # '(' — PDF literal string, escapes, balanced parens
            buf = []
            depth = 1
            i += 1
            while i < n and depth > 0:
                ch = data[i]
                if ch == 0x5C and i + 1 < n:  # backslash escape
                    nxt = data[i + 1]
                    esc = _ESC_MAP.get(nxt)
                    buf.append(esc if esc is not None else chr(nxt))
                    i += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                buf.append(chr(ch))  # latin-1 single byte == chr
                i += 1
            yield ("str", "".join(buf))
        elif c == 0x3C:  # '<'
            if i + 1 < n and data[i + 1] == 0x3C:  # '<<' inline dict — skip
                end = data.find(b">>", i + 2)
                i = n if end < 0 else end + 2
                continue
            m = _HEX_RE.match(data, i)
            if m:
                hx = _HEX_WS_RE.sub(b"", m.group(1))
                if len(hx) % 2:
                    hx += b"0"  # PDF spec: odd-length hex pads with 0
                try:
                    yield ("str", bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                except ValueError:
                    pass
                i = m.end()
            else:
                i += 1
        elif c == 0x5B:  # '['
            j = i + 1
            depth = 1
            while j < n and depth > 0:
                cj = data[j]
                if cj == 0x28:  # skip strings (may contain brackets)
                    j += 1
                    while j < n and data[j] != 0x29:
                        if data[j] == 0x5C:
                            j += 1
                        j += 1
                elif cj == 0x5B:
                    depth += 1
                elif cj == 0x5D:
                    depth -= 1
                j += 1
            yield ("arr", list(_tokenize_content(data[i + 1 : j - 1])))
            i = j
        elif c == 0x2F:  # '/'
            m = _NAME_RE.match(data, i)
            yield ("name", m.group(0).decode("latin-1"))
            i = m.end()
        elif c in _NUM_START:
            m = _NUM_RE.match(data, i)
            try:
                yield ("num", float(m.group(0)))
            except ValueError:
                pass
            i = m.end()
        else:
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group(0).decode("latin-1"))
                i = m.end()
            else:
                i += 1


def _parse_stream(data: bytes):
    """Return list of (x, y, text) spans from one content stream."""
    spans = []
    x = y = 0.0
    operands = []
    for kind, val in _tokenize_content(data):
        if kind in ("str", "num", "name", "arr"):
            operands.append((kind, val))
            continue
        op = val
        if op == "BT":
            x = y = 0.0
        elif op in ("Td", "TD") and len(operands) >= 2:
            x += float(operands[-2][1])
            y += float(operands[-1][1])
        elif op == "Tm" and len(operands) >= 6:
            x = float(operands[-2][1])
            y = float(operands[-1][1])
        elif op == "Tj" and operands and operands[-1][0] == "str":
            spans.append((x, y, operands[-1][1]))
        elif op == "TJ" and operands and operands[-1][0] == "arr":
            text = "".join(v for k, v in operands[-1][1] if k == "str")
            spans.append((x, y, text))
        elif op in ("'", '"'):
            y -= 14.0  # next-line shorthand (T* leading default)
            if operands and operands[-1][0] == "str":
                spans.append((x, y, operands[-1][1]))
        operands = []
    return spans


def extract_pdf(raw: bytes):
    """Extract reading-order text spans from a minimal PDF byte stream.

    Each content stream is one page (generator invariant). Spans sort by
    (page, -y, x); output text is the whitespace-canonical join."""
    parts = []
    spans_out = []
    off = 0
    idx = 0
    for page_no, body in enumerate(iter_streams(raw)):
        try:
            body = zlib.decompress(body)
        except zlib.error:
            pass
        page_spans = _parse_stream(body)
        page_spans.sort(key=lambda s: (-s[1], s[0]))
        for _x, _y, text in page_spans:
            text = canon_ws(text)
            if not text:
                continue
            if parts:
                off += 1
            start = off
            parts.append(text)
            off += len(text)
            spans_out.append((idx, start, off, "content"))
            idx += 1
    text = " ".join(parts)
    return {
        "text": text,
        "spans": spans_out,
        "n_blocks": idx,
        "n_content": idx,
        "n_boilerplate": 0,
        "kind": "pdf",
    }
