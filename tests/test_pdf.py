"""Tests for the minimal PDF layout parser (SURVEY.md §7.2 milestone 7)."""

import zlib

from greenocr_spark.extractor.pdf import build_pdf, extract_pdf


def test_roundtrip_uncompressed():
    raw = build_pdf([[(72, 700, "first line"), (72, 680, "second line")]])
    r = extract_pdf(raw)
    assert r["text"] == "first line second line"
    assert r["n_blocks"] == 2 and r["kind"] == "pdf"


def test_roundtrip_flate():
    raw = build_pdf([[(72, 700, "compressed span")]], compress=True)
    assert b"FlateDecode" in raw
    assert extract_pdf(raw)["text"] == "compressed span"


def test_reading_order_sorts_by_y_desc_then_x():
    # emit spans out of order; parser must sort (page, -y, x)
    raw = build_pdf([[(300, 650, "gamma"), (72, 700, "alpha"), (200, 700, "beta")]])
    assert extract_pdf(raw)["text"] == "alpha beta gamma"


def test_multipage_order():
    raw = build_pdf([[(72, 700, "page one")], [(72, 700, "page two")]])
    assert extract_pdf(raw)["text"] == "page one page two"


def test_string_escapes():
    raw = build_pdf([[(72, 700, r"parens (nested) and \ backslash")]])
    assert extract_pdf(raw)["text"] == r"parens (nested) and \ backslash"


def test_tj_array_concat():
    # hand-rolled TJ with kerning numbers between strings
    body = b"BT 72 700 Td [(hel) -20 (lo) 10 ( world)] TJ ET"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj\ntrailer\n%%EOF"
    )
    assert extract_pdf(raw)["text"] == "hello world"


def test_spans_offsets_valid():
    raw = build_pdf([[(72, 700, "aa"), (72, 680, "bbb")]])
    r = extract_pdf(raw)
    for idx, s, e, cls in r["spans"]:
        assert cls == "content"
        assert r["text"][s:e] in ("aa", "bbb")


def test_corrupt_stream_no_crash():
    raw = b"%PDF-1.4\nstream\n" + zlib.compress(b"BT (x) Tj ET")[:5] + b"\nendstream\n%%EOF"
    r = extract_pdf(raw)
    assert isinstance(r["text"], str)


def test_stream_body_containing_endstream_bytes():
    # /Length must win over delimiter scanning: a stream body (e.g. Flate
    # bytes) can legally contain the literal b"\nendstream" — a naive
    # non-greedy scan truncates the stream and drops following pages.
    body = (
        b"BT /F1 12 Tf 72 700 Td (first span) Tj ET\n"
        b"%\nendstream decoy comment\n"
        b"BT /F1 12 Tf 72 680 Td (second span) Tj ET"
    )
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    r = extract_pdf(raw)
    assert r["text"] == "first span second span"


def test_hex_string_tj():
    body = b"BT /F1 12 Tf 72 700 Td <48656C6C 6F20776F726C64> Tj ET"
    raw = (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf(raw)["text"] == "Hello world"


def test_hex_string_odd_length_pads():
    body = b"BT /F1 12 Tf 72 700 Td <48656C6C6F2> Tj ET"  # trailing '2' -> 0x20
    raw = (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf(raw)["text"] == "Hello"
