"""WARC source: roundtrip fidelity, Content-Length-driven boundary safety,
and malformed-record behavior in strict vs lenient mode."""

from __future__ import annotations

import datetime as dt

import pytest

from greenocr_spark.fixtures import make_pages
from greenocr_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
    write_warc_dir,
)


def _adversarial_pages():
    ts = dt.datetime(2026, 1, 2, 3, 4, 5)
    return [
        {"url": "https://a.example.com/1", "warc_ts": ts, "html": b"<p>plain</p>"},
        # payload containing CRLFCRLF and a fake WARC header — must NOT
        # confuse the Content-Length-driven parser
        {
            "url": "https://a.example.com/2",
            "warc_ts": ts,
            "html": b"x\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\ny",
        },
        {"url": "https://a.example.com/3", "warc_ts": ts, "html": b""},
        {"url": "https://a.example.com/4", "warc_ts": ts, "html": None},
    ]


def test_roundtrip_bytes_exact(tmp_path):
    pages = _adversarial_pages()
    path = str(tmp_path / "seg.warc")
    write_warc(pages, path)
    got = list(parse_warc_bytes(open(path, "rb").read()))
    assert [(u, h) for u, _, h in got] == [
        (p["url"], p["html"] or b"") for p in pages
    ]
    assert all(ts == pages[0]["warc_ts"] for _, ts, _ in got)


def test_read_warc_dir_roundtrip(spark, tmp_path):
    pages = make_pages(60, seed=42)
    d = str(tmp_path / "warc")
    write_warc_dir(pages, d, n_segments=4)
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in read_warc(spark, d).collect()
    }
    assert len(got) == 60
    for p in pages:
        ts, html = got[p["url"]]
        assert html == (p["html"] or b"")
        assert ts == p["warc_ts"]


def test_truncated_record_strict_raises_lenient_stops(tmp_path):
    pages = _adversarial_pages()[:2]
    path = str(tmp_path / "seg.warc")
    write_warc(pages, path)
    blob = open(path, "rb").read()
    truncated = blob[:-10]  # cut into the last record's body
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(truncated))
    lenient = list(parse_warc_bytes(truncated, strict=False))
    assert [u for u, _, _ in lenient] == [pages[0]["url"]]  # first record intact


def test_non_response_records_filtered(tmp_path):
    ts = dt.datetime(2026, 1, 1)
    body = b"meta"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://x/1\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
    )
    pages = [{"url": "https://x/2", "warc_ts": ts, "html": b"<p>a</p>"}]
    path = str(tmp_path / "seg.warc")
    with open(path, "wb") as f:
        f.write(rec)
    with open(path, "ab") as f:
        pass
    blob = open(path, "rb").read() + open(write_warc(pages, path + "2"), "rb").read()
    got = list(parse_warc_bytes(blob))
    assert [u for u, _, _ in got] == ["https://x/2"]


def test_gzip_member_roundtrip(spark, tmp_path):
    """.warc.gz segments (one gzip member per record, the Common Crawl
    wire format) roundtrip identically to plain segments."""
    pages = make_pages(40, seed=42)
    d = str(tmp_path / "warcgz")
    write_warc_dir(pages, d, n_segments=3, compress=True)
    import glob as _glob

    assert _glob.glob(d + "/*.warc.gz") and not _glob.glob(d + "/*.warc")
    got = {
        r["url"]: bytes(r["html"]) for r in read_warc(spark, d).collect()
    }
    assert len(got) == 40
    for p in pages:
        assert got[p["url"]] == (p["html"] or b"")


def test_gzip_members_are_independent(tmp_path):
    """Each record must be its own gzip member (streamable member-by-member),
    not one stream over the whole segment."""
    import zlib

    pages = _adversarial_pages()
    path = str(tmp_path / "seg.warc.gz")
    write_warc(pages, path, compress=True)
    blob = open(path, "rb").read()
    members = 0
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        d.decompress(blob[pos:])
        pos = len(blob) - len(d.unused_data)
        members += 1
    assert members == len(pages)


def test_stray_tmp_files_ignored(spark, tmp_path):
    # ADVICE r03: a half-uploaded 'segment.warc.tmp' next to real segments
    # must not fail (strict) or pollute (lenient) the read — the glob takes
    # exactly the two supported extensions.
    pages = make_pages(20, seed=42)
    d = str(tmp_path / "warc")
    write_warc_dir(pages, d, n_segments=2)
    with open(f"{d}/segment-99.warc.tmp", "wb") as f:
        f.write(b"half-uploaded garbage, not a WARC record")
    with open(f"{d}/segment-98.warc.bak", "wb") as f:
        f.write(b"\x1f\x8bnot really gzip either")
    got = read_warc(spark, d).collect()
    assert len(got) == 20
    assert {r["url"] for r in got} == {p["url"] for p in pages}
