"""Page-metadata harvest (extractor/meta.py + operators/meta.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from greenocr_spark.extractor.meta import extract_meta
from greenocr_spark.fixtures import make_pages

GOLDEN_META_XOR = 1049987538828195193  # frozen with ex8's oracle literal
GOLDEN_N = 1500


def test_meta_unit_spec():
    html = (
        b"<html><head>"
        b"<title> Hello &amp;\n  World </title>"
        b'<meta name="ROBOTS" content="NOINDEX, nofollow">'
        b"<link rel='canonical' href='/the-one'>"
        b"<link rel=stylesheet href=/style.css>"
        b"</head><body>x</body></html>"
    )
    m = extract_meta(html, base_url="https://h.example.com/dup?utm=1")
    assert m["title"] == "Hello & World"
    assert m["robots"] == "noindex,nofollow"
    assert m["noindex"] is True
    assert m["canonical"] == "https://h.example.com/the-one"
    # robots: none implies noindex; index,follow does not
    m2 = extract_meta(b"<meta name=robots content='none'>")
    assert m2["noindex"] is True
    m3 = extract_meta(b"<meta name=robots content='index, follow'>")
    assert m3["robots"] == "index,follow" and m3["noindex"] is False
    # first title / first robots / first canonical win; absent → None
    m4 = extract_meta(
        b"<title>a</title><title>b</title>"
        b"<link rel=canonical href='javascript:x'>"
    )
    assert m4["title"] == "a"
    assert m4["canonical"] is None  # non-http(s) target drops
    assert extract_meta(b"") == {
        "title": None, "robots": None, "noindex": False, "canonical": None
    }
    assert extract_meta(b"%PDF-1.4")["title"] is None
    assert extract_meta(None)["title"] is None


def test_meta_golden_frozen():
    acc, n = 0, 0
    for p in make_pages(GOLDEN_N, seed=42):
        m = extract_meta(p["html"], base_url=p["url"])
        canon = "\x1f".join([
            p["url"], m["title"] or "", m["robots"] or "",
            str(int(m["noindex"])), m["canonical"] or "",
        ])
        acc ^= int(hashlib.sha256(canon.encode("utf-8")).hexdigest()[:15], 16)
        n += 1
    assert (acc, n) == (GOLDEN_META_XOR, GOLDEN_N)


def test_spark_meta_matches_python(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.meta import extract_meta_pages

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 200)
    got = {
        r["url"]: (r["title"], r["robots"], r["noindex"], r["canonical"])
        for r in extract_meta_pages(spark.read.parquet(path)).collect()
    }
    assert len(got) == 200
    for p in make_pages(200, seed=42):
        m = extract_meta(p["html"], base_url=p["url"])
        assert got[p["url"]] == (
            m["title"], m["robots"], m["noindex"], m["canonical"]
        ), p["url"]


def test_canonical_dedup_shape(spark):
    # rel=canonical dedup: keep one page per canonical target (the
    # syndication/parameter collapse that runs BEFORE content hashing).
    # groupBy coalesce(canonical, url) — one map-side-combined shuffle.
    from greenocr_spark.operators.meta import extract_meta_pages

    rows = []
    for i in range(6):
        # pages 0-2 declare the same canonical; 3-4 declare none; 5 its own
        canon = (
            b"<link rel=canonical href='https://ex.org/master'>"
            if i < 3
            else (b"<link rel=canonical href='/self5'>" if i == 5 else b"")
        )
        rows.append(
            (
                f"https://ex.org/p{i}?ref={i}",
                b"<html><head><title>t</title>" + canon + b"</head>"
                b"<body><p>body text here</p></body></html>",
            )
        )
    pages = spark.createDataFrame(rows, "url string, html binary")
    mt = extract_meta_pages(pages)
    kept = (
        mt.groupBy(F.coalesce("canonical", "url").alias("canon_key"))
        .agg(F.min("url").alias("keep_url"), F.count("*").alias("n_dups"))
    )
    got = {r["canon_key"]: (r["keep_url"], r["n_dups"]) for r in kept.collect()}
    assert got["https://ex.org/master"] == ("https://ex.org/p0?ref=0", 3)
    assert got["https://ex.org/self5"][1] == 1
    assert len(got) == 4  # master + 2 canonical-less + self5


def test_meta_robots_union_most_restrictive_wins():
    # multiple robots metas union their tokens (ADVICE r04): a later
    # noindex must still exclude the page from training corpora.
    html = (
        b"<head>"
        b'<meta name="robots" content="index, follow">'
        b'<meta name="robots" content="NOINDEX">'
        b"</head><body>x</body>"
    )
    m = extract_meta(html)
    assert m["robots"] == "index,follow,noindex"
    assert m["noindex"] is True
    # duplicate tokens collapse, first-seen order kept
    m2 = extract_meta(
        b'<meta name=robots content="nofollow"><meta name=robots content="nofollow, none">'
    )
    assert m2["robots"] == "nofollow,none" and m2["noindex"] is True
