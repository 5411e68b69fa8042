"""Outlink extraction (extractor/links.py + operators/links.py): unit
spec, Spark≡pure-Python string identity, and the host-graph shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from greenocr_spark.extractor.links import extract_outlinks
from greenocr_spark.fixtures import make_pages

GOLDEN_OUTLINK_XOR = 286616767658516744  # frozen with ex7's oracle literal
GOLDEN_N = 1500


def test_outlink_unit_spec():
    html = (
        b"<html><body>"
        b'<a href="https://ex.org/a">x</a>'
        b"<a href='/rooted'>x</a>"
        b"<a href=bare>x</a>"
        b'<A HREF="//proto.rel/p">x</A>'
        b'<a href="../up">x</a>'
        b'<a href="#frag">x</a>'
        b'<a href="javascript:void(0)">x</a>'
        b'<a href="mailto:a@b.c">x</a>'
        b'<a href="?q=1&amp;r=2">x</a>'
        b'<a href="https://ex.org/a">dup</a>'
        b"<a name=anchor>no href</a>"
        b"</body></html>"
    )
    got = extract_outlinks(html, base_url="https://host.example.com/dir/page")
    assert got == [
        "https://ex.org/a",
        "https://host.example.com/rooted",
        "https://host.example.com/dir/bare",
        "https://proto.rel/p",
        "https://host.example.com/up",
        "https://host.example.com/dir/page?q=1&r=2",
    ]
    # no base_url: only absolute links survive (protocol-relative included
    # cannot resolve without a base and drops)
    assert extract_outlinks(html) == ["https://ex.org/a"]
    # PDFs and empty payloads have no markup links
    assert extract_outlinks(b"%PDF-1.4 whatever") == []
    assert extract_outlinks(b"") == []
    assert extract_outlinks(None) == []


def test_outlink_golden_frozen():
    # the pure-Python path over the fixture corpus must reproduce the
    # literal frozen in ex7's oracle — same pattern as the ex4 text hash
    acc, n = 0, 0
    for p in make_pages(GOLDEN_N, seed=42):
        links = extract_outlinks(p["html"], base_url=p["url"])
        canon = "\x1f".join([p["url"], ";".join(links), str(len(links))])
        acc ^= int(hashlib.sha256(canon.encode("utf-8")).hexdigest()[:15], 16)
        n += 1
    assert (acc, n) == (GOLDEN_OUTLINK_XOR, GOLDEN_N)


def test_spark_links_match_python(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.links import extract_links

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 300)
    got = {
        r["url"]: (list(r["outlinks"]), r["n_links"])
        for r in extract_links(spark.read.parquet(path)).collect()
    }
    pages = make_pages(300, seed=42)
    assert len(got) == 300
    for p in pages:
        want = extract_outlinks(p["html"], base_url=p["url"])
        assert got[p["url"]] == (want, len(want)), p["url"]


def test_links_stage_is_narrow(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.links import extract_links

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 50)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_links(spark.read.parquet(path)).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_host_graph_values(spark):
    import greenocr_spark.battery as b
    import greenocr_spark.battery_ml  # noqa: F401

    fn, _ = b.REGISTRY["lnk1_host_graph"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    # fixture links are site-relative → after urljoin every edge is
    # intra-host, and every host linking out links to itself
    for r in rows:
        assert r["src_host"] == r["dst_host"], r
    # the Zipf-hot host carries the most edges
    top = max(rows, key=lambda r: r["n_edges"])
    assert top["src_host"] == "big.example.com"


def test_outlink_fuzz_never_raises_and_deterministic():
    # crawl bytes are adversarial: random binary, truncated tags, nested
    # quotes — the harvester must never raise, must be deterministic, and
    # must only ever emit http(s) urls
    import random

    rng = random.Random(7)
    alphabet = b"<>ahref=\"'/ :#&;x\x00\xff\xc3\xa4%PDF-jmailto"
    for trial in range(200):
        raw = bytes(rng.choice(alphabet) for _ in range(rng.randrange(0, 400)))
        a = extract_outlinks(raw, base_url="https://h.example.com/p")
        b = extract_outlinks(raw, base_url="https://h.example.com/p")
        assert a == b
        assert all(u.lower().startswith(("http://", "https://")) for u in a)


def test_fused_extract_with_links_matches_both_faces(spark, tmp_path):
    # extract_pages(with_links=True) must equal the text face of the
    # default stage AND the link face of the standalone stage, row for row
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.extract import extract_pages
    from greenocr_spark.operators.links import extract_links

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 200)
    pages = spark.read.parquet(path)
    fused = {
        r["url"]: (r["text"], list(r["outlinks"]), r["n_links"])
        for r in extract_pages(pages, with_links=True).collect()
    }
    text_only = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
    links_only = {
        r["url"]: (list(r["outlinks"]), r["n_links"])
        for r in extract_links(pages).collect()
    }
    assert len(fused) == 200
    for url, (text, links, nl) in fused.items():
        assert text == text_only[url]
        assert (links, nl) == links_only[url]
    # and the fused stage is still narrow
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_pages(pages, with_links=True).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_extract_job_with_links_and_schema_guard(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.plans.job import run_extract_job

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 300)
    pages = spark.read.parquet(path)
    out = str(tmp_path / "out")
    res = run_extract_job(spark, pages, out, n_parts=8, with_links=True)
    assert "outlinks" in res.columns and "n_links" in res.columns
    got = {r["url"]: list(r["outlinks"]) for r in res.collect()}
    assert len(got) == 300
    # spot: link face matches the pure-Python spec through the job path
    for p in make_pages(5, seed=42):
        assert got[p["url"]] == extract_outlinks(p["html"], base_url=p["url"])
    # resume with the SAME flag: no-op, schema stable
    res2 = run_extract_job(spark, pages, out, n_parts=8, with_links=True)
    assert res2.count() == 300
    # resuming with a DIFFERENT flag must fail loudly, not mix schemas
    import pytest as _pt

    with _pt.raises(ValueError, match="with_links"):
        run_extract_job(spark, pages, out, n_parts=8, with_links=False)


def test_link_and_meta_stages_run_under_streaming(spark, tmp_path):
    # the graph/metadata faces are pure DataFrame→DataFrame stages, so the
    # batch pipeline IS the streaming pipeline (same contract st8 pins for
    # text): stream_warc → extract_links/extract_meta_pages, availableNow
    # drain, output equal to the batch path over the same segments
    import tempfile

    from greenocr_spark.operators.links import extract_links
    from greenocr_spark.operators.meta import extract_meta_pages
    from greenocr_spark.sources.warc import read_warc, stream_warc, write_warc_dir
    from greenocr_spark.streaming.face import run_available_now

    pages = make_pages(60, seed=42)
    d = str(tmp_path / "warc")
    write_warc_dir(pages, d, n_segments=4)

    batch_links = {
        r["url"]: list(r["outlinks"])
        for r in extract_links(read_warc(spark, d).select("url", "html")).collect()
    }
    stream = extract_links(stream_warc(spark, d).select("url", "html"))
    qh = run_available_now(
        stream, "lnk_stream_test", tempfile.mkdtemp(prefix="lnk_ckpt_")
    )
    qh.awaitTermination()
    got = {
        r["url"]: list(r["outlinks"])
        for r in spark.sql("SELECT * FROM lnk_stream_test").collect()
    }
    assert got == batch_links and len(got) == 60

    meta_stream = extract_meta_pages(stream_warc(spark, d).select("url", "html"))
    run_available_now(
        meta_stream, "meta_stream_test", tempfile.mkdtemp(prefix="meta_ckpt_")
    ).awaitTermination()
    got_m = {
        r["url"]: r["title"]
        for r in spark.sql("SELECT * FROM meta_stream_test").collect()
    }
    batch_m = {
        r["url"]: r["title"]
        for r in extract_meta_pages(
            read_warc(spark, d).select("url", "html")
        ).collect()
    }
    assert got_m == batch_m and len(got_m) == 60


def test_lnk1_golden_rows_provenance():
    # the VALUES oracle's rows recomputed in pure Python (extract_outlinks
    # + urlsplit host parse) — the frozen literal is independent of Spark
    from urllib.parse import urlsplit

    from greenocr_spark.battery_ml import _LNK1_GOLDEN_ROWS

    counts: dict = {}
    for p in make_pages(400, seed=42):
        src = urlsplit(p["url"]).hostname
        for out in extract_outlinks(p["html"], base_url=p["url"]):
            dst = urlsplit(out).hostname
            counts[(src, dst)] = counts.get((src, dst), 0) + 1
    expect = sorted((s, d, n) for (s, d), n in counts.items())
    assert expect == sorted(_LNK1_GOLDEN_ROWS)


def test_outlink_base_href_override():
    # <base href> overrides the page url (HTML semantics; ADVICE r04):
    # absolute base, relative base (resolved against the page url first),
    # and the no-base control all resolve differently.
    a = b'<a href="x/y">x</a><a href="/root">r</a>'
    assert extract_outlinks(
        b'<head><base href="https://cdn.example.net/assets/"></head>' + a,
        base_url="https://page.example.com/dir/p",
    ) == ["https://cdn.example.net/assets/x/y", "https://cdn.example.net/root"]
    # relative base joins the page url before hrefs resolve
    assert extract_outlinks(
        b"<head><base href='/b/'></head>" + a,
        base_url="https://page.example.com/dir/p",
    ) == ["https://page.example.com/b/x/y", "https://page.example.com/root"]
    # absolute base works even with no page url at all
    assert extract_outlinks(
        b'<head><base href="https://only.example.org/d/"></head>' + a
    ) == ["https://only.example.org/d/x/y", "https://only.example.org/root"]
    # control: no base tag → page url is the base
    assert extract_outlinks(a, base_url="https://page.example.com/dir/p") == [
        "https://page.example.com/dir/x/y",
        "https://page.example.com/root",
    ]


# ---------------------------------------------------------------------------
# Anchor-text face (round 5)
# ---------------------------------------------------------------------------


def test_anchor_unit_spec():
    from greenocr_spark.extractor.links import extract_anchors

    html = (
        b"<html><body>"
        b'<a href="https://ex.org/a">Plain text</a>'
        b"<a href='/rooted'><b>Bold</b> &amp; <i>nested</i> <img src=x></a>"
        b'<a href="https://ex.org/a">Plain text</a>'  # duplicate KEPT
        b'<a href="#frag">fragment only</a>'
        b'<a href="javascript:void(0)">skip</a>'
        b"<a name=anchor>no href</a>"
        b'<a href="/img-only"><img src=y></a>'
        b'<a href="/ws">  lots\n\tof   space  </a>'
        b'<a href="/open">unclosed trailing'
    )
    got = extract_anchors(html, base_url="https://host.example.com/dir/page")
    assert got == [
        ("https://ex.org/a", "Plain text"),
        ("https://host.example.com/rooted", "Bold & nested"),
        ("https://ex.org/a", "Plain text"),
        ("https://host.example.com/img-only", ""),
        ("https://host.example.com/ws", "lots of space"),
    ]
    # PDFs / empty / None payloads have no markup anchors
    assert extract_anchors(b"%PDF-1.4 whatever") == []
    assert extract_anchors(b"") == []
    assert extract_anchors(None) == []


def test_anchor_golden_frozen():
    # the pure-Python anchor path over the fixture corpus must reproduce
    # the literal frozen in anch1's oracle (the ex4/ex7 pattern); seq in
    # the canon keeps repeated (src, dst, anchor) triples from xor-
    # cancelling (the fixture link-farm repeats its farm block verbatim)
    from greenocr_spark.battery_ml import _ANCH1_N, _ANCH1_XOR
    from greenocr_spark.extractor.links import extract_anchors

    acc, n = 0, 0
    for p in make_pages(1500, seed=42):
        for i, (d, a) in enumerate(extract_anchors(p["html"], base_url=p["url"])):
            canon = "\x1f".join([p["url"], str(i), d, a])
            acc ^= int(hashlib.sha256(canon.encode("utf-8")).hexdigest()[:15], 16)
            n += 1
    assert (acc, n) == (_ANCH1_XOR, _ANCH1_N)


def test_anchor_host_terms_provenance():
    # recompute anch2's frozen VALUES rows from the pure-Python spec
    # (urlsplit host + lowercase whitespace terms, top term by
    # count DESC / term ASC) — pins the golden literal to the spec,
    # independent of Spark
    from collections import Counter
    from urllib.parse import urlsplit

    from greenocr_spark.battery_ml import _ANCH2_GOLDEN_ROWS
    from greenocr_spark.extractor.links import extract_anchors

    per_host_terms: dict = {}
    per_host_anchors: Counter = Counter()
    for p in make_pages(400, seed=42):
        for d, a in extract_anchors(p["html"], base_url=p["url"]):
            h = urlsplit(d).hostname
            per_host_anchors[h] += 1
            c = per_host_terms.setdefault(h, Counter())
            for t in a.lower().split():
                c[t] += 1
    expect = []
    for h in sorted(per_host_terms):
        c = per_host_terms[h]
        top_term, top_count = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((h, per_host_anchors[h], len(c), top_term, top_count))
    assert expect == sorted(_ANCH2_GOLDEN_ROWS)


def test_anchor_stage_is_narrow(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.links import extract_anchors_df

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 50)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_anchors_df(spark.read.parquet(path)).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_anchor_fuzz_never_raises_and_matches_outlink_targets():
    # adversarial markup: the anchor extractor must never raise, must be
    # deterministic, and every target it emits must be a url the outlink
    # spec would also emit for the same page (shared _resolve_href)
    import random as _random

    from greenocr_spark.extractor.links import extract_anchors, extract_outlinks

    rng = _random.Random(7)
    frags = [
        "<a href=", '"', "'", ">", "</a>", "<a>", "text", "&amp;", "&#x41;",
        "<b>", "</b>", "<base href='/b/'>", "javascript:x", "https://f.ex/p",
        "//rel.ex/q", "#f", "mailto:a@b", "<img src=x>", "\n", "\t", "<",
        ">>", "<a href='/ok'>k</a>",
    ]
    for _ in range(300):
        doc = "".join(rng.choice(frags) for _ in range(rng.randrange(0, 40)))
        raw = doc.encode("utf-8", errors="replace")
        a1 = extract_anchors(raw, base_url="https://host.ex/d/p")
        a2 = extract_anchors(raw, base_url="https://host.ex/d/p")
        assert a1 == a2
        targets = {u for u, _ in a1}
        outs = set(extract_outlinks(raw, base_url="https://host.ex/d/p"))
        assert targets <= outs, (doc, targets - outs)


def test_fused_extract_with_anchors_matches_both_faces(spark, tmp_path):
    # extract_pages(with_anchors=True) must equal the text face of the
    # default stage AND the anchor face of the standalone stage, row for
    # row; composes with with_links in the same pass
    from greenocr_spark.extractor.links import extract_anchors
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.operators.extract import extract_pages

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 200)
    pages = spark.read.parquet(path)
    fused = {
        r["url"]: (
            r["text"],
            [(a["dst"], a["anchor"]) for a in r["anchors"]],
            r["n_anchors"],
            list(r["outlinks"]),
        )
        for r in extract_pages(pages, with_links=True, with_anchors=True).collect()
    }
    text_only = {r["url"]: r["text"] for r in extract_pages(pages).collect()}
    assert len(fused) == 200
    for p in make_pages(200, seed=42):
        text, anchors, n_anchors, links = fused[p["url"]]
        assert text == text_only[p["url"]]
        expect = extract_anchors(p["html"], base_url=p["url"])
        assert anchors == expect
        assert n_anchors == len(expect)
    # still narrow
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_pages(pages, with_anchors=True).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_extract_job_with_anchors_schema_guard(spark, tmp_path):
    from greenocr_spark.fixtures import write_pages_parquet
    from greenocr_spark.plans.job import run_extract_job

    path = str(tmp_path / "p.parquet")
    write_pages_parquet(path, 100)
    pages = spark.read.parquet(path)
    out = str(tmp_path / "out")
    res = run_extract_job(spark, pages, out, n_parts=4, with_anchors=True)
    assert "anchors" in res.columns and "n_anchors" in res.columns
    assert res.count() == 100
    # resume with the SAME flag: no-op, schema stable
    assert run_extract_job(spark, pages, out, n_parts=4, with_anchors=True).count() == 100
    # resuming with a DIFFERENT flag must fail loudly, not mix schemas
    import pytest as _pt

    with _pt.raises(ValueError, match="with_anchors"):
        run_extract_job(spark, pages, out, n_parts=4)
    # and the links guard is independent of the anchors guard
    with _pt.raises(ValueError, match="with_links"):
        run_extract_job(spark, pages, out, n_parts=4, with_links=True, with_anchors=True)
