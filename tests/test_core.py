"""Unit + property tests for the pure-Python extraction core (SURVEY.md §5.2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from greenocr_spark.extractor import core
from greenocr_spark.extractor.core import (
    canon_ws,
    classify_blocks,
    decode_blocks,
    decode_bytes,
    extract_document,
    extract_html,
    repair_markup,
    score_blocks,
    tokenize_blocks,
)
from greenocr_spark.fixtures import make_pages


# ---- canon_ws (F1): the byte-identity-critical final step ----------------


def test_canon_ws_collapses_all_whitespace():
    assert canon_ws("  a\t\tb\nc\xa0d  ") == "a b c d"


@given(st.text())
@settings(max_examples=200, deadline=None)
def test_canon_ws_idempotent(s):
    # F1 ∘ F1 = F1 (SURVEY §5.2.3 property)
    assert canon_ws(canon_ws(s)) == canon_ws(s)


# ---- decode_bytes (charset sniff chain) -----------------------------------


def test_decode_bom_utf8():
    assert decode_bytes(b"\xef\xbb\xbfhi") == "hi"


def test_decode_declared_latin1():
    raw = b"<meta charset='latin-1'>v\xe4lue"
    assert "v\xe4lue" in decode_bytes(raw)


def test_decode_utf8_default():
    assert decode_bytes("schön".encode("utf-8")) == "sch\xf6n"


def test_decode_latin1_fallback():
    # invalid utf-8, no declaration → latin-1 never fails
    assert decode_bytes(b"\xff\xfa") != ""


def test_decode_empty():
    assert decode_bytes(b"") == ""


# ---- repair_markup (restoration) ------------------------------------------


def test_repair_drops_script_style_comments():
    s = "<p>keep</p><script>var x=1;</script><style>p{}</style><!-- no -->"
    r = repair_markup(s)
    assert "keep" in r and "var x" not in r and "color" not in r and "no" not in r.replace("<p>keep</p>", "")


def test_repair_unclosed_script_drops_to_end():
    assert "secret" not in repair_markup("<p>a</p><script>secret")


# ---- tokenize_blocks -------------------------------------------------------


def test_tokenize_basic_blocks():
    blocks = tokenize_blocks("<p>one</p><p>two two</p><div>three</div>")
    assert [b.text for b in blocks] == ["one", "two two", "three"]
    assert [b.tag for b in blocks] == ["p", "p", "div"]


def test_tokenize_unbalanced_tags_tolerated():
    blocks = tokenize_blocks("<div><p>alpha<p>beta</b></div></p>junk")
    texts = [b.text for b in blocks]
    assert "alpha" in texts and "beta" in texts


def test_tokenize_link_density():
    blocks = tokenize_blocks("<p><a href='/'>click here</a></p><p>plain text body</p>")
    assert blocks[0].link_density == 1.0
    assert blocks[1].link_density == 0.0


def test_tokenize_entities_single_pass():
    blocks = tokenize_blocks("<p>&amp;amp; &#97;b</p>")
    # double-encoded decodes one level (frozen spec)
    assert blocks[0].text == "&amp; ab"


def test_tokenize_inline_tags_do_not_split():
    blocks = tokenize_blocks("<p>a <b>bold</b> and <span>span</span> text</p>")
    assert len(blocks) == 1
    assert blocks[0].text == "a bold and span text"


# ---- scoring + classify ----------------------------------------------------


def test_score_channels_shape_and_range():
    blocks = tokenize_blocks("<nav><a href='/'>x</a></nav>" + "".join(f"<p>{'w ' * 30}</p>" for _ in range(5)))
    sc = score_blocks(blocks)
    for k in ("norm", "smooth", "sharp"):
        assert sc[k].dtype == np.float64 and len(sc[k]) == len(blocks)
        assert (sc[k] >= 0).all() and (sc[k] <= 1).all()


def test_classify_link_farm_is_boilerplate():
    html = "".join(f"<div><a>{'link text here padding' }</a></div>" for _ in range(10))
    html += "<p>" + "real content word " * 20 + "</p>"
    blocks = tokenize_blocks(html)
    cls = classify_blocks(blocks, score_blocks(blocks))
    assert cls[-1] == 1
    assert cls[:-1].sum() == 0


def test_neargood_promotion():
    # a medium paragraph sandwiched between two strong ones gets promoted
    html = (
        "<p>" + "strong content word " * 20 + "</p>"
        "<p>" + "medium para word " * 7 + "</p>"
        "<p>" + "strong content word " * 20 + "</p>"
    )
    blocks = tokenize_blocks(html)
    cls = classify_blocks(blocks, score_blocks(blocks))
    assert list(cls) == [1, 1, 1]


# ---- decode_blocks (CTC collapse law) --------------------------------------


def test_decode_blocks_spans_offsets():
    blocks = tokenize_blocks("<p>aaa</p><p>bbbb</p><p>cc</p>")
    cls = np.array([1, 0, 1])
    text, spans = decode_blocks(blocks, cls)
    assert text == "aaa cc"
    assert spans == [(0, 0, 3, "content"), (2, 4, 6, "content")]
    for _idx, s, e, _c in spans:
        assert text[s:e] in ("aaa", "cc")


def test_decode_empty():
    assert decode_blocks([], np.zeros(0, dtype=np.int64)) == ("", [])


# ---- end-to-end + routing ---------------------------------------------------


def test_extract_document_routes_pdf():
    from greenocr_spark.extractor.pdf import build_pdf

    raw = build_pdf([[(72, 700, "hello world from pdf")]])
    r = extract_document(raw)
    assert r["kind"] == "pdf" and r["text"] == "hello world from pdf"


def test_extract_document_empty_and_none():
    for raw in (b"", None):
        r = extract_document(raw)
        assert r == {"text": "", "spans": [], "n_blocks": 0, "n_content": 0, "n_boilerplate": 0, "kind": "empty"}


def test_extract_html_deterministic():
    page = make_pages(30)[0]
    r1, r2 = extract_document(page["html"]), extract_document(page["html"])
    assert r1 == r2


def test_fixture_clean_cases_match_intended():
    hits = total = 0
    for p in make_pages(300):
        case = p["url"].split("/")[3]
        if case in ("clean", "link-farm", "boilerplate-heavy", "whitespace-noise",
                    "entity-soup", "short-page", "pdf", "utf16", "deep-nesting"):
            total += 1
            hits += extract_document(p["html"])["text"] == p["text"]
    assert hits == total, f"{hits}/{total}"


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_extract_never_crashes_on_garbage(raw):
    r = extract_document(raw)
    assert isinstance(r["text"], str)
    assert r["text"] == canon_ws(r["text"])  # output always canonical


def test_stats_consistency():
    for p in make_pages(50):
        r = extract_document(p["html"])
        assert r["n_blocks"] == r["n_content"] + r["n_boilerplate"]
        assert len(r["spans"]) == r["n_content"] or r["kind"] == "pdf"


@given(
    st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=1, max_size=200),
    st.floats(min_value=0, max_value=100),
)
def test_pctl_linear_matches_numpy(vals, pct):
    import numpy as np

    from greenocr_spark.extractor.core import _pctl_linear

    a = np.sort(np.array(vals, dtype=np.float64))
    assert _pctl_linear(a, pct) == float(np.percentile(a, pct))


@given(st.text(alphabet="<>/ab! c-?=\"'\n\t&;", max_size=300))
def test_tag_regex_spans_match_plain_form(s):
    # the capturing tokenizer regex must match exactly the spans of the
    # plain <[^>]*> form — segmentation is byte-identity-critical
    import re

    from greenocr_spark.extractor.core import _TAG_RE

    plain = [m.span() for m in re.finditer(r"<[^>]*>", s)]
    ours = [m.span() for m in _TAG_RE.finditer(s)]
    assert plain == ours


def test_extraction_beats_naive_tag_strip():
    # the whole point of the scoring pipeline: naive tag-stripping keeps
    # title/nav/footer/link-farm boilerplate and ~never reproduces the
    # intended main content; the scored pipeline does on most labeled cases
    import html as _h
    import re as _re

    from greenocr_spark.extractor.core import repair_markup, decode_bytes

    ours = naive = total = 0
    for p in make_pages(480):
        want = p["text"]
        if want is None or p["url"].split("/")[3] == "pdf":
            continue
        total += 1
        want_c = canon_ws(want)
        ours += extract_document(p["html"])["text"] == want_c
        stripped = canon_ws(_h.unescape(_re.sub(r"<[^>]*>", " ", repair_markup(decode_bytes(p["html"])))))
        naive += stripped == want_c
    assert total > 100
    assert ours / total >= 0.85
    assert naive / total <= 0.05
    assert ours / total - naive / total >= 0.8
