"""Property-based kernel invariants (hypothesis) + edge cases.

Invariants that must hold for ANY document and rule set:
- output spans sorted by offset, deterministic tie-break
- mask count == located region count
- uncovered text survives verbatim (no content invented or lost beyond
  covered glyphs and cut-adjacent whitespace)
- no-match rules are identity
- redaction is deterministic (same input -> same output)
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfredact_spark.fixtures import demo_doc, page_span, text_span
from pdfredact_spark.kernel import locate_document, redact_document
from pdfredact_spark.model import Rule

WORDS = ["alpha", "beta", "gamma", "123-45-6789", "x9", "delta,", "42", "a-b"]
# Unicode Nd digits (Arabic-Indic) + tab-bearing words for the hard cases
HARD_WORDS = WORDS + ["١٢٣", "7", "-", "9/9", "x\ty"]


@st.composite
def documents(draw, hard: bool = False):
    vocab = HARD_WORDS if hard else WORDS
    n_pages = draw(st.integers(1, 3)) if hard else 1
    spans = []
    for pg in range(1, n_pages + 1):
        spans.append(page_span(pg))
        for r in range(draw(st.integers(1, 6))):
            n_words = draw(st.integers(1, 8))
            line = " ".join(draw(st.sampled_from(vocab)) for _ in range(n_words))
            spans.append(text_span(pg, r, 72.0, line))
        if hard and draw(st.booleans()):
            m = text_span(pg, 9, 400.0, "")
            m["kind"] = "media"
            m["media_ref"] = f"img:{pg}"
            spans.append(m)
    return {"doc_id": "prop-1", "spans": spans}


@st.composite
def rules(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return Rule(draw(st.sampled_from(WORDS)))
    if kind == 1:
        return Rule(r"\d{3}-\d{2}-\d{4}", is_regex=True)
    if kind == 2:
        return Rule(
            draw(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=4)),
            case_sensitive=draw(st.booleans()),
        )
    # Whitespace-boundary patterns: leading / trailing / only spaces.
    # These exercise covered_range's match-lands-on-a-space handling
    # (the fast path must snap to the word-map semantics, not rfind).
    pat = draw(
        st.sampled_from(
            [" alpha", "beta ", " gamma ", " ", "  ", r"\s+", r" \w+", r"\w+ ", r" ?beta"]
        )
    )
    is_re = pat.startswith(("\\", " ?")) or "\\" in pat
    return Rule(pat, is_regex=is_re)


@settings(max_examples=150, deadline=None)
@given(doc=documents(), rs=st.lists(rules(), min_size=0, max_size=3))
def test_redaction_invariants(doc, rs):
    out, regions, hits = redact_document(doc["doc_id"], doc["spans"], rs)
    out2, _, _ = redact_document(doc["doc_id"], doc["spans"], rs)
    assert out == out2  # deterministic

    offsets = [s["offset"] for s in out]
    assert offsets == sorted(offsets)

    masks = [s for s in out if s["kind"] == "mask"]
    assert len(masks) == hits == len(regions)
    assert len({m["media_ref"] for m in masks}) == len(masks)  # unique ids

    # no content invented: every surviving text span is a substring of some
    # original span's text
    originals = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
    for s in out:
        if s["kind"] == "text":
            assert any(s["text"] in o for o in originals), s

    if not regions:
        assert [(s["kind"], s["text"], s["media_ref"]) for s in out] == [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(doc["spans"], key=lambda x: (x["offset"], x["kind"], x["media_ref"], x["text"]))
        ]


@settings(max_examples=60, deadline=None)
@given(doc=documents())
def test_locate_apply_equals_fused(doc):
    from pdfredact_spark.kernel import apply_plan

    rs = [Rule(r"\d{3}-\d{2}-\d{4}", is_regex=True), Rule("alpha")]
    regions = locate_document(doc["doc_id"], doc["spans"], rs)
    fused, _, _ = redact_document(doc["doc_id"], doc["spans"], rs)
    applied, n = apply_plan(doc["doc_id"], doc["spans"], regions)
    assert n == len(regions)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in applied] == [
        (s["kind"], s["text"], s["media_ref"]) for s in fused
    ]


# ---------------------------------------------------------------------------
# Edge cases
# ---------------------------------------------------------------------------
def test_zero_region_passthrough_verbatim_in_both_paths():
    """File.Copy parity (ApplyCommand.cs:65-69): a doc whose spans are NOT
    in canonical order must round-trip VERBATIM through both the fused
    path and the decoupled apply when nothing matches. The paths used to
    diverge (fused verbatim, apply re-sorted), so `redact --save-plan`
    reordered zero-region docs that plain `redact` passed through."""
    from pdfredact_spark.kernel import apply_plan

    spans = [text_span(1, 2, 72.0, "beta"), page_span(1), text_span(1, 0, 72.0, "alpha")]
    key = lambda ss: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ss]
    assert key(spans) != key(sorted(spans, key=lambda s: s["offset"]))  # really out of order

    fused, regions, hits = redact_document("oo-1", spans, [Rule("zzz-no-match")])
    assert regions == [] and hits == 0
    applied, n = apply_plan("oo-1", spans, [])
    assert n == 0
    assert key(fused) == key(spans)
    assert key(applied) == key(spans)


def test_unicode_nd_digits_fragment_router():
    # Arabic-Indic digits are Unicode Nd -> numeric-literal auto-detect fires
    assert Rule("١٢٣").use_fragment_mode() is True
    # superscript two is category No, NOT Nd (char.IsDigit parity)
    assert Rule("²²").use_fragment_mode() is False


def test_overlapping_rules_interval_merge():
    # two rules covering overlapping glyph ranges: both masks emitted,
    # intervals merge without duplicating surviving text
    doc = {"doc_id": "ov-1", "spans": [page_span(1), text_span(1, 0, 72.0, "abcdef ghi")]}
    rs = [Rule("abcdef"), Rule("abc")]  # abc overlaps abcdef's word
    out, regions, _ = redact_document("ov-1", doc["spans"], rs)
    masks = [s for s in out if s["kind"] == "mask"]
    assert len(masks) == 2
    texts = [s["text"] for s in out if s["kind"] == "text"]
    assert texts == ["ghi"]


def test_doc_without_page_marker():
    doc = {"doc_id": "np-1", "spans": [text_span(1, 0, 72.0, "SSN: 123-45-6789")]}
    out, regions, hits = redact_document("np-1", doc["spans"], [Rule(r"\d{3}-\d{2}-\d{4}", is_regex=True)])
    assert hits == 1
    assert any(s["kind"] == "mask" for s in out)
    assert regions[0].page == 1  # implicit page 1


def test_empty_and_space_only_spans():
    doc = {
        "doc_id": "sp-1",
        "spans": [page_span(1), text_span(1, 0, 72.0, "   "), text_span(1, 1, 72.0, "")],
    }
    out, _, hits = redact_document("sp-1", doc["spans"], [Rule("x")])
    assert hits == 0
    assert len(out) == 3  # identity (no matches)


def test_case_insensitive_regex():
    doc = demo_doc("ci-1")
    out, regions, _ = redact_document(
        "ci-1", doc["spans"], [Rule("EMAIL:", is_regex=True, case_sensitive=False)]
    )
    assert len(regions) == 1
    assert regions[0].matched_text == "Email:"


def test_match_spanning_multiple_words():
    # a regex with a space crosses word boundaries -> region covers both
    # words (one line -> one region)
    doc = {"doc_id": "mw-1", "spans": [page_span(1), text_span(1, 0, 72.0, "top secret stuff")]}
    out, regions, _ = redact_document("mw-1", doc["spans"], [Rule(r"top secret", is_regex=True)])
    assert len(regions) == 1
    texts = [s["text"] for s in out if s["kind"] == "text"]
    assert texts == ["stuff"]


@st.composite
def hard_rules(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        # numeric literals auto-route to the fragment tokenizer (P2)
        return Rule(draw(st.sampled_from(["42", "123", "١٢٣", "9/9", "-", "7"])))
    if kind == 1:
        return Rule(
            draw(st.sampled_from([r"\d+", r"[١٢٣]+", r"\S+\s\S+", r"x.y"])),
            is_regex=True,
        )
    if kind == 2:
        return Rule(draw(st.sampled_from(HARD_WORDS)),
                    fragment_aware=draw(st.sampled_from([None, True, False])))
    return Rule(draw(st.sampled_from([" alpha", "beta ", "\t", "a-b"])))


@settings(max_examples=100, deadline=None)
@given(doc=documents(hard=True), rs=st.lists(hard_rules(), min_size=1, max_size=3))
def test_invariants_on_hard_docs(doc, rs):
    """Multi-page docs with media spans, Unicode-Nd digits, tabs, and
    fragment-aware rules: determinism + mask accounting + no invented
    content must hold (and fast == general, checked by the kernel's own
    fast-path dispatch through redact_document)."""
    out, regions, hits = redact_document(doc["doc_id"], doc["spans"], rs)
    out2, _, _ = redact_document(doc["doc_id"], doc["spans"], rs)
    assert out == out2
    masks = [s for s in out if s["kind"] == "mask"]
    assert len(masks) == hits == len(regions)
    assert len({m["media_ref"] for m in masks}) == len(masks)
    originals = [s["text"] for s in doc["spans"] if s["kind"] == "text"]
    for s in out:
        if s["kind"] == "text":
            assert any(s["text"] in o for o in originals), s
    # media spans pass through untouched
    in_media = sorted(s["media_ref"] for s in doc["spans"] if s["kind"] == "media")
    out_media = sorted(s["media_ref"] for s in out if s["kind"] == "media")
    assert in_media == out_media


@settings(max_examples=60, deadline=None)
@given(doc=documents(hard=True), rs=st.lists(hard_rules(), min_size=1, max_size=2))
def test_fast_equals_general_on_hard_docs(doc, rs):
    import pdfredact_spark.kernel as K

    out_fast, _, h_f = K.redact_document(doc["doc_id"], doc["spans"], rs)
    real = K._locate_words_fast
    K._locate_words_fast = lambda *a, **k: None
    try:
        out_gen, _, h_g = K.redact_document(doc["doc_id"], doc["spans"], rs)
    finally:
        K._locate_words_fast = real
    assert h_f == h_g
    assert out_fast == out_gen


@settings(max_examples=120, deadline=None)
@given(doc=documents(), rs=st.lists(rules(), min_size=1, max_size=3))
def test_fast_path_equals_general_on_random_docs(doc, rs):
    import pdfredact_spark.kernel as K

    out_fast, _, h_f = K.redact_document(doc["doc_id"], doc["spans"], rs)
    real = K._locate_words_fast
    K._locate_words_fast = lambda *a, **k: None
    try:
        out_gen, _, h_g = K.redact_document(doc["doc_id"], doc["spans"], rs)
    finally:
        K._locate_words_fast = real
    assert h_f == h_g
    assert out_fast == out_gen


def test_mega_doc_offsets_stay_int32():
    """Page 10 is row-capped so the biggest legal mega doc never exceeds
    the int32 offset field (10*PAGE_BASE + row*ROW_BASE + x overflows at
    page-10 rows >= 1475)."""
    from pdfredact_spark.fixtures import mega_doc

    d = mega_doc("big", 97_000)
    assert max(s["offset"] for s in d["spans"]) <= 2**31 - 1
