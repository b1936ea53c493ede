"""Pure-kernel golden tests: port of the reference's 16 xUnit facts
(/root/reference/tests/PdfRedact.Core.Tests/) onto the span data model,
plus the span-sequence invariant checks over the fixture corpus.

No Spark here — these validate the algorithms before any cluster concern.
"""

from __future__ import annotations

import pytest

from pdfredact_spark.fixtures import (
    MULTI_RULES,
    PAGE1_LINES,
    SSN_RULE,
    all_fixtures,
    corpus_doc,
    demo_doc,
    mega_doc,
)
from pdfredact_spark.kernel import (
    RotationError,
    locate_document,
    redact_document,
)
from pdfredact_spark.model import Rule


def invariant(spans: list[dict]) -> list[tuple]:
    """BASELINE.json per-row invariant: (kind, text, media_ref) in offset order."""
    return [
        (s["kind"], s["text"], s["media_ref"])
        for s in sorted(spans, key=lambda s: (s["offset"], s["kind"], s["media_ref"], s["text"]))
    ]


# ---------------------------------------------------------------------------
# FragmentAwareTextLocatorTests ports
# ---------------------------------------------------------------------------
def test_boxed_digits_literal_pattern_finds_match():  # :45-75
    fx = all_fixtures()["fx-01"]
    regions = locate_document("fx-01", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 1
    r = regions[0]
    assert r.page == 1
    assert r.matched_text == "1234"
    assert r.rule_pattern == "1234"
    assert r.width > 0 and r.height > 0


def test_boxed_digits_regex_pattern_finds_match():  # :77-106
    fx = all_fixtures()["fx-02"]
    regions = locate_document("fx-02", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 1
    assert regions[0].matched_text == "5678"
    assert regions[0].rule_pattern == r"\d{4}"


def test_boxed_digits_autodetect_numeric_pattern():  # :108-132
    fx = all_fixtures()["fx-03"]
    regions = locate_document("fx-03", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 1


def test_boxed_digits_disabled_fragment_aware_no_match():  # :134-158
    fx = all_fixtures()["fx-04"]
    regions = locate_document("fx-04", fx["doc"]["spans"], fx["rules"])
    assert regions == []


def test_ssn_pattern_finds_fragmented_digits():  # :160-184
    fx = all_fixtures()["fx-05"]
    regions = locate_document("fx-05", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 1
    assert regions[0].matched_text == "123456789"


def test_multiple_boxed_sequences_finds_all_matches():  # :186-209
    fx = all_fixtures()["fx-06"]
    regions = locate_document("fx-06", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 2


def test_mixed_content_fragment_aware_and_word_based():  # :211-246
    fx = all_fixtures()["fx-07"]
    regions = locate_document("fx-07", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 2
    digit = next(r for r in regions if r.matched_text == "9876")
    assert digit.width < 150, f"width {digit.width} suggests over-redaction"


def test_boxed_digits_does_not_over_redact():  # :248-274
    fx = all_fixtures()["fx-08"]
    regions = locate_document("fx-08", fx["doc"]["spans"], fx["rules"])
    assert len(regions) == 1
    assert regions[0].matched_text == "1234"
    assert regions[0].width < 150


# ---------------------------------------------------------------------------
# RedactionModelTests ports (:7-99)
# ---------------------------------------------------------------------------
def test_empty_rules_returns_empty_plan():  # PdfPigTextLocator.cs:37-41
    doc = demo_doc("m-1")
    assert locate_document("m-1", doc["spans"], []) == []


def test_rule_defaults():  # RedactionRule.cs:19,24 defaults
    r = Rule("abc")
    assert r.is_regex is False
    assert r.case_sensitive is True
    assert r.fragment_aware is None


def test_fragment_mode_router():  # PdfPigTextLocator.cs:138-159
    assert Rule("123-45-6789").use_fragment_mode() is True  # numeric literal
    assert Rule("12/34 56").use_fragment_mode() is True
    assert Rule("Email:").use_fragment_mode() is False  # non-numeric literal
    assert Rule(r"\d{4}", is_regex=True).use_fragment_mode() is False  # regex auto
    assert Rule(r"\d{4}", is_regex=True, fragment_aware=True).use_fragment_mode() is True
    assert Rule("1234", fragment_aware=False).use_fragment_mode() is False


def test_case_insensitive_literal():
    doc = demo_doc("m-2")
    regions = locate_document(
        "m-2", doc["spans"], [Rule("EMAIL:", case_sensitive=False)]
    )
    assert len(regions) == 1
    assert regions[0].matched_text == "EMAIL:"


def test_literal_non_overlapping_scan():  # PdfPigTextLocator.cs:246-256
    from pdfredact_spark.kernel import find_matches

    # "aaaa" with pattern "aa" -> 2 non-overlapping hits, resume at +len
    assert find_matches("aaaa", Rule("aa")) == [(0, 2, "aa"), (2, 4, "aa")]


# ---------------------------------------------------------------------------
# Span-sequence golden equality over the fixture corpus (BASELINE.json invariant)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("fid", sorted(all_fixtures().keys()))
def test_fixture_span_sequence(fid):
    fx = all_fixtures()[fid]
    doc = fx["doc"]
    if fx["expected"] == "error":
        with pytest.raises(RotationError):
            redact_document(doc["doc_id"], doc["spans"], fx["rules"],
                            flatten=fx.get("flatten", False))
        return
    out, _, _ = redact_document(
        doc["doc_id"], doc["spans"], fx["rules"], flatten=fx.get("flatten", False)
    )
    assert invariant(out) == invariant(fx["expected"]), fid
    # masks also carry deterministic media_ref ordering
    assert [s["media_ref"] for s in out] == [s["media_ref"] for s in fx["expected"]]


def test_multi_pattern_demo():  # README.md:81-87 rule set over demo doc
    doc = demo_doc("mp-1")
    out, regions, hits = redact_document("mp-1", doc["spans"], MULTI_RULES)
    matched = sorted(r.matched_text for r in regions)
    assert "123-45-6789" in matched
    assert "4532-1234-5678-9010" in matched
    assert any("@" in m for m in matched)
    assert "987-65-4321" in matched
    # masks coexist ordered by offset
    kinds = [s["kind"] for s in out]
    assert kinds.count("mask") == len(regions)
    offs = [s["offset"] for s in out]
    assert offs == sorted(offs)


def test_mega_doc_correctness():  # fx-13 skew probe, correctness side
    doc = mega_doc("fx-13", n_spans=10_000)
    out, regions, hits = redact_document("fx-13", doc["spans"], [SSN_RULE])
    # every repeated copy of the SSN line yields exactly one mask
    n_ssn_lines = sum(
        1 for s in doc["spans"] if s["kind"] == "text" and "123-45-6789" in s["text"]
    )
    assert hits == n_ssn_lines
    assert sum(1 for s in out if s["kind"] == "mask") == n_ssn_lines


def test_corpus_doc_deterministic():
    a, b = corpus_doc(7), corpus_doc(7)
    assert a == b
    c = corpus_doc(8)
    assert c["spans"] != a["spans"]
    # the SSN survives digit permutation as a matchable pattern
    out, _, hits = redact_document(c["doc_id"], c["spans"], [SSN_RULE])
    assert hits >= 2  # one per page
    # media span passes through untouched
    assert any(s["kind"] == "media" for s in out)


def test_rotated_page_without_matches_passes_through():
    # rotation fail-fast only fires when a region lands on the rotated page
    # (PdfSharpMaskApplicator.cs drawing path, not the locator)
    doc = demo_doc("rot-1", rotation_page1=90)
    out, _, hits = redact_document("rot-1", doc["spans"], [Rule("NO-SUCH")])
    assert hits == 0
    assert invariant(out) == invariant(doc["spans"])


def test_explicit_regex_flags_override():  # PdfPigTextLocator.cs:262-278
    import re as _re

    from pdfredact_spark.kernel import find_matches

    # explicit override REPLACES defaults: case_sensitive=False alone would
    # add IGNORECASE, but an explicit flags value without it wins
    r = Rule("ABC", is_regex=True, case_sensitive=False, regex_flags=0)
    assert find_matches("abc ABC", r) == [(4, 7, "ABC")]
    # and an explicit IGNORECASE on a case-sensitive rule matches both
    r2 = Rule("ABC", is_regex=True, case_sensitive=True, regex_flags=_re.IGNORECASE)
    assert [m[2] for m in find_matches("abc ABC", r2)] == ["abc", "ABC"]


def test_rotation_failfast_only_for_regions_on_rotated_page():
    # PdfSharpMaskApplicator throws per-region: a doc whose ROTATED page has
    # no matches but whose normal page does is applied fine.
    doc = demo_doc("rot-2", rotation_page1=90)
    # 'Page' only matches on page 2 ("Page 2 content") via word branch...
    # use a pattern unique to page 2:
    out, regions, hits = redact_document(
        "rot-2", doc["spans"], [Rule("987-65-4321")]
    )
    assert hits == 1
    assert all(r.page == 2 for r in regions)
    assert any(s["kind"] == "mask" for s in out)


# ---------------------------------------------------------------------------
# Round-2 hardening regressions (whole-package review findings)
# ---------------------------------------------------------------------------
def test_empty_literal_pattern_matches_nothing():
    # str.find('') succeeds at every index with a zero skip advance — the
    # literal loop must not hang or emit matches for an empty pattern.
    doc = demo_doc("el-1")
    out, regions, hits = redact_document("el-1", doc["spans"], [Rule("")])
    assert hits == 0 and regions == []


def test_case_insensitive_fold_is_length_preserving():
    # 'İ' (U+0130) lowercases to TWO chars; naive str.lower() shifts every
    # match index after it and masks the wrong glyphs.
    from pdfredact_spark.fixtures import page_span, text_span

    doc = {
        "doc_id": "tf-1",
        "spans": [page_span(1), text_span(1, 0, 72.0, "İzmir SSN here")],
    }
    out, regions, _ = redact_document(
        "tf-1", doc["spans"], [Rule("ssn", case_sensitive=False)]
    )
    assert len(regions) == 1
    assert regions[0].matched_text == "ssn"
    texts = [s["text"] for s in out if s["kind"] == "text"]
    assert texts == ["İzmir", "here"]  # SSN masked, neighbors intact


def test_exotic_whitespace_takes_general_path():
    # \n and \xa0 are glyphs in the data model but separators to
    # str.split(): fast and general paths must agree (fast declines).
    from pdfredact_spark.fixtures import page_span, text_span

    doc = {
        "doc_id": "ws-2",
        "spans": [page_span(1), text_span(1, 0, 72.0, "a\n\nb secret x\xa0y")],
    }
    import pdfredact_spark.kernel as K

    out_f, reg_f, h_f = K.redact_document("ws-2", doc["spans"], [Rule("secret")])
    real = K._locate_words_fast
    K._locate_words_fast = lambda *a, **k: None
    try:
        out_g, reg_g, h_g = K.redact_document("ws-2", doc["spans"], [Rule("secret")])
    finally:
        K._locate_words_fast = real
    assert h_f == h_g == 1
    assert out_f == out_g


def test_zero_glyph_mask_uses_actual_page_height():
    # apply_plan on a tall page: a region covering no glyphs must place
    # its mask row using the page's DECLARED height, not US-Letter.
    from pdfredact_spark.kernel import Region, apply_plan
    from pdfredact_spark.model import PAGE_BASE

    tall_marker = {
        "kind": "page", "text": "<page>:1:0:612:2000", "media_ref": "",
        "offset": PAGE_BASE,
    }
    doc = [tall_marker]
    region = Region(page=1, x=100.0, y=88.0, width=50.0, height=12.0,
                    matched_text=None, rule_pattern=None, rotation=0)
    out, n = apply_plan("zg-1", doc, [region])
    assert n == 1
    mask = [s for s in out if s["kind"] == "mask"][0]
    # row = (2000 - 50 - (88+12)) / 20 = 92.5 -> round 92
    assert (mask["offset"] % PAGE_BASE) // 100_000 == 92


def test_band0_page_collision_covers_both_bands():
    # A stray band-0 span (implicit page 1) plus a real page 1: a plan
    # region for page 1 must scan glyphs from BOTH bands.
    from pdfredact_spark.fixtures import page_span, text_span
    from pdfredact_spark.kernel import Region, apply_plan
    from pdfredact_spark.model import GLYPH_H, GLYPH_W, PAGE_BASE, row_top

    stray = {"kind": "text", "text": "leak", "media_ref": "", "offset": 7200}
    doc = [stray, page_span(1), text_span(1, 0, 720.0, "safe")]
    top = row_top(0)
    region = Region(page=1, x=720.0 - 1, y=top - GLYPH_H - 1,
                    width=GLYPH_W * 4 + 2, height=GLYPH_H + 2,
                    matched_text=None, rule_pattern=None, rotation=0)
    out, n = apply_plan("b0-1", doc, [region])
    assert n == 1
    texts = [s["text"] for s in out if s["kind"] == "text"]
    # both spans share the same geometry; the page-1 region must cover
    # glyphs from BOTH offset bands (a number-keyed dict dropped one)
    assert texts == []


def test_flatten_band_follows_offsets_not_declared_number():
    # A marker DECLARING page 3 but stored in band 1 must keep its flat
    # media span in band 1 (teleporting it to band 3 would re-split onto
    # a phantom page).
    from pdfredact_spark.model import PAGE_BASE

    weird_marker = {"kind": "page", "text": "<page>:3:0:612:792",
                    "media_ref": "", "offset": PAGE_BASE}
    doc = [weird_marker,
           {"kind": "text", "text": "body", "media_ref": "", "offset": PAGE_BASE + 100}]
    out, _, _ = redact_document("fb-1", doc, [], flatten=True)
    media = [s for s in out if s["kind"] == "media"]
    assert len(media) == 1
    assert media[0]["offset"] // PAGE_BASE == 1  # stays in its real band
    assert media[0]["media_ref"] == "flat:fb-1:3"  # ref keeps declared number


def _raw_span(kind, text, offset, ref=""):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": offset}


def test_multiband_declared_height_fused_apply_parity():
    """Round-5 review: apply_plan extracted glyphs for ALL bands sharing
    a declared page number with the FIRST band's height, so a band
    declaring a different height got glyph tops shifted by the height
    delta and the decoupled apply covered different text than the fused
    path on the identical doc + plan. Fused == apply must hold on the
    multi-band malformed doc."""
    from pdfredact_spark.kernel import apply_plan, redact_document
    from pdfredact_spark.model import Rule
    from pdfredact_spark.spanmodel import PAGE_BASE, ROW_BASE, page_marker_text

    spans = [
        # band 0: implicit page 1, default height 792
        _raw_span("text", "zero SECRET here", 2 * ROW_BASE + 1000),
        # band 1: a marker also declaring page 1 but height 500
        _raw_span("page", page_marker_text(1, 0, 612, 500), PAGE_BASE),
        _raw_span("text", "deep SECRET down", PAGE_BASE + 3 * ROW_BASE + 1000),
    ]
    rule = Rule(pattern="SECRET")
    fused, regions, _ = redact_document("d", spans, [rule])
    assert len(regions) == 2  # one hit per band
    applied, n = apply_plan("d", spans, regions)
    assert n == 2
    key = lambda s: (s["kind"], s["text"], s["media_ref"], s["offset"])
    assert [key(s) for s in fused] == [key(s) for s in applied]
    # and the matched text is actually masked in the decoupled output
    assert all("SECRET" not in s["text"] for s in applied)


def test_apply_noglyph_mask_stays_in_actual_band():
    """Round-5 review: the no-glyph mask fallback derived the offset band
    from the region's DECLARED page number — teleporting the mask into
    an empty band (the flatten path documents the no-teleport rule) and
    overflowing int32 for an absurd declared number. The mask must land
    in the declaring marker's ACTUAL band."""
    from pdfredact_spark.kernel import Region, apply_plan
    from pdfredact_spark.spanmodel import PAGE_BASE, ROW_BASE, page_marker_text

    def region(page):
        return Region(page=page, x=400.0, y=100.0, width=50.0, height=10.0,
                      matched_text=None, rule_pattern=None, rotation=0)

    # marker in band 1 declares page number 5; region covers no glyphs
    spans = [
        _raw_span("page", page_marker_text(5, 0), PAGE_BASE),
        _raw_span("text", "hello", PAGE_BASE + 2 * ROW_BASE + 1000),
    ]
    out, n = apply_plan("d", spans, [region(5)])
    assert n == 1
    mask = next(s for s in out if s["kind"] == "mask")
    assert PAGE_BASE <= mask["offset"] < 2 * PAGE_BASE  # band 1, not 5

    # absurd declared number must not overflow the int32 offset column
    spans2 = [_raw_span("page", page_marker_text(999, 0), PAGE_BASE)]
    out2, n2 = apply_plan("d", spans2, [region(999)])
    assert n2 == 1
    mask2 = next(s for s in out2 if s["kind"] == "mask")
    assert mask2["offset"] < 2**31
    assert PAGE_BASE <= mask2["offset"] < 2 * PAGE_BASE
