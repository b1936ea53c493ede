"""Fast word-branch equivalence: the O(hits) segment-based locate path must
produce byte-identical redaction output and region geometry to the
unit-materializing general path on adversarial inputs — including
zero-width regexes, joiner-space literals, match-everything patterns,
irregular whitespace, multi-span rows, and the overlap-fallback case.
"""

from __future__ import annotations

import itertools

import pytest

import pdfredact_spark.kernel as K
from pdfredact_spark.fixtures import (
    corpus_doc,
    demo_doc,
    mega_doc,
    page_span,
    text_span,
)
from pdfredact_spark.model import Rule

RULE_SETS = [
    [Rule(r"\d{3}-\d{2}-\d{4}", is_regex=True)],
    [Rule("Email:"), Rule("content")],
    [Rule(r"[a-z]*e[a-z]*", is_regex=True)],
    [Rule(r"x*", is_regex=True)],  # zero-width matches
    [Rule(r"\S+ \S+", is_regex=True)],  # cross-word / cross-line matches
    [Rule(r"(?s).+", is_regex=True)],  # matches the entire search text
    [Rule("t", case_sensitive=False)],
    [Rule(" ")],  # literal space: matches every joiner
    # whitespace-boundary regressions: a match edge landing ON an inter-word
    # space must snap to the following/preceding word, and all-space matches
    # must cover nothing (covered_range word-map semantics)
    [Rule(" content"), Rule("Email: ")],
    [Rule(r" \S+", is_regex=True)],
    [Rule(r"\s+", is_regex=True)],
]

DOCS = [
    demo_doc("eq-1"),
    corpus_doc(3, 2),
    mega_doc("eq-m", 2000),
    {
        "doc_id": "eq-2",
        "spans": [
            page_span(1),
            text_span(1, 0, 72.0, "  leading   and   double  spaces "),
            text_span(1, 0, 500.0, "second span same row"),
            text_span(1, 1, 72.0, "tab\tseparated words"),
        ],
    },
    {
        "doc_id": "eq-3",
        "spans": [page_span(1), text_span(1, 0, 72.0, "   "), text_span(1, 1, 100.0, "x")],
    },
    {
        "doc_id": "eq-4",  # x-overlapping spans on one row -> fallback
        "spans": [page_span(1), text_span(1, 0, 100.0, "aaaa bbbb"), text_span(1, 0, 110.0, "cccc")],
    },
]


def _inv(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.mark.parametrize("di", range(len(DOCS)))
@pytest.mark.parametrize("ri", range(len(RULE_SETS)))
def test_fast_equals_general(di, ri, monkeypatch):
    doc, rules = DOCS[di], RULE_SETS[ri]
    out_fast, reg_f, h_f = K.redact_document(doc["doc_id"], doc["spans"], rules)
    monkeypatch.setattr(K, "_locate_words_fast", lambda *a, **k: None)
    out_gen, reg_g, h_g = K.redact_document(doc["doc_id"], doc["spans"], rules)
    assert h_f == h_g
    assert _inv(out_fast) == _inv(out_gen)
    kf = sorted((r.page, r.x, r.y, r.width, r.height, r.matched_text) for r in reg_f)
    kg = sorted((r.page, r.x, r.y, r.width, r.height, r.matched_text) for r in reg_g)
    assert kf == kg


def _cols(doc):
    _, texts, _, offsets = K.cols_from_spans(doc["spans"])
    return texts, offsets


def test_overlap_page_declines_fast_path():
    doc = DOCS[-1]
    pg = K.split_pages(doc["spans"])[0]
    texts, offsets = _cols(doc)
    assert K._locate_words_fast(texts, offsets, pg, [Rule("aaaa")]) is None


def test_space_boundary_covers_following_word_only():
    # Regression (ADVICE r1): regex/literal ' cd' on 'ab cd' must cover only
    # 'cd'; an all-space match must emit no region at all.
    doc = {"doc_id": "ws-1", "spans": [page_span(1), text_span(1, 0, 72.0, "ab cd")]}
    pg = K.split_pages(doc["spans"])[0]
    for rule in [Rule(" cd"), Rule(" cd", is_regex=True)]:
        texts, offsets = _cols(doc)
        fast = K._locate_words_fast(texts, offsets, pg, [rule])
        gen = K._locate_words_general(texts, offsets, pg, [rule])
        assert [(r.x, r.width, r.matched_text) for r in fast] == [
            (r.x, r.width, r.matched_text) for r in gen
        ]
        assert fast[0].matched_text == " cd"
        assert abs(fast[0].x - gen[0].x) < 1e-9
    for rule in [Rule(" ", is_regex=True), Rule(r"\s", is_regex=True)]:
        texts, offsets = _cols(doc)
        assert K._locate_words_fast(texts, offsets, pg, [rule]) == []
        assert K._locate_words_general(texts, offsets, pg, [rule]) == []
