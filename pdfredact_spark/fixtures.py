"""Deterministic fixture corpus (FIXTURES.md §3) + scale-slice generator (§4).

Each fixture mirrors one reference test
(/root/reference/tests/PdfRedact.Core.Tests/*.cs or demo.sh) in the span-doc
data model. Expected outputs are derived here with plain string arithmetic —
independently of kernel.py — so the golden tests are honest.

Everything is seed-free deterministic: content is a function of doc ids and
loop indices only (no RNG, no wall clock).
"""

from __future__ import annotations

from pdfredact_spark.model import (
    GLYPH_STRIDE,
    PAGE_BASE,
    ROW_BASE,
    Rule,
    encode_offset,
    page_marker_text,
)


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": int(offset)}


def text_span(page: int, row: int, x: float, text: str) -> dict:
    return _span("text", text, "", encode_offset(page, row, x))


def page_span(page: int, rotation: int = 0) -> dict:
    return _span("page", page_marker_text(page, rotation), "", page * PAGE_BASE)


def mask_span(doc_id: str, page: int, seq: int, offset: int) -> dict:
    return _span("mask", "", f"mask:{doc_id}:{page}:{seq}", offset)


def boxed_digits(page: int, row: int, digits: str, spacing: float, x0: float = 100.0) -> list[dict]:
    """One single-glyph text span per digit (boxed form fields), mirroring
    CreatePdfWithBoxedDigits (FragmentAwareTextLocatorTests.cs:279-298)."""
    return [text_span(page, row, x0 + i * spacing, d) for i, d in enumerate(digits)]


# ---------------------------------------------------------------------------
# fx-09 demo document (demo.sh:13-27)
# ---------------------------------------------------------------------------
PAGE1_LINES = [
    "This is a test document.",
    "It contains sensitive information like SSN: 123-45-6789.",
    "Email: john.doe@example.com",
    "Credit Card: 4532-1234-5678-9010",
    "This text should remain visible.",
]
PAGE2_LINES = [
    "Page 2 content",
    "More sensitive data: 987-65-4321",
]
SSN_RULE = Rule(pattern=r"\d{3}-\d{2}-\d{4}", is_regex=True)
EMAIL_LITERAL_RULE = Rule(pattern="Email:")  # auto fragment -> False (non-numeric)
DEMO_X = 72.0


def demo_doc(doc_id: str, rotation_page1: int = 0) -> dict:
    spans = [page_span(1, rotation_page1)]
    spans += [text_span(1, r, DEMO_X, t) for r, t in enumerate(PAGE1_LINES)]
    spans.append(page_span(2))
    spans += [text_span(2, r, DEMO_X, t) for r, t in enumerate(PAGE2_LINES)]
    return {"doc_id": doc_id, "spans": spans}


def _split_line_expected(
    doc_id: str, page: int, row: int, x: float, line: str, word: str, seq: int
) -> list[dict]:
    """Expected span pieces when exactly `word` (a whitespace-delimited word
    of `line`) is masked: pre-text, mask, post-text — offsets shifted by
    glyph cells, whitespace at the cut stripped."""
    start = line.index(word)
    end = start + len(word)
    base = encode_offset(page, row, x)
    out = []
    pre = line[:start].rstrip(" \t")
    if pre:
        lead = len(line[:start]) - len(line[:start].lstrip(" \t"))
        out.append(_span("text", pre.lstrip(" \t"), "", base + GLYPH_STRIDE * lead))
    out.append(mask_span(doc_id, page, seq, base + GLYPH_STRIDE * start))
    post = line[end:]
    stripped = post.lstrip(" \t")
    if stripped.rstrip(" \t"):
        lead = end + (len(post) - len(stripped))
        out.append(
            _span("text", stripped.rstrip(" \t"), "", base + GLYPH_STRIDE * lead)
        )
    return out


def _sorted_spans(spans: list[dict]) -> list[dict]:
    return sorted(
        spans, key=lambda s: (s["offset"], s["kind"], s["media_ref"], s["text"])
    )


# ---------------------------------------------------------------------------
# Fixture registry: id -> (doc, rules, expected_out_spans | 'error' | None)
# ---------------------------------------------------------------------------
def _boxed_fixture(fid: str, digits: str, rule: Rule, spacing: float = 15.0,
                   masked: bool = True) -> dict:
    doc = {"doc_id": fid, "spans": [page_span(1)] + boxed_digits(1, 0, digits, spacing)}
    if masked:
        expected = _sorted_spans(
            [page_span(1), mask_span(fid, 1, 1, encode_offset(1, 0, 100.0))]
        )
    else:
        expected = _sorted_spans(list(doc["spans"]))
    return {"doc": doc, "rules": [rule], "expected": expected}


def all_fixtures() -> dict[str, dict]:
    fx: dict[str, dict] = {}

    # fx-01..fx-05: boxed-digit fragment tests (FragmentAwareTextLocatorTests.cs)
    fx["fx-01"] = _boxed_fixture("fx-01", "1234", Rule("1234", fragment_aware=True))
    fx["fx-02"] = _boxed_fixture("fx-02", "5678", Rule(r"\d{4}", is_regex=True, fragment_aware=True))
    fx["fx-03"] = _boxed_fixture("fx-03", "9876", Rule(r"\d{4}", is_regex=True, fragment_aware=True))
    fx["fx-04"] = _boxed_fixture("fx-04", "4321", Rule("4321", fragment_aware=False), masked=False)
    fx["fx-05"] = _boxed_fixture("fx-05", "123456789", Rule(r"\d{9}", is_regex=True, fragment_aware=True))

    # fx-06: two boxed sequences on different lines (:186-209)
    doc6 = {
        "doc_id": "fx-06",
        "spans": [page_span(1)]
        + boxed_digits(1, 0, "1234", 15.0)
        + boxed_digits(1, 1, "5678", 15.0),
    }
    fx["fx-06"] = {
        "doc": doc6,
        "rules": [Rule(r"\d{4}", is_regex=True, fragment_aware=True)],
        "expected": _sorted_spans(
            [
                page_span(1),
                mask_span("fx-06", 1, 1, encode_offset(1, 0, 100.0)),
                mask_span("fx-06", 1, 2, encode_offset(1, 1, 100.0)),
            ]
        ),
    }

    # fx-07: mixed fragment + word-based rules (:211-246)
    doc7 = {
        "doc_id": "fx-07",
        "spans": [page_span(1), text_span(1, 0, 100.0, "CONFIDENTIAL")]
        + boxed_digits(1, 1, "9876", 15.0),
    }
    fx["fx-07"] = {
        "doc": doc7,
        "rules": [
            Rule(r"\d{4}", is_regex=True, fragment_aware=True),
            Rule("CONFIDENTIAL", fragment_aware=False),
        ],
        # W6 apply order: CONFIDENTIAL row (higher y) -> seq 1, digits -> seq 2.
        "expected": _sorted_spans(
            [
                page_span(1),
                mask_span("fx-07", 1, 1, encode_offset(1, 0, 100.0)),
                mask_span("fx-07", 1, 2, encode_offset(1, 1, 100.0)),
            ]
        ),
    }

    # fx-08: no over-redaction — digits and text on the same line (:248-274)
    doc8 = {
        "doc_id": "fx-08",
        "spans": [
            page_span(1),
            text_span(1, 0, 50.0, "ID:"),
            *boxed_digits(1, 0, "1234", 20.0),
            text_span(1, 0, 200.0, "- Active"),
        ],
    }
    fx["fx-08"] = {
        "doc": doc8,
        "rules": [Rule(r"\d{4}", is_regex=True, fragment_aware=True)],
        "expected": _sorted_spans(
            [
                page_span(1),
                text_span(1, 0, 50.0, "ID:"),
                mask_span("fx-08", 1, 1, encode_offset(1, 0, 100.0)),
                text_span(1, 0, 200.0, "- Active"),
            ]
        ),
    }

    # fx-09: demo doc + SSN regex (demo.sh:30-41)
    doc9 = demo_doc("fx-09")
    exp9 = [page_span(1), page_span(2)]
    exp9 += [text_span(1, r, DEMO_X, t) for r, t in enumerate(PAGE1_LINES) if r not in (1,)]
    exp9 += _split_line_expected("fx-09", 1, 1, DEMO_X, PAGE1_LINES[1], "123-45-6789.", 1)
    exp9 += [text_span(2, 0, DEMO_X, PAGE2_LINES[0])]
    exp9 += _split_line_expected("fx-09", 2, 1, DEMO_X, PAGE2_LINES[1], "987-65-4321", 1)
    fx["fx-09"] = {"doc": doc9, "rules": [SSN_RULE], "expected": _sorted_spans(exp9)}

    # fx-10: demo doc + literal 'Email:' (demo.sh:44-48); auto -> word-based
    doc10 = demo_doc("fx-10")
    exp10 = [page_span(1), page_span(2)]
    exp10 += [text_span(1, r, DEMO_X, t) for r, t in enumerate(PAGE1_LINES) if r not in (2,)]
    exp10 += _split_line_expected("fx-10", 1, 2, DEMO_X, PAGE1_LINES[2], "Email:", 1)
    exp10 += [text_span(2, r, DEMO_X, t) for r, t in enumerate(PAGE2_LINES)]
    fx["fx-10"] = {"doc": doc10, "rules": [EMAIL_LITERAL_RULE], "expected": _sorted_spans(exp10)}

    # fx-11: rotated page fail-fast (PdfSharpMaskApplicator.cs:95-102)
    fx["fx-11"] = {
        "doc": demo_doc("fx-11", rotation_page1=90),
        "rules": [SSN_RULE],
        "expected": "error",
    }

    # fx-12: flatten mode (docs/FLATTEN_MODE.md:7-11)
    fx["fx-12"] = {
        "doc": demo_doc("fx-12"),
        "rules": [SSN_RULE],
        "flatten": True,
        "expected": _sorted_spans(
            [
                page_span(1),
                _span("media", "", "flat:fx-12:1", 1 * PAGE_BASE + 1),
                page_span(2),
                _span("media", "", "flat:fx-12:2", 2 * PAGE_BASE + 1),
            ]
        ),
    }

    # fx-15: empty doc + no-match/no-rules identity (RedactionModelTests.cs:7-43,
    # PdfPigTextLocator.cs:37-41, ApplyCommand.cs:65-69)
    doc15a = {"doc_id": "fx-15a", "spans": [page_span(1)]}
    doc15b = demo_doc("fx-15b")
    fx["fx-15a"] = {"doc": doc15a, "rules": [], "expected": _sorted_spans(doc15a["spans"])}
    fx["fx-15b"] = {"doc": doc15b, "rules": [], "expected": _sorted_spans(doc15b["spans"])}
    fx["fx-15c"] = {
        "doc": demo_doc("fx-15c"),
        "rules": [Rule("NO-SUCH-TEXT")],
        "expected": _sorted_spans(demo_doc("fx-15c")["spans"]),
    }

    # fx-16 (additive, north-rule interleaving): media spans pass through masking
    doc16 = demo_doc("fx-16")
    doc16["spans"].append(_span("media", "", "img:fx-16:1", encode_offset(1, 10, 0.0)))
    exp16 = [page_span(1), page_span(2), _span("media", "", "img:fx-16:1", encode_offset(1, 10, 0.0))]
    exp16 += [text_span(1, r, DEMO_X, t) for r, t in enumerate(PAGE1_LINES) if r not in (1,)]
    exp16 += _split_line_expected("fx-16", 1, 1, DEMO_X, PAGE1_LINES[1], "123-45-6789.", 1)
    exp16 += [text_span(2, 0, DEMO_X, PAGE2_LINES[0])]
    exp16 += _split_line_expected("fx-16", 2, 1, DEMO_X, PAGE2_LINES[1], "987-65-4321", 1)
    fx["fx-16"] = {"doc": doc16, "rules": [SSN_RULE], "expected": _sorted_spans(exp16)}

    return fx


# ---------------------------------------------------------------------------
# Multi-pattern rule set (README.md:81-87)
# ---------------------------------------------------------------------------
MULTI_RULES = [
    Rule(r"\d{3}-\d{2}-\d{4}", is_regex=True, description="SSN"),
    Rule(r"\d{4}-\d{4}-\d{4}-\d{4}", is_regex=True, description="credit card"),
    Rule(r"[\w.]+@[\w.]+", is_regex=True, description="email"),
]


# ---------------------------------------------------------------------------
# Scale slices (FIXTURES.md §4) — generated, never stored
# ---------------------------------------------------------------------------
_DIGIT_PERMS = [
    str.maketrans("0123456789", "0123456789"),
    str.maketrans("0123456789", "1234567890"),
    str.maketrans("0123456789", "2345678901"),
    str.maketrans("0123456789", "3456789012"),
    str.maketrans("0123456789", "4567890123"),
    str.maketrans("0123456789", "5678901234"),
    str.maketrans("0123456789", "6789012345"),
]


def corpus_doc(i: int, lines_mult: int = 1) -> dict:
    """Doc i = fx-09 content with digits permuted by i mod 7, plus one
    interleaved media span; doc_id = d{i:09d}. ``lines_mult`` repeats the
    line set on successive rows (heavier, more realistic page fill —
    real PDFs carry far more than 7 lines)."""
    doc_id = f"d{i:09d}"
    perm = _DIGIT_PERMS[i % 7]
    p1 = [t.translate(perm) for t in PAGE1_LINES] * lines_mult
    p2 = [t.translate(perm) for t in PAGE2_LINES] * lines_mult
    # row-overflow guard (round-5 review, the mega_doc precedent): row
    # 2000 of page 1 would ENCODE as page 2 row 0 (PAGE_BASE//ROW_BASE
    # rows per page) and silently collide with real page-2 spans
    if len(p1) + 1 >= 2000 or len(p2) >= 2000:
        raise ValueError(
            f"lines_mult={lines_mult} overflows the 2000-row page encoding"
        )
    spans = [page_span(1)]
    spans += [text_span(1, r, DEMO_X, t) for r, t in enumerate(p1)]
    spans.append(
        _span("media", "", f"img:{doc_id}:1", encode_offset(1, len(p1) + 1, 0.0))
    )
    spans.append(page_span(2))
    spans += [text_span(2, r, DEMO_X, t) for r, t in enumerate(p2)]
    return {"doc_id": doc_id, "spans": spans}


def mega_doc(doc_id: str, n_spans: int = 20_000) -> dict:
    """Skew probe (fx-13 analog): one document with up to ~97k text spans,
    laid out 5 spans per row x 2000 rows per page across up to 10 pages.
    The int32 offset encoding caps page 10 at row 1474 (10*PAGE_BASE +
    1475*ROW_BASE + max x-component exceeds 2^31-1; row 1474's max
    offset is 2,147,477,000 < 2^31-1 — round-5 review fixed the
    off-by-one), so the true doc capacity is 9*2000*5 + 1475*5 =
    97,375 spans — NOT the 100k the page-count bound alone suggests."""
    spans: list[dict] = []
    per_row = 5
    rows_per_page = PAGE_BASE // ROW_BASE  # 2000
    made = 0
    page = 0
    while made < n_spans:
        page += 1
        if page > 10:
            raise ValueError("int32 offset encoding caps a doc at 10 pages")
        page_rows = rows_per_page if page < 10 else 1475  # int32 guard
        spans.append(page_span(page))
        for row in range(page_rows):
            for j in range(per_row):
                line = PAGE1_LINES[made % len(PAGE1_LINES)]
                spans.append(text_span(page, row, 100.0 + j * 1900.0, line))
                made += 1
                if made >= n_spans:
                    return {"doc_id": doc_id, "spans": spans}
    return {"doc_id": doc_id, "spans": spans}


def corpus(n_docs: int, mega_every: int = 0, lines_mult: int = 1) -> "list[dict]":
    """Deterministic scale corpus; when mega_every>0 every k-th doc is a
    mega-doc skew probe."""
    docs = []
    for i in range(n_docs):
        if mega_every and i > 0 and i % mega_every == 0:
            docs.append(mega_doc(f"d{i:09d}"))
        else:
            docs.append(corpus_doc(i, lines_mult))
    return docs
