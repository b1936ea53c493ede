"""Pure-Python span data model: geometry constants, offset codec, rules.

No Spark imports — the kernel (pure per-document algorithms) depends only
on this module, so it stays importable and unit-testable without a JVM or
pyspark installed (CLAUDE.md: "kernel.py is pure Python, no Spark
imports"). Spark schemas live in pdfredact_spark.model, which re-exports
everything here for backwards compatibility.

Geometry encoding and kind semantics: see pdfredact_spark.model docstring
and FIXTURES.md §2.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Geometry constants (fixture font model, FIXTURES.md §2)
# ---------------------------------------------------------------------------
GLYPH_W = 7.0
GLYPH_H = 12.0
DEFAULT_PAGE_W = 612.0
DEFAULT_PAGE_H = 792.0
TOP_MARGIN = 50.0
ROW_PITCH = 20.0

PAGE_BASE = 200_000_000  # offset stride per page (int32-safe for <=10 pages)
ROW_BASE = 100_000       # offset stride per row
DECI = 10                # deci-points: offset x component = round(10*x)
# one glyph advances DECI*GLYPH_W = 70 offset units
GLYPH_STRIDE = int(DECI * GLYPH_W)

# Reference algorithm constants (PdfPigTextLocator.cs:17,475-482)
LINE_TOL = 2.0
WORD_GAP_MULT = 1.5
WORD_H_MULT = 0.5
DIGIT_GAP_MULT = 5.0
DIGIT_H_MULT = 2.5
MIN_GAP = 2.0
MASK_PADDING = 1.0  # PdfSharpMaskApplicator.cs:17

# ---------------------------------------------------------------------------
# Rules (reference Models/RedactionRule.cs:8-44)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Rule:
    """A redaction rule. Defaults mirror RedactionRule.cs:19,24,43:
    is_regex=False, case_sensitive=True, fragment_aware=None (tri-state auto).

    ``regex_flags`` mirrors the explicit RegexOptions override
    (RedactionRule.cs:30-37 / PdfPigTextLocator.cs:262-278): when set, it
    REPLACES the defaults (so an explicit value without IGNORECASE makes a
    case_sensitive=False rule case-sensitive again, exactly like the
    reference). Use Python ``re`` flags (re.IGNORECASE | re.MULTILINE ...).
    """

    pattern: str
    is_regex: bool = False
    case_sensitive: bool = True
    description: str | None = None
    fragment_aware: bool | None = None
    regex_flags: int | None = None

    def use_fragment_mode(self) -> bool:
        """Tri-state router (PdfPigTextLocator.cs:138-159): explicit value
        wins; auto = False for regex; for literals True iff every char is a
        Unicode-Nd digit or one of '-', ' ', '/'.

        char.IsDigit in .NET tests Unicode category Nd; Python str.isdigit()
        is broader (includes No), so we test the category explicitly
        (SURVEY.md F3 parity note).
        """
        if self.fragment_aware is not None:
            return self.fragment_aware
        if self.is_regex:
            return False
        return bool(self.pattern) and all(
            unicodedata.category(c) == "Nd" or c in "- /" for c in self.pattern
        )


def encode_offset(page: int, row: int, x: float) -> int:
    """FIXTURES.md §2 geometry->offset encoding."""
    return page * PAGE_BASE + row * ROW_BASE + int(round(DECI * x))


def decode_offset(offset: int) -> tuple[int, int, float]:
    """offset -> (page, row, x)."""
    page = offset // PAGE_BASE
    rem = offset % PAGE_BASE
    row = rem // ROW_BASE
    x = (rem % ROW_BASE) / DECI
    return page, row, x


def row_top(row: int, page_h: float = DEFAULT_PAGE_H) -> float:
    return page_h - TOP_MARGIN - row * ROW_PITCH


def page_marker_text(page: int, rotation: int = 0,
                     width: float = DEFAULT_PAGE_W,
                     height: float = DEFAULT_PAGE_H) -> str:
    return f"<page>:{page}:{rotation}:{width:g}:{height:g}"


def parse_page_marker(text: str) -> tuple[int, int, float, float]:
    """-> (page_number, rotation, width, height)."""
    _, num, rot, w, h = text.split(":")
    return int(num), int(rot), float(w), float(h)
