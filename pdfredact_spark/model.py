"""Data model: span schema, geometry<->offset encoding, rules.

The engine's input is an Iceberg-style table of interleaved text+media
documents (shape fixed by BASELINE.json ``input_hint``):

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int32>>

``kind`` is one of:

- ``'text'``  — a run of characters; ``text`` holds content, ``media_ref`` = ''.
- ``'media'`` — opaque binary reference (image/audio/...); ``text`` = ''.
- ``'page'``  — page marker opening each page; ``text`` =
  ``"<page>:<pageNumber>:<rotation>:<widthPt>:<heightPt>"`` so page bounds and
  the rotation fail-fast (reference PdfSharpMaskApplicator.cs:95-102) are
  representable without extra columns.
- ``'mask'``  — redaction output: replaces matched text; ``text`` = '' (the
  content is redacted), ``media_ref`` = ``mask:<doc>:<page>:<seq>`` where seq
  is the deterministic apply order (reference PdfSharpMaskApplicator.cs:65-68:
  Y desc, X asc within page).

Geometry encoding (FIXTURES.md §2)
----------------------------------
The reference computes over (x, y) glyph boxes in PDF points (bottom-left
origin); the span schema carries only ``offset:int32``:

    offset = page*200_000_000 + row_index*100_000 + round(10*x)

- ``row_index`` = line number top-to-bottom (0-based) on the page.
- glyphs follow a fixed font model: every glyph is GLYPH_W=7.0 pt wide and
  GLYPH_H=12.0 pt tall, characters within a text span laid out contiguously
  (char i occupies [x + 7i, x + 7(i+1))).  Whitespace inside a text span is
  layout (advances x) but is NOT a glyph — mirroring PdfPig's page.Letters,
  which only reports drawn glyphs.
- row_index maps to y:  top = page_height - TOP_MARGIN - row*ROW_PITCH,
  bottom = top - GLYPH_H.  Rows are 20pt apart so distinct rows always exceed
  the reference's 2.0pt line tolerance (PdfPigTextLocator.cs:17).

This is lossless for everything the reference algorithms consume: sort orders
(bottom-asc words / top-desc letters), gap thresholds, median glyph sizes,
and region rectangles all evaluate identically to real PDF geometry.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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
# Spark schemas (fixed/explicit — never inferred)
# ---------------------------------------------------------------------------
SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

SPAN_SCHEMA = SPAN_STRUCT  # alias

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT, False), False),
    ]
)

# Flat (exploded) span rows — the unit that crosses the Arrow boundary.
FLAT_SPAN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

# RedactionRegion analog (reference Models/RedactionRegion.cs:7-49).
REGION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("page", IntegerType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("width", DoubleType(), False),
        StructField("height", DoubleType(), False),
        StructField("matched_text", StringType(), True),
        StructField("rule_pattern", StringType(), True),
        StructField("page_rotation", IntegerType(), False),
    ]
)

# Per-partition lineage row (SURVEY.md §1.2 metrics table).
METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("doc_id_min", StringType(), True),
        StructField("doc_id_max", StringType(), True),
        StructField("n_docs", LongType(), False),
        StructField("n_spans", LongType(), False),
        StructField("n_rule_hits", LongType(), False),
        StructField("bytes_processed", LongType(), False),
        StructField("committed_at", StringType(), False),
    ]
)


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
