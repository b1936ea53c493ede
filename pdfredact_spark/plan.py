"""Redaction-plan JSON (serializer parity).

Re-creates JsonRedactionPlanSerializer (reference
src/PdfRedact.Core/Services/RedactionPlanSerializer.cs:28-82): camelCase
property names, indented JSON, mkdir -p on save, FileNotFoundError on
missing load. ``totalRedactions`` is a computed property
(Models/RedactionPlan.cs:21) and is emitted on save, recomputed on load.

The ``sourcePdfPath`` slot carries our doc_id (the document's identity in
the span table).
"""

from __future__ import annotations

import json
import os

from pdfredact_spark.kernel import Region


def plan_to_dict(doc_id: str, regions: list[Region]) -> dict:
    return {
        "sourcePdfPath": doc_id,
        "regions": [
            {
                "pageNumber": r.page,
                "x": r.x,
                "y": r.y,
                "width": r.width,
                "height": r.height,
                "matchedText": r.matched_text,
                "rulePattern": r.rule_pattern,
                "pageRotation": r.rotation,
            }
            for r in regions
        ],
        "totalRedactions": len(regions),
    }


def save_plan(doc_id: str, regions: list[Region], file_path: str) -> None:
    if not file_path or not file_path.strip():
        raise ValueError("File path cannot be null or empty")
    directory = os.path.dirname(file_path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    with open(file_path, "w", encoding="utf-8") as f:
        json.dump(plan_to_dict(doc_id, regions), f, indent=2)


def load_plan(file_path: str) -> tuple[str, list[Region]]:
    if not file_path or not file_path.strip():
        raise ValueError("File path cannot be null or empty")
    if not os.path.exists(file_path):
        raise FileNotFoundError(f"Plan file not found: {file_path}")
    with open(file_path, encoding="utf-8") as f:
        data = json.load(f)
    if not isinstance(data, dict):
        # Parity with RedactionPlanSerializer.cs:75-79: a JSON `null` (or
        # any non-object) deserializes to no plan -> one clean error, not a
        # raw KeyError/TypeError from the field access below.
        raise ValueError("Failed to deserialize redaction plan")
    raw_regions = data.get("regions") or []
    if not all(isinstance(r, dict) for r in raw_regions):
        # Per-element parity (round-5 review): `"regions": [null]` or a
        # non-object element must produce the same clean deserializer
        # error as a non-object document, not a raw AttributeError.
        raise ValueError("Failed to deserialize redaction plan")
    regions = [
        # Missing numeric properties default to 0, like the C# System.Text
        # .Json deserializer's value-type defaults — never a raw KeyError.
        Region(
            page=r.get("pageNumber", 0),
            x=r.get("x", 0.0),
            y=r.get("y", 0.0),
            width=r.get("width", 0.0),
            height=r.get("height", 0.0),
            matched_text=r.get("matchedText"),
            rule_pattern=r.get("rulePattern"),
            rotation=r.get("pageRotation", 0),
        )
        # Missing properties take the model defaults, like the C# plan's
        # `Regions = new()` / `SourcePdfPath = string.Empty` initializers.
        for r in raw_regions
    ]
    return data.get("sourcePdfPath", ""), regions
