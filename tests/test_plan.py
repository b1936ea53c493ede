"""Plan-serializer round-trip tests — port of
/root/reference/tests/PdfRedact.Core.Tests/RedactionPlanSerializerTests.cs:8-113
and RedactionModelTests count/empty-plan facts.
"""

from __future__ import annotations

import json

import pytest

from pdfredact_spark.fixtures import SSN_RULE, demo_doc
from pdfredact_spark.kernel import locate_document
from pdfredact_spark.plan import load_plan, plan_to_dict, save_plan


def test_save_produces_camelcase_json(tmp_path):  # :8-53
    doc = demo_doc("fx-14")
    regions = locate_document("fx-14", doc["spans"], [SSN_RULE])
    path = str(tmp_path / "sub" / "plan.json")  # exercises mkdir -p semantics
    save_plan("fx-14", regions, path)
    raw = json.loads(open(path).read())
    assert raw["sourcePdfPath"] == "fx-14"
    assert raw["totalRedactions"] == len(regions) == 2
    keys = set(raw["regions"][0].keys())
    assert {"pageNumber", "x", "y", "width", "height", "matchedText",
            "rulePattern", "pageRotation"} <= keys


def test_load_round_trips_values(tmp_path):  # :55-102
    doc = demo_doc("fx-14")
    regions = locate_document("fx-14", doc["spans"], [SSN_RULE])
    path = str(tmp_path / "plan.json")
    save_plan("fx-14", regions, path)
    doc_id, loaded = load_plan(path)
    assert doc_id == "fx-14"
    assert plan_to_dict("fx-14", loaded) == plan_to_dict("fx-14", regions)


def test_missing_file_raises():  # :104-113
    with pytest.raises(FileNotFoundError):
        load_plan("/nonexistent/plan.json")


def test_empty_path_raises():
    with pytest.raises(ValueError):
        save_plan("x", [], "  ")


def test_total_redactions_count():  # RedactionModelTests.cs:7-27
    assert plan_to_dict("d", [])["totalRedactions"] == 0
    assert plan_to_dict("d", [])["regions"] == []


def test_null_json_raises_clean_error(tmp_path):
    # RedactionPlanSerializer.cs:75-79: a JSON `null` deserializes to no
    # plan -> InvalidOperationException("Failed to deserialize..."), never a
    # raw KeyError.
    path = str(tmp_path / "null.json")
    open(path, "w").write("null")
    with pytest.raises(ValueError, match="Failed to deserialize"):
        load_plan(path)


def test_missing_properties_take_model_defaults(tmp_path):
    # C# model initializers: Regions = new(), SourcePdfPath = string.Empty.
    path = str(tmp_path / "bare.json")
    open(path, "w").write("{}")
    doc_id, regions = load_plan(path)
    assert doc_id == ""
    assert regions == []


def test_region_missing_numeric_properties_default_to_zero(tmp_path):
    # C# System.Text.Json: missing value-type properties default to 0.
    path = str(tmp_path / "sparse.json")
    open(path, "w").write(
        '{"sourcePdfPath": "d", "regions": [{"pageNumber": 2}]}'
    )
    doc_id, regions = load_plan(path)
    r = regions[0]
    assert (r.page, r.x, r.y, r.width, r.height, r.rotation) == (2, 0.0, 0.0, 0.0, 0.0, 0)
