"""Decoupled plan/apply path through Spark: locate -> plan JSON round-trip
-> geometric apply must equal the fused redact output (ApplyCommand parity),
including pass-through for docs without plans (S7) and out-of-range page
skipping (P5).
"""

from __future__ import annotations

from pdfredact_spark.fixtures import MULTI_RULES, SSN_RULE, corpus, demo_doc
from pdfredact_spark.pipeline import (
    apply_plans,
    docs_to_df,
    locate_regions,
    read_plans,
    redact,
    regions_to_plans,
)


def invariant_rows(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_plan_json_roundtrip_and_apply(spark, tmp_path):
    docs = corpus(12) + [demo_doc("pa-demo")]
    df = docs_to_df(spark, docs)
    plan_dir = str(tmp_path / "plans")

    regions = locate_regions(df, MULTI_RULES)
    regions_to_plans(regions).write.mode("overwrite").json(plan_dir)

    plans = read_plans(spark, plan_dir)
    assert plans.count() == len(docs)  # every doc has >= 1 match here
    row = plans.where("sourcePdfPath = 'pa-demo'").collect()[0]
    assert row["totalRedactions"] == len(row["regions"]) == 4  # SSN+CC+email p1, SSN p2

    applied, errs = apply_plans(df, plans)
    assert errs.count() == 0
    fused, _ = redact(df, MULTI_RULES)
    assert invariant_rows(applied) == invariant_rows(fused)


def test_apply_passthrough_without_plan(spark, tmp_path):
    """Docs absent from the plan copy through verbatim (S7)."""
    matched = demo_doc("with-plan")
    unmatched = demo_doc("no-plan")
    df = docs_to_df(spark, [matched, unmatched])
    plan_dir = str(tmp_path / "plans")
    regions = locate_regions(docs_to_df(spark, [matched]), [SSN_RULE])
    regions_to_plans(regions).write.mode("overwrite").json(plan_dir)

    applied, errs = apply_plans(df, read_plans(spark, plan_dir))
    got = invariant_rows(applied)
    assert errs.count() == 0
    # unmatched doc identical to input
    exp_unmatched = sorted(
        unmatched["spans"],
        key=lambda s: (s["offset"], s["kind"], s["media_ref"], s["text"]),
    )
    assert got["no-plan"] == [
        (s["kind"], s["text"], s["media_ref"]) for s in exp_unmatched
    ]
    # matched doc has masks
    assert any(k == "mask" for k, _, _ in got["with-plan"])


def test_apply_rotation_failfast_from_plan(spark, tmp_path):
    """A plan recorded against a rotated page fails at apply (P6) and the
    doc routes to the error output."""
    doc = demo_doc("rot-plan", rotation_page1=90)
    df = docs_to_df(spark, [doc])
    plan_dir = str(tmp_path / "plans")
    regions = locate_regions(df, [SSN_RULE])  # locate succeeds, stores rotation
    regions_to_plans(regions).write.mode("overwrite").json(plan_dir)

    applied, errs = apply_plans(df, read_plans(spark, plan_dir))
    err_rows = errs.collect()
    assert [r["doc_id"] for r in err_rows] == ["rot-plan"]
    assert "rotation" in err_rows[0]["error"].lower()
    assert applied.count() == 0


def test_apply_plans_differential_random(spark):
    """Decoupled Spark apply == kernel apply_plan on randomized docs."""
    import random

    from pdfredact_spark.fixtures import page_span, text_span
    from pdfredact_spark.kernel import apply_plan as k_apply
    from pdfredact_spark.kernel import locate_document

    rng = random.Random(77)
    vocab = ["Email:", "123-45-6789", "foo", "bar-1", "CONFIDENTIAL"]
    docs = []
    for i in range(60):
        spans = [page_span(1)]
        for r in range(rng.randint(1, 5)):
            spans.append(text_span(1, r, 72.0, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 7)))))
        docs.append({"doc_id": f"ap{i:04d}", "spans": spans})

    df = docs_to_df(spark, docs)
    regions = locate_regions(df, MULTI_RULES)
    plans = regions_to_plans(regions)
    applied, errs = apply_plans(df, plans)
    assert errs.count() == 0
    got = invariant_rows(applied)
    for d in docs:
        regs = locate_document(d["doc_id"], d["spans"], MULTI_RULES)
        exp, _ = k_apply(d["doc_id"], d["spans"], regs)
        assert got[d["doc_id"]] == [(s["kind"], s["text"], s["media_ref"]) for s in exp], d["doc_id"]


def test_malformed_plan_rows_quarantine_not_crash(spark, tmp_path):
    """A hand-edited/truncated plan with null coordinates must quarantine
    the affected doc, not kill the apply job (read_plans is a permissive
    nullable JSON schema)."""
    import json

    from pdfredact_spark.fixtures import corpus
    from pdfredact_spark.pipeline import apply_plans, docs_to_df, read_plans

    docs = docs_to_df(spark, corpus(3, mega_every=0))
    plan_dir = tmp_path / "plans"
    plan_dir.mkdir()
    rows = [
        {"sourcePdfPath": "d000000000",
         "regions": [{"pageNumber": 1, "x": None, "y": None, "width": None,
                      "height": None, "matchedText": None, "rulePattern": None,
                      "pageRotation": 0}],
         "totalRedactions": 1},
    ]
    (plan_dir / "p.json").write_text("\n".join(json.dumps(r) for r in rows))
    good, errors = apply_plans(docs, read_plans(spark, str(plan_dir)))
    err_rows = {r.doc_id: r.error for r in errors.collect()}
    good_ids = {r.doc_id for r in good.collect()}
    assert "d000000000" in err_rows and "TypeError" in err_rows["d000000000"]
    assert good_ids == {"d000000001", "d000000002"}  # pass-through intact


def test_duplicate_plans_quarantine_not_duplicate_output(spark):
    """Round-5 review: two plan rows for one sourcePdfPath (two plan runs
    appended into one dir) multiplied the doc through the left join —
    the output carried the doc TWICE. Duplicates now route the doc to
    the error output; unaffected docs still apply normally."""
    from pyspark.sql import functions as F

    from pdfredact_spark.fixtures import SSN_RULE, demo_doc
    from pdfredact_spark.pipeline import (
        apply_plans,
        docs_to_df,
        locate_regions,
        regions_to_plans,
    )

    docs = docs_to_df(spark, [demo_doc("dup-d"), demo_doc("ok-d")])
    plans = regions_to_plans(locate_regions(docs, [SSN_RULE]))
    dup = plans.where(F.col("sourcePdfPath") == "dup-d")
    good, errors = apply_plans(docs, plans.unionByName(dup))
    out_ids = [r["doc_id"] for r in good.collect()]
    assert sorted(out_ids) == ["ok-d"]  # dup-d not emitted (once or twice)
    err = {r["doc_id"]: r["error"] for r in errors.collect()}
    assert set(err) == {"dup-d"} and "2 plans" in err["dup-d"]


def test_load_plan_rejects_non_object_region_elements(tmp_path):
    """Round-5 review: '"regions": [null]' raised a raw AttributeError
    instead of the serializer's clean deserialize error (the documented
    RedactionPlanSerializer.cs:75-79 parity)."""
    import json

    import pytest

    from pdfredact_spark.plan import load_plan

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"sourcePdfPath": "d", "regions": [None]}))
    with pytest.raises(ValueError, match="Failed to deserialize"):
        load_plan(str(p))
    p.write_text(json.dumps({"sourcePdfPath": "d", "regions": [1]}))
    with pytest.raises(ValueError, match="Failed to deserialize"):
        load_plan(str(p))
