"""End-to-end Spark pipeline tests: the fixture corpus through the
distributed engine must produce exactly the kernel/golden span sequences
(span-sequence equality on (kind, text, media_ref, order) — the
BASELINE.json invariant), plus error routing, flatten, locate parity and
mega-doc handling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdfredact_spark.fixtures import (
    MULTI_RULES,
    SSN_RULE,
    all_fixtures,
    corpus,
    demo_doc,
    mega_doc,
)
from pdfredact_spark.kernel import locate_document, redact_document
from pdfredact_spark.pipeline import (
    docs_to_df,
    locate_regions,
    redact,
    redact_with_hits,
    region_summary,
)


def invariant_rows(df):
    """doc_id -> [(kind, text, media_ref), ...] in offset order."""
    rows = df.collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in rows
    }


def expected_invariant(fx):
    return [(s["kind"], s["text"], s["media_ref"]) for s in fx["expected"]]


def test_fixture_corpus_through_spark(spark):
    fixtures = all_fixtures()
    plain = {k: v for k, v in fixtures.items()
             if v["expected"] != "error" and not v.get("flatten")}
    # group fixtures by rule set is unnecessary — run each fixture's rules on
    # its own single-doc frame, all unioned per rule family would complicate;
    # here we run per fixture (cheap at this size).
    for fid, fx in sorted(plain.items()):
        df = docs_to_df(spark, [fx["doc"]])
        out, errs = redact(df, fx["rules"])
        assert errs.count() == 0, fid
        got = invariant_rows(out)
        assert got[fx["doc"]["doc_id"]] == expected_invariant(fx), fid


def test_rotation_error_routes_doc_out(spark):
    fx = all_fixtures()["fx-11"]
    ok = demo_doc("ok-1")
    df = docs_to_df(spark, [fx["doc"], ok])
    out, errs = redact(df, fx["rules"])
    err_rows = errs.collect()
    assert [r["doc_id"] for r in err_rows] == ["fx-11"]
    assert "rotation" in err_rows[0]["error"].lower()
    got = invariant_rows(out)
    assert set(got) == {"ok-1"}  # whole rotated doc excluded from main output


def test_flatten_mode(spark):
    fx = all_fixtures()["fx-12"]
    df = docs_to_df(spark, [fx["doc"]])
    out, errs = redact(df, fx["rules"], flatten=True)
    got = invariant_rows(out)
    assert got["fx-12"] == expected_invariant(fx)


def test_empty_rules_identity(spark):
    """P1 empty-rules guard: identity spans, zero hits, no Python stage
    in the plan — and (round-5 review) a normalized (doc_id, spans)
    schema plus NULL-spans routing, instead of the old verbatim
    `return df` that leaked extra input columns and emitted garbage
    rows as clean docs."""
    doc = demo_doc("id-1")
    df = docs_to_df(spark, [doc]).withColumn("extra", F.lit(1))
    out, errs = redact(df, [])
    assert errs.count() == 0
    assert out.columns == ["doc_id", "spans"]  # extra column dropped
    got = out.collect()[0]
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["spans"]
    ] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in doc["spans"]
    ]
    # still the driver-side short-circuit: no Arrow/Python stage
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" not in plan


def test_empty_rules_routes_null_spans(spark):
    """Round-5 review: the empty-rules pass-through emitted NULL-spans
    garbage rows as CLEAN docs while every other path quarantines them."""
    df = spark.createDataFrame(
        [("good", [("text", "x", "", 200_000_720)]), ("nullrow", None)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out, errs = redact(df, [])
    assert {r["doc_id"] for r in out.collect()} == {"good"}
    err = {r["doc_id"]: r["error"] for r in errs.collect()}
    assert err == {"nullrow": "ValueError: spans column is null"}


def test_mega_split_routes_null_spans_and_zeroes_errored_hits(spark):
    """Round-5 review, two mega-path parity holes: (1) a NULL-spans row
    made BOTH mega filters NULL, silently dropping the doc from both
    outputs; (2) an errored mega doc kept n_rule_hits summed from its
    successful pages while the doc-grain path reports 0."""
    from pdfredact_spark.fixtures import page_span
    from pdfredact_spark.pipeline import redact_full

    rot = mega_doc("rot-mega", n_spans=6000)  # > MEGA_SPAN_THRESHOLD
    rot["spans"][0] = page_span(1, rotation=90)  # page 1 fails fast
    nullable = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    docs = docs_to_df(spark, [demo_doc("ok"), rot])
    null_row = spark.createDataFrame([("nullrow", None)], nullable)
    full = redact_full(
        docs.unionByName(null_row, allowMissingColumns=False),
        [SSN_RULE],
        mega_split=True,
    )
    rows = {r["doc_id"]: r for r in full.collect()}
    assert set(rows) == {"ok", "rot-mega", "nullrow"}  # nothing dropped
    assert rows["nullrow"]["error"] == "ValueError: spans column is null"
    assert rows["rot-mega"]["error"] is not None
    assert rows["rot-mega"]["n_rule_hits"] == 0  # doc-grain parity
    assert rows["ok"]["error"] is None


def test_mega_page_apply_quarantines_garbage(spark):
    """Round-5 review: the per-page mega redactor caught only
    RotationError — any other kernel exception from one garbage mega doc
    failed its task and, after retries, the whole job. It must route
    like the doc-grain path."""
    import pyarrow as pa

    from pdfredact_spark.pipeline import _make_page_apply

    fn = _make_page_apply([SSN_RULE], flatten=False)
    tbl = pa.table(
        {
            "doc_id": ["bad"],
            "band": [1],
            "kind": ["page"],
            "text": ["<page>:not-a-number"],
            "media_ref": [""],
            "offset": [200_000_000],
        }
    )
    out = fn(tbl)
    assert out.column("kind").to_pylist() == ["__error__"]
    assert "ValueError" in out.column("text").to_pylist()[0]


def test_locate_regions_matches_kernel(spark):
    docs = [demo_doc("ld-1"), demo_doc("ld-2")]
    df = docs_to_df(spark, docs)
    got = locate_regions(df, MULTI_RULES).collect()
    expected = []
    for d in docs:
        for r in locate_document(d["doc_id"], d["spans"], MULTI_RULES):
            expected.append(
                (d["doc_id"], r.page, r.x, r.y, r.width, r.height,
                 r.matched_text, r.rule_pattern, r.rotation)
            )
    got_t = sorted(
        (g["doc_id"], g["page"], g["x"], g["y"], g["width"], g["height"],
         g["matched_text"], g["rule_pattern"], g["page_rotation"])
        for g in got
    )
    assert got_t == sorted(expected)

    # per-page summary (console sink analog)
    summary = {(r["doc_id"], r["page"]): r["n_redactions"]
               for r in region_summary(locate_regions(df, MULTI_RULES)).collect()}
    assert summary[("ld-1", 1)] == 3  # SSN + CC + email on page 1
    assert summary[("ld-1", 2)] == 1


def test_corpus_matches_kernel_and_metrics(spark):
    docs = corpus(40, mega_every=0)
    df = docs_to_df(spark, docs)
    out, errs = redact_with_hits(df, [SSN_RULE])
    assert errs.count() == 0
    got = invariant_rows(out)
    hits = {r["doc_id"]: r["n_rule_hits"] for r in out.collect()}
    for d in docs:
        exp, _, n = redact_document(d["doc_id"], d["spans"], [SSN_RULE])
        assert got[d["doc_id"]] == [(s["kind"], s["text"], s["media_ref"]) for s in exp], d["doc_id"]
        assert hits[d["doc_id"]] == n


def test_mega_doc_through_spark(spark):
    """Skew probe: both the default (inline) and the page-fan-out
    (mega_split) paths produce exactly the kernel's span sequences."""
    docs = [mega_doc("mega-1", n_spans=12_000), demo_doc("small-1")]
    df = docs_to_df(spark, docs)
    expected = {}
    for d in docs:
        exp, _, _ = redact_document(d["doc_id"], d["spans"], [SSN_RULE])
        expected[d["doc_id"]] = [(s["kind"], s["text"], s["media_ref"]) for s in exp]

    for mega_split in (False, True):
        out, _ = redact(df, [SSN_RULE], mega_split=mega_split)
        got = invariant_rows(out)
        assert got == expected, f"mega_split={mega_split}"
    # the mega doc's work really was split across >1 page group
    n_bands = (
        df.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("doc_id") == "mega-1")
        .select(F.expr("s.offset div 200000000").alias("b"))
        .distinct()
        .count()
    )
    assert n_bands >= 2


def test_malformed_doc_routes_to_errors(spark):
    """Garbage rows (bad page marker) must route to the error output, not
    kill the job — a 10^12-doc corpus will contain them."""
    bad = {
        "doc_id": "bad-1",
        "spans": [
            {"kind": "page", "text": "<page>:not-a-number", "media_ref": "", "offset": 200_000_000},
            {"kind": "text", "text": "SSN: 123-45-6789", "media_ref": "", "offset": 200_000_720},
        ],
    }
    ok = demo_doc("ok-2")
    out, errs = redact(docs_to_df(spark, [bad, ok]), [SSN_RULE])
    err_rows = {r["doc_id"]: r["error"] for r in errs.collect()}
    assert set(err_rows) == {"bad-1"}
    assert "ValueError" in err_rows["bad-1"]
    assert set(invariant_rows(out)) == {"ok-2"}


def test_large_random_differential_vs_kernel(spark):
    """Differential test at a larger scale than the fixtures: 300 random
    docs (seeded), multi-rule set, distributed output must equal the pure
    kernel doc-for-doc."""
    import random

    from pdfredact_spark.fixtures import page_span, text_span

    rng = random.Random(1234)
    vocab = ["alpha", "beta", "123-45-6789", "Email:", "x-9", "CONFIDENTIAL",
             "987-65-4321", "4532-1234-5678-9010", "zzz", "a"]
    docs = []
    for i in range(300):
        spans = [page_span(1)]
        for r in range(rng.randint(1, 8)):
            line = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
            spans.append(text_span(1, r, 72.0, line))
        if rng.random() < 0.3:
            spans.append(page_span(2))
            spans.append(text_span(2, 0, 72.0, " ".join(rng.choice(vocab) for _ in range(5))))
        docs.append({"doc_id": f"rd{i:05d}", "spans": spans})

    out, errs = redact(docs_to_df(spark, docs), MULTI_RULES)
    assert errs.count() == 0
    got = invariant_rows(out)
    for d in docs:
        exp, _, _ = redact_document(d["doc_id"], d["spans"], MULTI_RULES)
        assert got[d["doc_id"]] == [(s["kind"], s["text"], s["media_ref"]) for s in exp], d["doc_id"]


def test_pyarrow_direct_scan_parity(spark, tmp_path):
    """The direct pyarrow read path (round 8): a bare parquet scan of the
    document schema is decoded inside the Python stage from a distributed
    (path, row_group) list — results must be IDENTICAL to the JVM-scan
    path, detection must refuse anything but a bare scan, and
    PDFREDACT_PYREAD=0 must disable it."""
    import os

    from pyspark.sql import functions as F

    from pdfredact_spark.fixtures import SSN_RULE, corpus, demo_doc
    from pdfredact_spark.pipeline import (
        _parquet_scan_files,
        docs_to_df,
        redact_full,
    )

    docs = corpus(60, mega_every=25)
    docs.append(demo_doc("rot-err", rotation_page1=90))
    mem_df = docs_to_df(spark, docs)
    p = str(tmp_path / "corpus")
    mem_df.repartition(5).write.parquet(p)
    scan_df = spark.read.parquet(p)

    files = _parquet_scan_files(scan_df)
    assert files and len(files) == 5, files
    # non-bare plans and disabled env must fall back
    assert _parquet_scan_files(scan_df.where(F.col("doc_id") > "a")) is None
    os.environ["PDFREDACT_PYREAD"] = "0"
    try:
        assert _parquet_scan_files(scan_df) is None
    finally:
        os.environ.pop("PDFREDACT_PYREAD", None)

    def key(rows):
        return {
            r["doc_id"]: (r["spans"], r["n_rule_hits"], r["error"])
            for r in rows
        }

    out = redact_full(scan_df, [SSN_RULE])
    # one (path, row_group) unit per task — a round-robin repartition
    # here clumped 4-6 files onto some tasks (5.7x soak straggler)
    assert out.rdd.getNumPartitions() == 5

    got = key(out.collect())
    want = key(redact_full(mem_df, [SSN_RULE]).collect())
    assert got == want
    # the rotated doc really exercised the error routing on the new path
    assert got["rot-err"][2] is not None and "rotation" in got["rot-err"][2].lower()
