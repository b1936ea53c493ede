"""Unit tests for the Arrow-native doc-map stage (pipeline._make_doc_map_arrow)
driven directly with pyarrow RecordBatches — no Spark session needed.

The null-offset convention for errored rows (a None in the ListArray
offsets marks that row's spans as null) is subtle; these tests pin it for
leading / trailing / all-error / interleaved batches, plus re-batched
tables whose ListArray values are larger than the batch slice.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdfredact_spark.fixtures import SSN_RULE, corpus_doc, demo_doc
from pdfredact_spark.kernel import redact_document
from pdfredact_spark.model import Rule
from pdfredact_spark.pipeline import _make_doc_map_arrow, _span_batch_cols

RULES = [SSN_RULE]


def _to_batch(docs: list[dict]) -> pa.RecordBatch:
    struct = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array([d["doc_id"] for d in docs], type=pa.string()),
            pa.array([d["spans"] for d in docs], type=pa.list_(struct)),
        ],
        names=["doc_id", "spans"],
    )


def _run(docs, rules=RULES):
    fn = _make_doc_map_arrow(rules, flatten=False)
    outs = list(fn(iter([_to_batch(docs)])))
    assert len(outs) == 1
    return outs[0].to_pylist()


def _expected(doc, rules=RULES):
    out, _, h = redact_document(doc["doc_id"], doc["spans"], rules)
    return out, h


def test_clean_batch_matches_dict_kernel():
    docs = [corpus_doc(i, 2) for i in range(5)] + [demo_doc("d-x")]
    rows = _run(docs)
    assert [r["doc_id"] for r in rows] == [d["doc_id"] for d in docs]
    for doc, row in zip(docs, rows):
        exp, h = _expected(doc)
        assert row["error"] is None
        assert row["n_rule_hits"] == h
        assert row["spans"] == exp


@pytest.mark.parametrize("err_pos", [0, 2, 4])
def test_error_row_is_null_spans(err_pos):
    docs = [corpus_doc(i, 2) for i in range(5)]
    docs[err_pos] = demo_doc("rot", rotation_page1=90)
    rows = _run(docs)
    for i, row in enumerate(rows):
        if i == err_pos:
            assert row["spans"] is None
            assert "rotation" in row["error"].lower()
            assert row["n_rule_hits"] == 0
        else:
            exp, h = _expected(docs[i])
            assert row["error"] is None
            assert row["spans"] == exp, i
            assert row["n_rule_hits"] == h


def test_all_error_batch():
    docs = [demo_doc(f"rot{i}", rotation_page1=90) for i in range(3)]
    rows = _run(docs)
    assert all(r["spans"] is None for r in rows)
    assert all(r["error"] for r in rows)


def test_interleaved_errors():
    docs = []
    for i in range(6):
        if i % 2:
            docs.append(demo_doc(f"rot{i}", rotation_page1=90))
        else:
            docs.append(corpus_doc(i, 2))
    rows = _run(docs)
    for i, row in enumerate(rows):
        if i % 2:
            assert row["spans"] is None and row["error"]
        else:
            exp, _ = _expected(docs[i])
            assert row["spans"] == exp


def test_empty_batch():
    rows = _run([])
    assert rows == []


def test_malformed_doc_routed_not_raised():
    bad = {
        "doc_id": "bad-1",
        "spans": [{"kind": "page", "text": "not-a-marker", "media_ref": "", "offset": 200000000}],
    }
    rows = _run([corpus_doc(0, 2), bad])
    assert rows[0]["error"] is None
    assert rows[1]["spans"] is None
    assert rows[1]["error"]  # ValueError routed, job not failed


def test_sliced_batch_values_are_trimmed():
    """A batch sliced from a larger table carries the FULL values buffer;
    _span_batch_cols must trim to the slice's offset range."""
    docs = [corpus_doc(i, 2) for i in range(6)]
    big = _to_batch(docs)
    sl = big.slice(2, 3)
    doc_ids, valid, bounds, kinds, texts, refs, offs, geom = _span_batch_cols(sl)
    assert doc_ids == [d["doc_id"] for d in docs[2:5]]
    assert valid == [True, True, True]
    assert bounds[0] == 0
    assert bounds[-1] == len(kinds) == len(texts) == len(refs) == len(offs)
    # the vectorized geometry is trimmed to the same slice and matches the
    # kernel's per-span computation
    from pdfredact_spark.model import PAGE_BASE as _PB
    from pdfredact_spark.spanmodel import DECI as _DECI, ROW_BASE as _RB
    bands, rws, x0s, clean = geom
    assert len(bands) == len(rws) == len(x0s) == len(clean) == bounds[-1]
    for off, band, row, x0 in zip(offs, bands, rws, x0s):
        assert band == off // _PB
        assert row == (off % _PB) // _RB
        assert x0 == ((off % _PB) % _RB) / _DECI
    n_expected = sum(len(d["spans"]) for d in docs[2:5])
    assert bounds[-1] == n_expected
    # and the full fn produces the right output for the slice
    fn = _make_doc_map_arrow(RULES, flatten=False)
    rows = list(fn(iter([sl])))[0].to_pylist()
    for doc, row in zip(docs[2:5], rows):
        exp, _ = _expected(doc)
        assert row["spans"] == exp


def test_flatten_mode_arrow():
    docs = [demo_doc("f-1"), corpus_doc(1, 2)]
    fn = _make_doc_map_arrow([Rule("Email:")], flatten=True)
    rows = list(fn(iter([_to_batch(docs)])))[0].to_pylist()
    for doc, row in zip(docs, rows):
        out, _, _ = redact_document(doc["doc_id"], doc["spans"], [Rule("Email:")], flatten=True)
        assert row["spans"] == out
        kinds = {s["kind"] for s in row["spans"]}
        assert kinds <= {"page", "media"}


def test_arrow_stage_equals_dict_kernel_on_random_docs():
    """Property: for ANY document batch, the Arrow stage's output equals
    the dict-API kernel applied per doc (hypothesis-generated)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfredact_spark.fixtures import page_span, text_span

    WORDS = ["alpha", "beta", "123-45-6789", "x", "a-b", "42"]

    @st.composite
    def rand_doc(draw, i):
        n_lines = draw(st.integers(1, 4))
        spans = [page_span(1)]
        for r in range(n_lines):
            line = " ".join(
                draw(st.sampled_from(WORDS)) for _ in range(draw(st.integers(1, 5)))
            )
            spans.append(text_span(1, r, 72.0, line))
        return {"doc_id": f"h-{i}", "spans": spans}

    @st.composite
    def batches(draw):
        n = draw(st.integers(1, 6))
        return [draw(rand_doc(i)) for i in range(n)]

    @settings(max_examples=40, deadline=None)
    @given(docs=batches())
    def check(docs):
        rows = _run(docs)
        for doc, row in zip(docs, rows):
            exp, h = _expected(doc)
            assert row["spans"] == exp
            assert row["n_rule_hits"] == h

    check()


def test_small_arrow_batches_through_spark(spark):
    """Exercise the real Spark mapInArrow boundary with tiny batches (7
    docs/batch over 25 docs) — output must match the dict kernel exactly,
    including the mid-batch error row."""
    from pdfredact_spark.pipeline import docs_to_df, redact_full

    docs = [corpus_doc(i, 2) for i in range(24)]
    docs.insert(11, demo_doc("rot-x", rotation_page1=90))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = {r.doc_id: r for r in redact_full(docs_to_df(spark, docs), RULES).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(rows) == 25
    assert rows["rot-x"].spans is None and rows["rot-x"].error
    for doc in docs:
        if doc["doc_id"] == "rot-x":
            continue
        exp, h = _expected(doc)
        got = rows[doc["doc_id"]]
        assert [dict(s.asDict()) for s in got.spans] == exp
        assert got.n_rule_hits == h


def test_zero_span_docs_pass_through():
    docs = [
        {"doc_id": "empty-1", "spans": []},
        corpus_doc(1, 2),
        {"doc_id": "empty-2", "spans": []},
    ]
    rows = _run(docs)
    assert rows[0]["spans"] == [] and rows[0]["error"] is None
    assert rows[2]["spans"] == [] and rows[2]["error"] is None
    exp, _ = _expected(docs[1])
    assert rows[1]["spans"] == exp


def test_null_spans_row_routed_to_errors():
    """A row whose spans COLUMN is null (nullable external parquet) must
    quarantine, never emit as a cleanly-redacted empty document."""
    struct = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    good = corpus_doc(1, 2)
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(["null-1", good["doc_id"], "null-2"], type=pa.string()),
            pa.array([None, good["spans"], None], type=pa.list_(struct)),
        ],
        names=["doc_id", "spans"],
    )
    fn = _make_doc_map_arrow(RULES, flatten=False)
    rows = list(fn(iter([rb])))[0].to_pylist()
    assert rows[0]["spans"] is None and "null" in rows[0]["error"]
    assert rows[2]["spans"] is None and "null" in rows[2]["error"]
    exp, _ = _expected(good)
    assert rows[1]["spans"] == exp and rows[1]["error"] is None
