"""Single-process kernel profiler (guide §1: measure first).

Builds the SAME Arrow batches the redaction stage sees (corpus_doc +
mega_doc mix, DOC_SCHEMA, 2048-row batches) and runs the pipeline's
_make_doc_map_arrow closure over them under cProfile — isolating the
per-doc Python cost from Spark scheduling/IO so a kernel change can be
evaluated in seconds instead of a full bench run.

Usage: python tools/profile_kernel.py [n_docs] [--cprofile]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from pdfredact_spark.fixtures import SSN_RULE, corpus_doc, mega_doc
from pdfredact_spark.pipeline import _make_doc_map_arrow

MEGA_EVERY = 2000  # bench.py's skew mix
LINES_MULT = 5


def build_batches(n_docs: int, batch_rows: int = 2048) -> list[pa.RecordBatch]:
    batches = []
    docs = []
    for i in range(n_docs):
        if MEGA_EVERY and i > 0 and i % MEGA_EVERY == 0:
            docs.append(mega_doc(f"d{i:09d}"))
        else:
            docs.append(corpus_doc(i, LINES_MULT))
        if len(docs) == batch_rows:
            batches.append(_to_batch(docs))
            docs = []
    if docs:
        batches.append(_to_batch(docs))
    return batches


def _to_batch(docs: list[dict]) -> pa.RecordBatch:
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], type=pa.string()),
            "spans": pa.array(
                [
                    [
                        {
                            "kind": s["kind"],
                            "text": s["text"],
                            "media_ref": s["media_ref"],
                            "offset": s["offset"],
                        }
                        for s in d["spans"]
                    ]
                    for d in docs
                ],
                type=pa.list_(span_type),
            ),
        }
    )
    return tbl.combine_chunks().to_batches()[0]


def run(batches, fn):
    n_out = 0
    for out in fn(iter(batches)):
        n_out += out.num_rows
    return n_out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    use_cprofile = "--cprofile" in sys.argv
    batches = build_batches(n_docs)
    fn = _make_doc_map_arrow([SSN_RULE], flatten=False)

    # warm
    run(batches[:1], fn)

    if use_cprofile:
        pr = cProfile.Profile()
        pr.enable()
        t0 = time.perf_counter()
        n = run(batches, fn)
        dt = time.perf_counter() - t0
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(40)
    else:
        t0 = time.perf_counter()
        n = run(batches, fn)
        dt = time.perf_counter() - t0
    print(
        f"docs={n} wall={dt:.3f}s  {n / dt:.0f} docs/s/core  "
        f"{dt / n * 1e6:.1f} us/doc"
    )


if __name__ == "__main__":
    main()
