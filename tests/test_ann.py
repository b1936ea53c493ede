"""ANN quality: the approximate variants must recall most of the exact
brute-force top-10 (deterministic data -> deterministic recall)."""

from __future__ import annotations

from pdfredact_spark.queries import q_ann_cosine_topk, q_ann_ivf_topk, q_ann_lsh_topk

SF_DIR = "/root/testdata/sf0.01"


def _topk_ids(df):
    return {r["vec_id"] for r in df.collect()}


def test_ivf_recall_vs_brute_force(spark):
    exact = _topk_ids(q_ann_cosine_topk(spark, SF_DIR))
    ivf = _topk_ids(q_ann_ivf_topk(spark, SF_DIR))
    assert len(ivf) == 10
    recall = len(exact & ivf) / 10
    assert recall >= 0.5, f"IVF recall {recall} too low"


def test_lsh_returns_ranked_candidates(spark):
    lsh = q_ann_lsh_topk(spark, SF_DIR).collect()
    assert 1 <= len(lsh) <= 10
    assert [r["rank"] for r in lsh] == list(range(1, len(lsh) + 1))
