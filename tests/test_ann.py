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


def test_ivf_quantizer_improves_cell_balance(spark):
    """Round-3 verdict #4: the Lloyd-trained quantizer must give better
    cell balance than the old 'first 16 vectors' centroids. Assign the
    full sf0.01 corpus to both centroid sets and compare max/min cell
    population (first-16 measured 42/20 = 2.1; Lloyd-2 measures 35/26 =
    1.3). Also pins determinism: two trainings produce identical
    centroids."""
    import math

    from pdfredact_spark.queries import _ivf_centroids

    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    ]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    def ratio(cents):
        cells = {c: 0 for c, _ in cents}
        for _v, e in rows:
            best = max((cos(e, ce), -c) for c, ce in cents)
            cells[-best[1]] += 1
        return max(cells.values()) / max(min(cells.values()), 1)

    first16 = [(v, e) for v, e in sorted(rows) if v < 16]
    lloyd = _ivf_centroids(spark, SF_DIR)
    assert lloyd == _ivf_centroids(spark, SF_DIR)  # deterministic
    assert ratio(lloyd) < ratio(first16), (ratio(lloyd), ratio(first16))


def test_lsh_returns_ranked_candidates(spark):
    lsh = q_ann_lsh_topk(spark, SF_DIR).collect()
    assert 1 <= len(lsh) <= 10
    assert [r["rank"] for r in lsh] == list(range(1, len(lsh) + 1))


def test_embedding_dedup_catches_genuinely_perturbed_pair(spark, tmp_path):
    """The banded sign-LSH near-dup finder's oracle parity on the driver
    corpus is data-dependent: its qualifying pairs there are exact copies
    (every sign bit trivially agrees). This fixture pins recall on a
    GENUINELY non-identical pair — v2 = v + 0.02-scaled perturbation,
    cosine 0.99997 — verifying the band prefilter keeps pairs whose
    projections don't cross a hyperplane (the documented recall limit is
    pairs that DO cross one in every band)."""
    import numpy as np

    from pdfredact_spark.queries import _SIGN_PLANE, q_dedup_embedding_cosine

    dim = 16
    W = np.array([_SIGN_PLANE(f"e{p}")[:dim] for p in range(16)])
    v = np.array([1.0, -0.4, 0.7, 0.3, -0.8, 0.5, -0.2, 0.9,
                  0.6, -0.5, 0.35, -0.75, 0.15, 0.85, -0.3, 0.45])
    d = np.array([(-1) ** i * (0.3 + 0.04 * i) for i in range(dim)])
    v2 = v + 0.02 * d / np.linalg.norm(d)
    # preconditions on the float32 values actually stored in parquet
    v32, v232 = v.astype(np.float32).astype(float), v2.astype(np.float32).astype(float)
    assert not np.allclose(v32, v232)  # genuinely non-identical
    u, u2 = v32 / np.linalg.norm(v32), v232 / np.linalg.norm(v232)
    assert u @ u2 > 0.999
    assert (np.sign(W @ u) == np.sign(W @ u2)).all()  # no hyperplane crossed

    fillers = [np.roll(v, j) * (1 + 0.3 * j) for j in range(1, 12)]
    rows = [(200, [float(x) for x in v], 0), (201, [float(x) for x in v2], 0)] + [
        (100 + j, [float(x) for x in f], 0) for j, f in enumerate(fillers)
    ]
    spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    pairs = {(r["vec_a"], r["vec_b"]) for r in
             q_dedup_embedding_cosine(spark, str(tmp_path)).collect()}
    assert (200, 201) in pairs


def test_multiprobe_recall_strictly_beats_single_probe(spark, tmp_path):
    """Single-probe LSH has a recall cliff at hyperplane boundaries: the
    true nearest neighbor can differ from the query in exactly one
    projection sign and is then never a candidate. This fixture crafts
    that case deterministically — v = q reflected across plane 0 (cosine
    0.9994, Hamming-1 bucket) — and asserts the Hamming-1 multi-probe set
    recovers it while the single-probe plan provably cannot."""
    import numpy as np

    from pdfredact_spark.queries import (
        _LSH_PROBE_MASKS,
        _SIGN_PLANE,
        _ann_lsh_topk_impl,
    )

    dim = 8
    W = np.array([_SIGN_PLANE(str(p))[:dim] for p in range(4)])
    r = np.array([1.0, 0.5, -0.3, 0.8, 0.2, -0.6, 0.4, 0.9])
    b = r - (r @ W[0] / (W[0] @ W[0])) * W[0]  # proj_0(b) == 0
    q, v = b + 0.01 * W[0], b - 0.01 * W[0]

    def bucket(x):
        p = W @ x
        return sum((1 << i) for i in range(4) if p[i] > 0)

    # fixture preconditions: v flips EXACTLY plane 0 and is the clear
    # nearest neighbor of q
    sq, sv = np.sign(W @ q), np.sign(W @ v)
    assert sq[0] > 0 > sv[0] and (sq[1:] == sv[1:]).all()
    cos_qv = q @ v / (np.linalg.norm(q) * np.linalg.norm(v))
    assert cos_qv > 0.999

    fillers = [q + 0.2 * np.roll(b, j) for j in range(1, 6)]  # some in q's bucket
    fillers += [
        np.roll(r, i % dim) + 0.07 * ((i % 9) - 4) * np.roll(b, (i * 3) % dim)
        for i in range(30)
    ]
    assert any(bucket(f) == bucket(q) for f in fillers)  # single-probe non-empty
    assert max(
        f @ q / (np.linalg.norm(f) * np.linalg.norm(q)) for f in fillers
    ) < cos_qv

    rows = [(0, [float(x) for x in q], 0), (1, [float(x) for x in v], 0)] + [
        (i + 2, [float(x) for x in f], 0) for i, f in enumerate(fillers)
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    d = str(tmp_path)

    brute = _topk_ids(q_ann_cosine_topk(spark, d))
    single = _topk_ids(_ann_lsh_topk_impl(spark, d, (0,)))
    multi = _topk_ids(_ann_lsh_topk_impl(spark, d, _LSH_PROBE_MASKS))

    assert 1 in brute  # v is the true top-1
    assert 1 not in single and 1 in multi
    assert single  # the cliff, not an empty bucket, is what single-probe shows
    recall_single = len(single & brute) / len(brute)
    recall_multi = len(multi & brute) / len(brute)
    assert recall_multi > recall_single
