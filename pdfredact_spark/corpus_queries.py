"""Driver-contract queries that exercise the REDACTION PIPELINE itself.

The driver's DuckDB oracle can only run SQL over the testdata parquet
tables, and the redaction operators (anchor clustering, fragment
tokenization, span splicing) are not SQL-expressible. So these queries run
the distributed pipeline over the deterministic fixture corpus and their
oracles are VALUES literals computed by the PURE KERNEL (kernel.py) — which
is itself golden-tested against hand-derived expectations
(tests/test_kernel.py). The driver check therefore asserts
distributed-Spark == local-kernel, catching any divergence introduced by
the Arrow boundary, page-level parallelism, or reassembly.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfredact_spark.fixtures import MULTI_RULES, SSN_RULE, corpus, demo_doc
from pdfredact_spark.kernel import locate_document, redact_document
from pdfredact_spark.media import (
    decode_media,
    fetch_media_bytes,
    frame_digest,
    media_frames,
    media_metadata,
    media_thumbnails,
    resize_media,
    sample_frame_indices,
)
from pdfredact_spark.model import Rule
from pdfredact_spark.pipeline import (
    docs_to_df,
    locate_regions,
    redact,
    region_summary,
)

_CORPUS_N = 48
_MEDIA_N = 16  # media/flatten corpus size — query and oracle MUST agree
_DEMO_N = 4


def _corpus_docs() -> list[dict]:
    return corpus(_CORPUS_N)


def _media_docs() -> list[dict]:
    return corpus(_MEDIA_N)


def _demo_docs() -> list[dict]:
    return [demo_doc(f"dm-{i}") for i in range(_DEMO_N)]


def _local_media_refs():
    """Local twin of media._media_refs: every (doc_id, media_ref, payload)
    for the media spans of the media corpus — the single iteration the
    three media oracles share (a drifted copy would only surface as a
    driver row-count mismatch)."""
    for d in _media_docs():
        for sp in d["spans"]:
            if sp["kind"] == "media":
                yield d["doc_id"], sp["media_ref"], fetch_media_bytes(sp["media_ref"])


def _mask_count_cols(out: DataFrame) -> DataFrame:
    """Shared per-doc mask/span count projection (used by the corpus and
    boxed-fragment queries and by __spark_entry__.entry)."""
    return out.select(
        "doc_id",
        F.size(F.filter("spans", lambda s: s.kind == F.lit("mask")))
        .cast("long")
        .alias("n_masks"),
        F.size("spans").cast("long").alias("n_spans"),
    )


def _mask_count_oracle(docs: list[dict], rules: list[Rule]) -> str:
    """Kernel-computed VALUES twin of _mask_count_cols."""
    rows = []
    for d in docs:
        out, _, _ = redact_document(d["doc_id"], d["spans"], rules)
        n_masks = sum(1 for s in out if s["kind"] == "mask")
        rows.append((d["doc_id"], n_masks, len(out)))
    return _values_sql(rows, ["doc_id", "n_masks", "n_spans"])


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------
def q_redact_corpus_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full redaction pipeline over the fixture corpus; per-doc mask and
    span counts (SSN rule)."""
    df = docs_to_df(spark, _corpus_docs())
    out, _ = redact(df, [SSN_RULE])
    return _mask_count_cols(out)


def q_locate_demo_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locate-only plan output (multi-pattern rule set) over demo docs."""
    df = docs_to_df(spark, _demo_docs())
    return locate_regions(df, MULTI_RULES).select(
        "doc_id",
        F.col("page").cast("long").alias("page"),
        "matched_text",
        "rule_pattern",
        "x",
        "y",
        "width",
        "height",
    )


def q_flatten_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten mode over the fixture corpus: per-doc media/page counts."""
    df = docs_to_df(spark, _media_docs())
    out, _ = redact(df, [SSN_RULE], flatten=True)
    return out.select(
        "doc_id",
        F.size(F.filter("spans", lambda s: s.kind == F.lit("media")))
        .cast("long")
        .alias("n_media"),
        F.size(F.filter("spans", lambda s: s.kind == F.lit("page")))
        .cast("long")
        .alias("n_pages"),
    )


# fragment-aware digit-run rule over the boxed fixture docs
_BOXED_RULES = [Rule(r"\d{3,9}", is_regex=True, fragment_aware=True)]


def _boxed_docs() -> list[dict]:
    from pdfredact_spark.fixtures import all_fixtures

    fx = all_fixtures()
    return [fx[k]["doc"] for k in ("fx-01", "fx-02", "fx-03", "fx-05", "fx-06", "fx-08")]


def q_redact_boxed_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment-aware branch through the DISTRIBUTED pipeline: boxed-digit
    fixture docs + a digit-run regex -> per-doc mask counts (exercises the
    letter tokenizer W3-W5 under Spark, not just in pytest)."""
    df = docs_to_df(spark, _boxed_docs())
    out, _ = redact(df, _BOXED_RULES)
    return _mask_count_cols(out)


def q_mask_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F8 mask-draw geometry (PdfSharpMaskApplicator.cs:107-125): pad
    the region +-1pt, clamp at 0 and the page bounds, flip Y to top-left
    origin — pure column arithmetic over located regions."""
    from pdfredact_spark.model import DEFAULT_PAGE_H, DEFAULT_PAGE_W, MASK_PADDING

    df = docs_to_df(spark, _demo_docs())
    r = locate_regions(df, MULTI_RULES)
    px = F.greatest(F.lit(0.0), F.col("x") - MASK_PADDING)
    py = F.greatest(F.lit(0.0), F.col("y") - MASK_PADDING)
    pw = F.least(F.col("width") + 2 * MASK_PADDING, F.lit(DEFAULT_PAGE_W) - px)
    ph = F.least(F.col("height") + 2 * MASK_PADDING, F.lit(DEFAULT_PAGE_H) - py)
    return r.select(
        "doc_id",
        F.col("page").cast("long").alias("page"),
        "matched_text",
        px.alias("mask_x"),
        (F.lit(DEFAULT_PAGE_H) - py - ph).alias("mask_y_top"),
        pw.alias("mask_w"),
        ph.alias("mask_h"),
    )


def q_region_page_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page redaction counts (A7/S8 console summary,
    PlanCommand.cs:178-183) over the demo docs."""
    df = docs_to_df(spark, _demo_docs())
    return region_summary(locate_regions(df, MULTI_RULES)).select(
        "doc_id",
        F.col("page").cast("long").alias("page"),
        F.col("n_redactions").cast("long").alias("n_redactions"),
    )


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: media spans -> payload fetch -> (stubbed)
    decode via mapInPandas."""
    df = docs_to_df(spark, _media_docs())
    return media_metadata(df).select(
        "doc_id",
        "media_ref",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


def q_media_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal thumbnailing: fetch -> decode -> aspect-preserving
    resize (stubbed resample, real dimension arithmetic + Arrow plumbing)."""
    df = docs_to_df(spark, _media_docs())
    return media_thumbnails(df).select(
        "doc_id",
        "media_ref",
        F.col("out_width").cast("long").alias("out_width"),
        F.col("out_height").cast("long").alias("out_height"),
        "thumb_digest",
    )


def q_media_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame extraction: one row per uniformly-sampled frame
    (the one-to-many video fan-out; decode stubbed behind a digest)."""
    df = docs_to_df(spark, _media_docs())
    return media_frames(df).select(
        "doc_id",
        "media_ref",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_digest",
    )


# ---------------------------------------------------------------------------
# Kernel-computed VALUES oracles
# ---------------------------------------------------------------------------
def _sql_str(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        # repr(nan)/repr(inf) are barewords DuckDB's VALUES can't parse —
        # fail HERE (oracle build) rather than as an opaque binder error
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite oracle literal: {v!r}")
        return repr(v)
    return str(v)


def _values_sql(rows: list[tuple], columns: list[str]) -> str:
    if not rows:
        cols = ", ".join(f"NULL AS {c}" for c in columns)
        return f"SELECT {cols} WHERE 1 = 0"
    vals = ", ".join("(" + ", ".join(_sql_str(v) for v in r) + ")" for r in rows)
    collist = ", ".join(columns)
    return f"SELECT * FROM (VALUES {vals}) AS t({collist})"


def oracle_redact_corpus_masks() -> str:
    return _mask_count_oracle(_corpus_docs(), [SSN_RULE])


def oracle_redact_boxed_fragments() -> str:
    return _mask_count_oracle(_boxed_docs(), _BOXED_RULES)


def oracle_locate_demo_regions() -> str:
    rows = []
    for d in _demo_docs():
        for r in locate_document(d["doc_id"], d["spans"], MULTI_RULES):
            rows.append(
                (d["doc_id"], r.page, r.matched_text, r.rule_pattern,
                 r.x, r.y, r.width, r.height)
            )
    return _values_sql(
        rows,
        ["doc_id", "page", "matched_text", "rule_pattern", "x", "y", "width", "height"],
    )


def oracle_flatten_corpus() -> str:
    rows = []
    for d in _media_docs():
        out, _, _ = redact_document(d["doc_id"], d["spans"], [SSN_RULE], flatten=True)
        n_media = sum(1 for s in out if s["kind"] == "media")
        n_pages = sum(1 for s in out if s["kind"] == "page")
        rows.append((d["doc_id"], n_media, n_pages))
    return _values_sql(rows, ["doc_id", "n_media", "n_pages"])


def oracle_mask_geometry() -> str:
    """VALUES of the RAW kernel regions + the P7/F8 arithmetic expressed in
    SQL — the geometry transform itself is cross-checked, not just copied."""
    from pdfredact_spark.model import DEFAULT_PAGE_H, DEFAULT_PAGE_W, MASK_PADDING

    rows = []
    for d in _demo_docs():
        for r in locate_document(d["doc_id"], d["spans"], MULTI_RULES):
            rows.append((d["doc_id"], r.page, r.matched_text, r.x, r.y, r.width, r.height))
    raw = _values_sql(rows, ["doc_id", "page", "matched_text", "x", "y", "w", "h"])
    pad, W, H = MASK_PADDING, DEFAULT_PAGE_W, DEFAULT_PAGE_H
    return (
        f"WITH raw AS ({raw}), p AS ("
        f"SELECT doc_id, page, matched_text, "
        f"GREATEST(0.0, x - {pad}) AS px, GREATEST(0.0, y - {pad}) AS py, "
        f"w + {2 * pad} AS w2, h + {2 * pad} AS h2 FROM raw) "
        f"SELECT doc_id, page::BIGINT AS page, matched_text, px AS mask_x, "
        f"{H} - py - LEAST(h2, {H} - py) AS mask_y_top, "
        f"LEAST(w2, {W} - px) AS mask_w, LEAST(h2, {H} - py) AS mask_h FROM p"
    )


def oracle_region_page_summary() -> str:
    import collections

    counts: collections.Counter = collections.Counter()
    for d in _demo_docs():
        for r in locate_document(d["doc_id"], d["spans"], MULTI_RULES):
            counts[(d["doc_id"], r.page)] += 1
    rows = [(k[0], k[1], v) for k, v in sorted(counts.items())]
    return _values_sql(rows, ["doc_id", "page", "n_redactions"])


def oracle_media_frame_sample() -> str:
    rows = []
    for doc_id, ref, payload in _local_media_refs():
        m = decode_media(payload)
        rows.append(
            (doc_id, ref, len(payload), m["n_frames"], m["width"], m["height"])
        )
    return _values_sql(
        rows, ["doc_id", "media_ref", "n_bytes", "n_frames", "width", "height"]
    )


def oracle_media_thumbnails() -> str:
    rows = []
    for doc_id, ref, payload in _local_media_refs():
        m = decode_media(payload)
        t = resize_media(payload, m["width"], m["height"])
        rows.append(
            (doc_id, ref, t["out_width"], t["out_height"], t["thumb_digest"])
        )
    return _values_sql(
        rows, ["doc_id", "media_ref", "out_width", "out_height", "thumb_digest"]
    )


def oracle_media_frame_extract() -> str:
    rows = []
    for doc_id, ref, payload in _local_media_refs():
        m = decode_media(payload)
        for idx in sample_frame_indices(m["n_frames"]):
            rows.append((doc_id, ref, idx, frame_digest(payload, idx)))
    return _values_sql(rows, ["doc_id", "media_ref", "frame_idx", "frame_digest"])


PIPELINE_QUERIES = {
    "redact_corpus_masks": q_redact_corpus_masks,
    "locate_demo_regions": q_locate_demo_regions,
    "flatten_corpus": q_flatten_corpus,
    "media_frame_sample": q_media_frame_sample,
    "media_thumbnails": q_media_thumbnails,
    "media_frame_extract": q_media_frame_extract,
    "mask_geometry": q_mask_geometry,
    "region_page_summary": q_region_page_summary,
    "redact_boxed_fragments": q_redact_boxed_fragments,
}

PIPELINE_ORACLES = {
    "redact_corpus_masks": oracle_redact_corpus_masks,
    "locate_demo_regions": oracle_locate_demo_regions,
    "flatten_corpus": oracle_flatten_corpus,
    "media_frame_sample": oracle_media_frame_sample,
    "media_thumbnails": oracle_media_thumbnails,
    "media_frame_extract": oracle_media_frame_extract,
    "mask_geometry": oracle_mask_geometry,
    "region_page_summary": oracle_region_page_summary,
    "redact_boxed_fragments": oracle_redact_boxed_fragments,
}
