"""The distributed redaction pipeline (SURVEY.md §3.4 lifecycle).

Stage plan (2 shuffles, 1 vectorized Python stage, zero per-row Python):

    read (doc_id, spans)
      -> explode spans, derive page band = offset div 200M        [narrow]
      -> groupBy(doc_id, band) collect_list                       [SHUFFLE 1]
         - the PAGE is the parallel unit: reference semantics are
           strictly per-page (PdfPigTextLocator.cs:45-49 processes pages
           independently), so a mega-document's pages fan out across the
           cluster instead of pinning one task — this is the skew defusal
           the north rule asks for. The int32 offset encoding bounds a
           page at 2000 rows, bounding per-group memory.
      -> pandas_udf _redact_pages: one Arrow batch = MANY pages; the
         kernel runs per page inside the batch (no per-group Python
         call overhead, no row-at-a-time Python)                  [narrow]
      -> doc-level error routing (rotation fail-fast parity): any page
         error drops the whole doc to the error output            [left_anti]
      -> groupBy(doc_id) flatten+array_sort                       [SHUFFLE 2]
         offset-keyed window reassembly of the span sequence.

Catalyst/AQE give shuffle coalescing and partial aggregation for free; the
collect_list aggregation map-side-combines per page before shuffling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pdfredact_spark.kernel import RotationError, locate_document, redact_document
from pdfredact_spark.model import DOC_SCHEMA, PAGE_BASE, REGION_SCHEMA, SPAN_STRUCT, Rule

_REDACT_RESULT = StructType(
    [
        StructField("spans", ArrayType(SPAN_STRUCT, False), True),
        StructField("n_hits", IntegerType(), False),
        StructField("error", StringType(), True),
    ]
)

_REGION_STRUCT = StructType([f for f in REGION_SCHEMA.fields if f.name != "doc_id"])


def docs_to_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    return spark.createDataFrame(docs, schema=DOC_SCHEMA)


def _page_groups(df: DataFrame) -> DataFrame:
    """Explode to flat spans and regroup per (doc_id, page band)."""
    return (
        df.select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", F.expr(f"s.offset div {PAGE_BASE}").alias("band"), "s")
        .groupBy("doc_id", "band")
        .agg(F.collect_list("s").alias("page_spans"))
    )


def _make_redact_udf(rules: list[Rule], flatten: bool):
    """Vectorized page-batch redactor. Rules are closed over (tiny per-job
    config — the reference's docs x rules cartesian with the rule side
    broadcast, SURVEY.md J1)."""

    def fn(doc_ids: "pd.Series", pages: "pd.Series") -> "pd.DataFrame":
        spans_out, hits_out, err_out = [], [], []
        for doc_id, page_spans in zip(doc_ids, pages):
            spans = list(page_spans)
            try:
                out, _, hits = redact_document(doc_id, spans, rules, flatten=flatten)
                spans_out.append(out)
                hits_out.append(hits)
                err_out.append(None)
            except RotationError as e:
                spans_out.append(None)
                hits_out.append(0)
                err_out.append(str(e))
        return pd.DataFrame({"spans": spans_out, "n_hits": hits_out, "error": err_out})

    from pyspark.sql.functions import pandas_udf

    return pandas_udf(fn, returnType=_REDACT_RESULT)


def redact(
    df: DataFrame, rules: list[Rule], flatten: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Fused locate+apply over a (doc_id, spans) DataFrame.

    Returns (redacted_docs, errors):
      redacted_docs — same schema as the input, span sequences re-assembled
                      in offset order (the BASELINE.json invariant order);
      errors        — (doc_id, error) for documents hitting the rotation
                      fail-fast (reference NotSupportedException parity:
                      the whole document is routed out, none of it is
                      emitted to the main output).

    Empty rule set without flatten -> identity (PdfPigTextLocator.cs:37-41 /
    ApplyCommand.cs:65-69 pass-through), short-circuited on the driver so
    Catalyst sees a no-op plan.
    """
    spark = df.sparkSession
    if not rules and not flatten:
        empty = spark.createDataFrame(
            [],
            schema=StructType(
                [
                    StructField("doc_id", StringType(), False),
                    StructField("error", StringType(), False),
                ]
            ),
        )
        return df, empty

    out, errors = redact_with_hits(df, rules, flatten)
    return out.select("doc_id", "spans"), errors


def _span_order(a, b):
    """Deterministic reassembly order: offset asc, then kind/media_ref/text —
    ties between coincident spans (e.g. two rules masking at one glyph)
    resolve identically on every run/retry."""
    return (
        F.when(a.offset < b.offset, -1)
        .when(a.offset > b.offset, 1)
        .when(a.kind < b.kind, -1)
        .when(a.kind > b.kind, 1)
        .when(a.media_ref < b.media_ref, -1)
        .when(a.media_ref > b.media_ref, 1)
        .when(a.text < b.text, -1)
        .when(a.text > b.text, 1)
        .otherwise(0)
    )


def redact_with_hits(df: DataFrame, rules: list[Rule], flatten: bool = False):
    """Like redact() but the output also carries per-doc metrics columns
    (n_rule_hits, n_spans) for the lineage table."""
    redact_udf = _make_redact_udf(rules, flatten)
    pages = _page_groups(df)
    done = pages.select("doc_id", redact_udf("doc_id", "page_spans").alias("r"))
    errors = (
        done.filter(F.col("r.error").isNotNull())
        .select("doc_id", F.col("r.error").alias("error"))
        .distinct()
    )
    good = done.join(errors.select("doc_id"), "doc_id", "left_anti")
    out = good.groupBy("doc_id").agg(
        F.array_sort(F.flatten(F.collect_list("r.spans")), _span_order).alias("spans"),
        F.sum("r.n_hits").cast("long").alias("n_rule_hits"),
        F.sum(F.size("r.spans")).cast("long").alias("n_spans"),
    )
    return out, errors


def locate_regions(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Locate-only (the reference `plan` command, PlanCommand.cs:163-169):
    emits RedactionRegion rows (doc_id, page, x, y, width, height,
    matched_text, rule_pattern, page_rotation)."""
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame([], schema=REGION_SCHEMA)

    def fn(doc_ids: "pd.Series", pages: "pd.Series") -> "pd.Series":
        out = []
        for doc_id, page_spans in zip(doc_ids, pages):
            spans = list(page_spans)
            regions = locate_document(doc_id, spans, rules)
            out.append(
                [
                    {
                        "page": r.page,
                        "x": r.x,
                        "y": r.y,
                        "width": r.width,
                        "height": r.height,
                        "matched_text": r.matched_text,
                        "rule_pattern": r.rule_pattern,
                        "page_rotation": r.rotation,
                    }
                    for r in regions
                ]
            )
        return pd.Series(out)

    from pyspark.sql.functions import pandas_udf

    locate_udf = pandas_udf(fn, returnType=ArrayType(_REGION_STRUCT))
    pages = _page_groups(df)
    return (
        pages.select("doc_id", F.explode(locate_udf("doc_id", "page_spans")).alias("r"))
        .select("doc_id", "r.*")
    )


def region_summary(regions: DataFrame) -> DataFrame:
    """Per-page redaction counts (PlanCommand.cs:178-183 console summary)."""
    return (
        regions.groupBy("doc_id", "page")
        .agg(F.count("*").alias("n_redactions"))
        .orderBy("doc_id", "page")
    )
