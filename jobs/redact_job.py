"""spark-submit entry point mirroring the reference CLI
(/root/reference/src/PdfRedact.CLI/Program.cs:4-11: plan / apply / redact,
plus the planned flatten mode).

Usage (run with ``spark-submit --py-files pdfredact_spark.zip``):

  redact_job.py plan   -i <docs parquet> -o <plan json dir> -p PAT [-p PAT2 ...]
                       [--regex] [--case-insensitive]
                       [--fragment-aware | --no-fragment-aware]
  redact_job.py apply  -i <docs parquet> --plan <plan json dir> -o <out parquet>
  redact_job.py redact -i <docs parquet> -o <out parquet> -p PAT [...]
                       [--regex] [--case-insensitive]
                       [--fragment-aware | --no-fragment-aware]
                       [--save-plan <plan json dir>] [--resume-dir <dir>]
  redact_job.py flatten -i <docs parquet> -o <out parquet> -p PAT [...]

Flag semantics match the reference: --fragment-aware and
--no-fragment-aware are mutually exclusive (PlanCommand.cs:133-147);
omitting both leaves the tri-state auto-detect (RedactionRule.cs:43).
Prints the per-page redaction summary the reference prints
(PlanCommand.cs:174-183).
"""

from __future__ import annotations

import argparse
import sys


def build_rules(args, verb: str) -> list:
    """Rule construction + console preamble (PlanCommand.cs:125-165 /
    RedactCommand.cs:136-165). A --fragment-aware/--no-fragment-aware
    conflict is a hard error: print to stderr and exit(1), exactly like the
    reference's Environment.Exit(1) (PlanCommand.cs:133-137,
    RedactCommand.cs:144-148)."""
    print(f"{verb}: {args.input}")
    print(f"Patterns ({len(args.pattern)}): {', '.join(args.pattern)}")
    print(f"Mode: {'Regex' if args.regex else 'Literal'}")
    print(f"Case-sensitive: {not args.case_insensitive}")
    if args.fragment_aware and args.no_fragment_aware:
        print("Error: Cannot specify both --fragment-aware and --no-fragment-aware",
              file=sys.stderr)
        sys.exit(1)
    elif args.fragment_aware:
        frag = True
        print("Fragment-aware: enabled (forced)")
    elif args.no_fragment_aware:
        frag = False
        print("Fragment-aware: disabled (forced)")
    else:
        frag = None
        print("Fragment-aware: auto-detect (enabled for numeric patterns)")
    print()
    from pdfredact_spark.model import Rule

    return [
        Rule(
            pattern=p,
            is_regex=args.regex,
            case_sensitive=not args.case_insensitive,
            fragment_aware=frag,
        )
        for p in args.pattern
    ]


def add_rule_flags(p) -> None:
    p.add_argument("-p", "--pattern", action="append", required=True)
    p.add_argument("-r", "--regex", action="store_true")
    p.add_argument("--case-insensitive", action="store_true")
    p.add_argument("--fragment-aware", action="store_true")
    p.add_argument("--no-fragment-aware", action="store_true")


def print_summary(summary_df) -> None:
    """Per-page summary sink (PlanCommand.cs:174-183). Totals are computed
    IN Spark (never one driver row per page — at 10^12 docs that collect is
    a driver OOM); only the 50 display rows are collected."""
    from pyspark.sql import functions as F

    tot = summary_df.agg(
        F.coalesce(F.sum("n_redactions"), F.lit(0)).alias("total"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_pages"),
    ).collect()[0]
    rows = summary_df.orderBy("doc_id", "page").limit(50).collect()
    print(f"Found {tot['total']} region(s) to redact across {tot['n_docs']} document(s)")
    for r in rows:
        print(f"  {r['doc_id']} page {r['page']}: {r['n_redactions']} redaction(s)")
    if tot["n_pages"] > 50:
        print(f"  ... {tot['n_pages'] - 50} more pages")


def main() -> None:
    ap = argparse.ArgumentParser(prog="redact_job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_plan = sub.add_parser("plan")
    p_plan.add_argument("-i", "--input", required=True)
    p_plan.add_argument("-o", "--output", required=True)
    add_rule_flags(p_plan)

    p_apply = sub.add_parser("apply")
    p_apply.add_argument("-i", "--input", required=True)
    p_apply.add_argument("--plan", required=True)
    p_apply.add_argument("-o", "--output", required=True)
    p_apply.add_argument("--error-output")

    for name in ("redact", "flatten"):
        p_r = sub.add_parser(name)
        p_r.add_argument("-i", "--input", required=True)
        p_r.add_argument("-o", "--output", required=True)
        p_r.add_argument("--save-plan")
        p_r.add_argument("--error-output")
        p_r.add_argument("--resume-dir")
        p_r.add_argument(
            "--lease-ttl-sec", type=float, default=None,
            help="guard --resume-dir with a run lease (out_dir/run.lease): "
                 "a second concurrent driver blocks, then no-ops on the "
                 "winner's committed batches instead of racing its "
                 "overwrites (unleased concurrent drivers can silently "
                 "lose a batch — see checkpoint.run_resumable). The ttl "
                 "must outlast one batch; a crashed holder expires into "
                 "takeover.")
        add_rule_flags(p_r)

    args = ap.parse_args()

    # Rule/flag validation (and the conflict hard-exit) happens BEFORE the
    # Spark session spins up, like the reference CLI.
    if args.cmd == "plan":
        rules = build_rules(args, "Creating redaction plan for")
    elif args.cmd != "apply":
        rules = build_rules(args, "Redacting PDF")

    from pdfredact_spark.pipeline import (
        apply_plans_full,
        locate_regions,
        read_plans,
        redact_full,
        regions_to_plans,
        summary_from_plans,
    )
    from pdfredact_spark.session import get_spark

    spark = get_spark(app_name=f"redact-job-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)

    if args.cmd == "plan":
        regions = locate_regions(docs, rules)
        regions_to_plans(regions).write.mode("overwrite").json(args.output)
        # Summarize from the plan JSON just written: the Python locate stage
        # executes exactly once (the write); the summary re-reads the
        # materialized plans (ADVICE r1: two actions on one unmaterialized
        # lineage ran mapInPandas twice).
        print_summary(summary_from_plans(read_plans(spark, args.output)))
        print(f"Redaction plan saved to: {args.output}")

    elif args.cmd == "apply":
        plans = read_plans(spark, args.plan)
        _write_split(apply_plans_full(docs, plans), args.output,
                     args.error_output, spark, docs)
        print(f"Redacted output saved to: {args.output}")

    else:  # redact / flatten (fused)
        flatten = args.cmd == "flatten"
        if args.save_plan:
            regions = locate_regions(docs, rules)
            regions_to_plans(regions).write.mode("overwrite").json(args.save_plan)
            print(f"Redaction plan saved to: {args.save_plan}")
        if args.resume_dir:
            from pdfredact_spark.checkpoint import read_errors, run_resumable

            out = run_resumable(spark, docs, args.resume_dir, rules,
                                flatten=flatten,
                                lease_ttl_sec=args.lease_ttl_sec)
            out.select("doc_id", "spans").write.mode("overwrite").parquet(args.output)
            _report_errors(read_errors(spark, args.resume_dir), args.error_output)
        elif args.save_plan and not flatten:
            # The plan JSON above already ran the Python locate stage; apply
            # the MATERIALIZED plan instead of re-running the fused kernel
            # (locate+apply == fused is property-tested), mirroring
            # RedactCommand.cs: locate once, save, apply.
            _write_split(apply_plans_full(docs, read_plans(spark, args.save_plan)),
                         args.output, args.error_output, spark, docs)
        else:
            _write_split(redact_full(docs, rules, flatten=flatten),
                         args.output, args.error_output, spark, docs)
        print(f"Redacted output saved to: {args.output}")

    spark.stop()


def _write_split(full, output: str, error_output: str | None,
                 spark, docs) -> None:
    """Write the good view to ``output`` and handle the error side from
    ONE execution of the Python stage. With --error-output the full
    frame is persisted so the two writes share the computed result
    (round-5 review: writing good then errors off the same unmaterialized
    lineage re-executed the whole redaction — 2x the dominant cost; the
    library docstring says materialize first, and run_resumable does)."""
    from pyspark.sql import functions as F

    if error_output:
        full.persist()
        try:
            full.where(F.col("error").isNull()).select("doc_id", "spans") \
                .write.mode("overwrite").parquet(output)
            full.where(F.col("error").isNotNull()).select("doc_id", "error") \
                .write.mode("overwrite").parquet(error_output)
        finally:
            full.unpersist()
        print(f"Errored documents routed to: {error_output}")
    else:
        full.where(F.col("error").isNull()).select("doc_id", "spans") \
            .write.mode("overwrite").parquet(output)
        _warn_skipped(docs, spark, output)


def _warn_skipped(docs, spark, written_path: str) -> None:
    """Error count = input docs - emitted docs. Neither side re-runs the
    Python redaction stage: the output count is a parquet-footer scan,
    and docs.count() is a zero-column scan of the input (footer row
    counts for file sources — cheap relative to the job; for a
    non-file-source docs a caller who cares passes --error-output and
    never reaches this path). The error channel carries rotation
    fail-fasts, malformed-doc exceptions, NULL-spans rows, and
    duplicate-plan quarantines alike (ADVICE r5 — the old message
    attributed everything to rotation)."""
    n = docs.count() - spark.read.parquet(written_path).count()
    if n:
        print(f"WARNING: {n} document(s) quarantined "
              "(rotation/malformed/duplicate-plan); "
              "pass --error-output to capture them")


def _report_errors(errors, error_output: str | None,
                   spark=None, docs=None, written_path: str | None = None) -> None:
    if error_output:
        errors.write.mode("overwrite").parquet(error_output)
        print(f"Errored documents routed to: {error_output}")
    elif spark is not None and docs is not None and written_path:
        _warn_skipped(docs, spark, written_path)
    else:
        n = errors.count()
        if n:
            print(f"WARNING: {n} document(s) quarantined "
                  "(rotation/malformed/duplicate-plan); "
                  "pass --error-output to capture them")


if __name__ == "__main__":
    main()
