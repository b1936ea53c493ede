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


def build_rules(args) -> list:
    from pdfredact_spark.model import Rule

    if args.fragment_aware and args.no_fragment_aware:
        # Reference parity (PlanCommand.cs:152-160): the conflict is a
        # WARNING and fragment-aware is force-disabled; the run continues.
        print("Error: Cannot specify both --fragment-aware and --no-fragment-aware; "
              "fragment-aware disabled (forced)", file=sys.stderr)
        frag = False
    else:
        frag = True if args.fragment_aware else (False if args.no_fragment_aware else None)
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


def print_summary(regions_df) -> None:
    """Per-page summary sink (PlanCommand.cs:174-183)."""
    from pdfredact_spark.pipeline import region_summary

    rows = region_summary(regions_df).collect()
    total = sum(r["n_redactions"] for r in rows)
    print(f"Found {total} region(s) to redact across {len({r['doc_id'] for r in rows})} document(s)")
    for r in rows[:50]:
        print(f"  {r['doc_id']} page {r['page']}: {r['n_redactions']} redaction(s)")
    if len(rows) > 50:
        print(f"  ... {len(rows) - 50} more pages")


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
        add_rule_flags(p_r)

    args = ap.parse_args()

    from pdfredact_spark.pipeline import (
        apply_plans,
        locate_regions,
        read_plans,
        redact,
        regions_to_plans,
    )
    from pdfredact_spark.session import get_spark

    spark = get_spark(app_name=f"redact-job-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)

    if args.cmd == "plan":
        regions = locate_regions(docs, build_rules(args))
        regions_to_plans(regions).write.mode("overwrite").json(args.output)
        print_summary(regions)
        print(f"Redaction plan saved to: {args.output}")

    elif args.cmd == "apply":
        plans = read_plans(spark, args.plan)
        good, errors = apply_plans(docs, plans)
        good.write.mode("overwrite").parquet(args.output)
        _report_errors(errors, args.error_output, spark, docs, args.output)
        print(f"Redacted output saved to: {args.output}")

    else:  # redact / flatten (fused)
        rules = build_rules(args)
        flatten = args.cmd == "flatten"
        if args.save_plan:
            regions = locate_regions(docs, rules)
            regions_to_plans(regions).write.mode("overwrite").json(args.save_plan)
            print(f"Redaction plan saved to: {args.save_plan}")
        if args.resume_dir:
            from pdfredact_spark.checkpoint import read_errors, run_resumable

            out = run_resumable(spark, docs, args.resume_dir, rules, flatten=flatten)
            out.select("doc_id", "spans").write.mode("overwrite").parquet(args.output)
            _report_errors(read_errors(spark, args.resume_dir), args.error_output)
        else:
            good, errors = redact(docs, rules, flatten=flatten)
            good.write.mode("overwrite").parquet(args.output)
            _report_errors(errors, args.error_output, spark, docs, args.output)
        print(f"Redacted output saved to: {args.output}")

    spark.stop()


def _report_errors(errors, error_output: str | None,
                   spark=None, docs=None, written_path: str | None = None) -> None:
    if error_output:
        errors.write.mode("overwrite").parquet(error_output)
        print(f"Errored documents routed to: {error_output}")
    elif spark is not None and docs is not None and written_path:
        # error count = input docs - emitted docs (avoids recomputing the
        # Python stage just to count the error side of the same lineage)
        n = docs.count() - spark.read.parquet(written_path).count()
        if n:
            print(f"WARNING: {n} document(s) skipped (rotation fail-fast); "
                  "pass --error-output to capture them")
    else:
        n = errors.count()
        if n:
            print(f"WARNING: {n} document(s) skipped (rotation fail-fast); "
                  "pass --error-output to capture them")


if __name__ == "__main__":
    main()
