#!/bin/bash
# End-to-end walkthrough mirroring the reference demo (/root/reference/demo.sh):
# generate a corpus, plan with the SSN regex, apply, and one-step redact of
# 'Email:' — all via spark-submit, as a reference user would.
set -e

cd "$(dirname "$0")/.."
WORK=$(mktemp -d /tmp/spark-redact-demo-XXXX)
echo "=== spark-redact demo (work dir: $WORK) ==="

zip -qr "$WORK/engine.zip" pdfredact_spark

echo "0. Generating a deterministic demo corpus (fx-09-shaped docs)..."
python - "$WORK/docs" <<'EOF'
import sys
from pdfredact_spark.session import get_spark
from pdfredact_spark.fixtures import corpus
from pdfredact_spark.pipeline import docs_to_df
spark = get_spark(master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
docs_to_df(spark, corpus(50)).write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
EOF

echo "1. Creating redaction plan to find SSN patterns..."
spark-submit --master 'local[4]' --py-files "$WORK/engine.zip" \
  jobs/redact_job.py plan -i "$WORK/docs" -o "$WORK/plan" \
  -p '\d{3}-\d{2}-\d{4}' --regex 2>/dev/null | tail -4

echo "2. Applying redaction plan..."
spark-submit --master 'local[4]' --py-files "$WORK/engine.zip" \
  jobs/redact_job.py apply -i "$WORK/docs" --plan "$WORK/plan" \
  -o "$WORK/redacted" 2>/dev/null | tail -2

echo "3. One-step redaction of 'Email:' text..."
spark-submit --master 'local[4]' --py-files "$WORK/engine.zip" \
  jobs/redact_job.py redact -i "$WORK/docs" -o "$WORK/email-redacted" \
  -p 'Email:' 2>/dev/null | tail -2

echo "=== Demo Complete ==="
python - "$WORK" <<'EOF'
import sys, duckdb
w = sys.argv[1]
n = duckdb.sql(f"SELECT count(*) FROM '{w}/redacted/*.parquet'").fetchone()[0]
m = duckdb.sql(f"SELECT count(*) FROM (SELECT unnest(spans) s FROM '{w}/redacted/*.parquet') WHERE s.kind='mask'").fetchone()[0]
e = duckdb.sql(f"SELECT count(*) FROM (SELECT unnest(spans) s FROM '{w}/email-redacted/*.parquet') WHERE s.kind='mask'").fetchone()[0]
print(f"Generated outputs: {n} docs, {m} SSN masks, {e} Email masks")
EOF
