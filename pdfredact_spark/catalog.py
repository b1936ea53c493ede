"""Thin table catalog: Iceberg when available, partitioned Parquet fallback.

The north rule targets Iceberg tables; this sandbox's PySpark ships no
Iceberg runtime jar (TESTDATA.md), so the engine abstracts the four table
operations it needs behind one object. With
``spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions``
and a configured catalog, table names route to ``writeTo``/``table`` (real
Iceberg snapshots); otherwise paths route to Parquet directories. Callers
(jobs, checkpoint, streaming) never branch on the format themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_enabled(spark: SparkSession) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        return False
    return "IcebergSparkSessionExtensions" in ext


def _is_table_name(target: str) -> bool:
    """Catalog table names are dotted identifiers, not paths."""
    return "/" not in target and not target.startswith("file:")


class LedgerStorage:
    """Storage-layer operations the streaming dedup ledger and its
    compaction need (ADVICE r4 / round-4 verdict #4): listing delta and
    generation directories, recursive delete of absorbed inputs, the
    atomic meta-pointer flip, and the metrics walk. The compaction
    algorithm orders its steps (write gen G+1 fully -> flip pointer ->
    delete absorbed inputs) so any backend whose pointer flip is atomic
    is crash-safe; everything filesystem-specific lives HERE, so an
    object-store deployment (no atomic rename, prefix listing instead
    of directories) swaps one class — e.g. a conditional-PUT meta flip —
    without touching streaming.py.

    This default implementation is the local/POSIX filesystem (matching
    the sandbox and any HDFS-fuse mount): os.replace gives the atomic
    pointer flip, os.walk the listing.
    """

    def join(self, *parts: str) -> str:
        import os

        return os.path.join(*parts)

    def read_json(self, path: str) -> dict | None:
        import json
        import os

        if not os.path.isfile(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def write_json_atomic(self, path: str, obj: dict) -> None:
        """Readers must see either the old or the new pointer, never a
        partial write: write-then-rename (POSIX rename atomicity)."""
        import json
        import os

        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.replace(tmp, path)

    def list_dirs(self, pattern: str) -> list[str]:
        import glob

        return sorted(glob.glob(pattern))

    def is_dir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def is_file(self, path: str) -> bool:
        import os

        return os.path.isfile(path)

    def delete_tree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def has_parquet(self, path: str) -> bool:
        """True if any .parquet file exists under path. An all-duplicate
        micro-batch writes a ledger delta containing only _SUCCESS;
        reading such a directory raises UNABLE_TO_INFER_SCHEMA, so every
        ledger read must skip file-less directories."""
        import os

        for _root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def parquet_bytes_under(self, paths: list[str]) -> int:
        """Metrics-only (test soaks): bytes of parquet under the paths."""
        import os

        total = 0
        for p in paths:
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        return total


LOCAL_LEDGER_STORAGE = LedgerStorage()


class Catalog:
    """Format-agnostic read/append/overwrite for the engine's tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.iceberg = _iceberg_enabled(spark)

    def _use_iceberg(self, target: str) -> bool:
        return self.iceberg and _is_table_name(target)

    def read(self, target: str) -> DataFrame:
        if self._use_iceberg(target):
            return self.spark.table(target)
        return self.spark.read.parquet(target)

    def append(self, df: DataFrame, target: str, partition_by: list[str] | None = None) -> None:
        if self._use_iceberg(target):
            df.writeTo(target).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)

    def overwrite(self, df: DataFrame, target: str, partition_by: list[str] | None = None) -> None:
        if self._use_iceberg(target):
            w = df.writeTo(target)
            if partition_by:
                # keep the format-agnostic contract: the Iceberg table must
                # be partitioned like the Parquet layout would be
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)

    def exists(self, target: str) -> bool:
        if self._use_iceberg(target):
            return self.spark.catalog.tableExists(target)
        jvm = self.spark.sparkContext._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(target)
        return path.getFileSystem(hconf).exists(path)
