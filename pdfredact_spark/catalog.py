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
