"""Table-format seam: Iceberg when a catalog is configured, parquet
directories otherwise.

The north rule targets Iceberg tables; this sandbox is offline and
PySpark 4.1.2 ships no Iceberg runtime jar, so the seam exposes one
API and picks the backend at runtime (SURVEY.md §4.2). With Iceberg
present, writes become atomic ``writeTo(...)`` commits and resume can
key on snapshot ids; the parquet fallback emulates commit atomicity
with a _COMMITTED marker written after a successful write plus the
manifest protocol in sources/manifest.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Warehouse:
    """A directory of named tables behind the format seam."""

    def __init__(self, spark: SparkSession, root: str, catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = catalog is not None and iceberg_available(spark)
        self.catalog = catalog
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        p = self.path(name)
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(p)
        open(os.path.join(p, "_COMMITTED"), "w").write("ok")

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self.path(name))

    def export(self, df: DataFrame, name: str, fmt: str = "csv") -> str:
        """Interchange export — the analog of the reference's .csv/.npy
        step outputs (S9; e.g. data/hdfs.py label/count csv writes).
        ``fmt``: csv (header) or json (lines). Arrays/structs are not
        csv-representable — callers flatten first (the reference's
        dense matrices become long-form or element columns). Exports
        are terminal interchange artifacts, not pipeline state: resume
        and lineage stay on the table formats above."""
        p = self.path(f"{name}.{fmt}")
        if fmt == "csv":
            df.write.mode("overwrite").option("header", True).csv(p)
        elif fmt == "json":
            df.write.mode("overwrite").json(p)
        else:
            raise ValueError(f"unknown export format: {fmt}")
        return p

    def committed(self, name: str) -> bool:
        if self.use_iceberg:
            try:
                self.spark.read.table(f"{self.catalog}.{name}").schema
                return True
            except Exception:
                return False
        return os.path.exists(os.path.join(self.path(name), "_COMMITTED"))
