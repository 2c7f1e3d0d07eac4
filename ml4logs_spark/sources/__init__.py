from ml4logs_spark.sources import manifest, tables

__all__ = ["manifest", "tables"]
