from ml4logs_spark.oracle import sql

__all__ = ["sql"]
