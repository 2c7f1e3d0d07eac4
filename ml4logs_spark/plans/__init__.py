from ml4logs_spark.plans import pipeline

__all__ = ["pipeline"]
