from ml4logs_spark.streaming import stream_pipeline

__all__ = ["stream_pipeline"]
