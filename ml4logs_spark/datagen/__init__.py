from ml4logs_spark.datagen import derivation, transcripts

__all__ = ["derivation", "transcripts"]
