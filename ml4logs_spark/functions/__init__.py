from ml4logs_spark.functions.masking import mask_text, train_split_flag

__all__ = ["mask_text", "train_split_flag"]
