from marie_tpu.train.recognizer import (
    SyntheticWordDataset,
    character_error_rate,
    train_recognizer,
)

__all__ = ["SyntheticWordDataset", "train_recognizer", "character_error_rate"]
