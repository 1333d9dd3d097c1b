from marie_tpu.pipe.base_pipeline import BasePipeline
from marie_tpu.pipe.extract_pipeline import ExtractPipeline
from marie_tpu.pipe.classification_pipeline import ClassificationPipeline

__all__ = ["BasePipeline", "ExtractPipeline", "ClassificationPipeline"]
