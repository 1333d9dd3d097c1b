from marie_tpu.registry.model_registry import ModelRegistry

__all__ = ["ModelRegistry"]
