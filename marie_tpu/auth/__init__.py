from marie_tpu.auth.api_key_manager import APIKeyManager

__all__ = ["APIKeyManager"]
