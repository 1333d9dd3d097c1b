from marie_tpu.storage.kv.storage_client import StorageArea
from marie_tpu.storage.kv.in_memory import InMemoryKV
from marie_tpu.storage.kv.sqlite_kv import SqliteKV

__all__ = ["StorageArea", "InMemoryKV", "SqliteKV"]
