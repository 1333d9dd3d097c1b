from marie_tpu.storage.manager import PathHandler, StorageManager
from marie_tpu.storage.native_handler import NativePathHandler

__all__ = ["StorageManager", "PathHandler", "NativePathHandler"]
