import os
import sys

# generated marie_pb2 does `import` relative to its own dir
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marie_tpu.proto import docarray_pb2, marie_pb2  # noqa: E402

__all__ = ["marie_pb2", "docarray_pb2"]
