from marie_tpu.serve.networking.connection_pool import GrpcConnectionPool

__all__ = ["GrpcConnectionPool"]
