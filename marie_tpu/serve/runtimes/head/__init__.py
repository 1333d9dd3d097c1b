from marie_tpu.serve.runtimes.head.request_handling import HeaderRequestHandler

__all__ = ["HeaderRequestHandler"]
