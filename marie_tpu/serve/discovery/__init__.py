from marie_tpu.serve.discovery.registry import DiscoveryClient, DiscoveryServer

__all__ = ["DiscoveryServer", "DiscoveryClient"]
