from marie_tpu.serve.discovery.etcd_client import EtcdClient
from marie_tpu.serve.discovery.registry import DiscoveryClient, DiscoveryServer

__all__ = ["DiscoveryServer", "DiscoveryClient", "EtcdClient"]
