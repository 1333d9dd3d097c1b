"""Head-runtime depth: per-endpoint polling and shard-proxied endpoint
discovery (reference head request_handling.py:137 no_reduce/polling
config; endpoint_discovery forwarded to workers)."""

from marie_tpu.clients import Client
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document
from tests.integration.executors import EchoExecutor, ShardIdentityExecutor


def test_per_endpoint_polling_map():
    """polling={'/collect': 'all', '*': 'any'}: /collect broadcasts to
    every shard (one identity doc per shard), /one routes to a single
    shard."""
    with Deployment(
        uses=ShardIdentityExecutor, name="sid", shards=2,
        polling={"/collect": "all", "*": "any"},
    ) as dep:
        client = Client(port=dep.head_pod.port)
        docs = client.post("/collect", [Document(text="x")])
        assert len(docs) == 2, [d.id for d in docs]  # one per shard
        assert len({d.id for d in docs}) == 2

        docs = client.post("/one", [Document(text="x")])
        assert len(docs) == 1  # ANY routed to exactly one shard


def test_sharded_deployment_behind_gateway_serves_endpoints():
    """The gateway's endpoint filter must SEE the real endpoint surface
    behind a head (discovery proxied to shards) — a sharded deployment
    is not skipped for endpoints its workers serve."""
    flow = Flow().add(uses=EchoExecutor, name="e", shards=2)
    with flow:
        client = Client(port=flow.port_gateway)
        docs = client.post("/echo", [Document(text="s")])
        assert docs[0].text == "echo:s"
