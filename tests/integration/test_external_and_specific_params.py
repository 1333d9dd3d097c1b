"""External deployments + executor-specific parameters (reference
tests/integration/{external_deployment,override_executor_specific_params})."""

from marie_tpu.clients import Client
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document
from tests.integration.executors import EchoExecutor, SuffixExecutor


def test_flow_attaches_external_deployment():
    """A flow routes through an executor it does not manage (started
    separately, attached by host/port with external=True)."""
    with Deployment(uses=SuffixExecutor, uses_with={"suffix": "+ext"},
                    name="standalone") as ext:
        flow = Flow().add(
            name="ext", external=True, port=ext.first_port,
        )
        with flow:
            client = Client(port=flow.port_gateway)
            docs = client.post("/default", [Document(text="a")])
            assert docs[0].text == "a+ext"
        # the external executor must survive the flow's shutdown
        assert all(p.is_alive() for p in ext.pods)
        client2 = Client(port=ext.first_port)
        docs = client2.post("/default", [Document(text="b")])
        assert docs[0].text == "b+ext"


def test_executor_specific_parameters():
    """parameters[<executor name>] overrides top-level keys for that
    executor only (reference _parse_params, request_handling.py:516)."""
    flow = (
        Flow()
        .add(uses=EchoExecutor, name="first")
        .add(uses=EchoExecutor, name="second", needs=["first"])
    )
    with flow:
        client = Client(port=flow.port_gateway)
        docs = client.post(
            "/tag",
            [Document(text="x")],
            parameters={
                "value": "default",
                "second": {"value": "second-only"},
            },
        )
        # the LAST hop's tag wins in the doc; assert per-hop by posting
        # to each deployment's endpoint separately
        assert docs[0].tags["tagged"] == "second-only"

        docs = client.post(
            "/tag",
            [Document(text="y")],
            parameters={"value": "default", "first": {"value": "F"}},
            target_executor="first",
        )
        assert docs[0].tags["tagged"] == "F"


def test_grpc_gzip_compression_roundtrip():
    """Gzip-compressed client against a gzip-compressed deployment
    (reference test_grpc_compression)."""
    from marie_tpu.clients.grpc_client import GRPCClient

    with Deployment(uses=EchoExecutor, name="gz") as dep:
        client = GRPCClient(port=dep.first_port, compression="Gzip")
        docs = client.post("/echo", [Document(text="zip" * 2000)])
        assert docs[0].text == "echo:" + "zip" * 2000
