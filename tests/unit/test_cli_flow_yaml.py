import json

import pytest

from marie_tpu.excepts import FlowMissingDeploymentError, FlowTopologyError
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.parsers import build_parser


def test_parser_tree():
    p = build_parser()
    args = p.parse_args(["server", "--start", "--uses", "cfg.yml", "--port", "9000"])
    assert args.cli == "server" and args.start and args.port == 9000
    args = p.parse_args(["executor", "--uses", "pkg.Mod", "--name", "x"])
    assert args.cli == "executor"
    args = p.parse_args(["job", "submit", "--entrypoint", "/extract"])
    assert args.job_cmd == "submit"
    args = p.parse_args(["ping", "127.0.0.1:1234"])
    assert args.host == "127.0.0.1:1234"
    args = p.parse_args(["dryrun", "127.0.0.1:1234"])
    assert args.cli == "dryrun"
    args = p.parse_args(
        ["deployment", "--uses", "pkg.Mod", "--replicas", "2", "--shards", "2"]
    )
    assert args.cli == "deployment" and args.replicas == 2
    args = p.parse_args(
        ["gateway", "--deployments", '{"a": ["127.0.0.1:1"]}']
    )
    assert args.cli == "gateway"
    with pytest.raises(SystemExit):
        p.parse_args(["nonsense"])


def test_flow_yaml_roundtrip_and_graph(monkeypatch):
    monkeypatch.setenv("TEST_FLOW_PORT", "5123")
    yml = """
jtype: Flow
with:
  port: ${{ ENV.TEST_FLOW_PORT }}
  protocol: grpc
executors:
  - name: a
    uses:
      jtype: marie_tpu.executor.TextExtractionExecutorMock
  - name: b
    needs: [a]
    uses:
      jtype: marie_tpu.executor.TextExtractionExecutorMock
  - name: c
    needs: [a]
    uses:
      jtype: marie_tpu.executor.TextExtractionExecutorMock
"""
    flow = Flow.load_config(yml)
    assert flow.port == 5123
    graph = flow.build()
    assert graph["start-gateway"] == ["a"]
    assert sorted(graph["a"]) == ["b", "c"]
    assert graph["b"] == ["end-gateway"]
    assert graph["c"] == ["end-gateway"]


def test_flow_validation_errors():
    with pytest.raises(FlowMissingDeploymentError):
        Flow().add(name="x", needs=["ghost"])
    f = Flow().add(name="a").add(name="b", needs=["a"])
    with pytest.raises(FlowTopologyError):
        f.add(name="a")  # duplicate


def test_needs_all_joins_leaves():
    f = (
        Flow()
        .add(name="a")
        .add(name="b", needs=["gateway"])
        .needs_all(name="join")
    )
    graph = f.build()
    assert sorted(graph["a"]) == ["join"]
    assert sorted(graph["b"]) == ["join"]
    assert graph["join"] == ["end-gateway"]


def test_service_config_parses(monkeypatch):
    flow = Flow.load_config("config/service/marie.yml")
    graph = flow.build()
    assert "extract_t" in graph["start-gateway"]


def test_flow_export_kubernetes_and_compose():
    import yaml as _yaml

    from marie_tpu.executor.text_extraction_executor import (
        TextExtractionExecutorMock,
    )

    f = Flow().add(uses=TextExtractionExecutorMock, name="ocr", replicas=2)
    k8s = f.to_kubernetes_yaml(namespace="prod")
    docs = list(_yaml.safe_load_all(k8s))
    kinds = [(d["kind"], d["metadata"]["name"]) for d in docs]
    assert ("Deployment", "marie-ocr") in kinds
    assert ("Service", "marie-ocr") in kinds
    assert ("Deployment", "marie-gateway") in kinds
    dep = next(d for d in docs if d["metadata"]["name"] == "marie-ocr"
               and d["kind"] == "Deployment")
    assert dep["spec"]["replicas"] == 2
    container = dep["spec"]["template"]["spec"]["containers"][0]
    assert container["resources"]["limits"]["google.com/tpu"] == 1
    assert "TextExtractionExecutorMock" in " ".join(container["args"])

    compose = _yaml.safe_load(f.to_docker_compose_yaml())
    assert "ocr" in compose["services"]
    assert "gateway" in compose["services"]
    assert compose["services"]["ocr"]["deploy"]["replicas"] == 2


def test_full_schema_export():
    """CLI `export --kind schema` analog of reference marie/schemas."""
    from marie_tpu.schemas import get_full_schema

    schema = get_full_schema()
    assert schema["$schema"] == "http://json-schema.org/draft-07/schema#"
    defs = schema["definitions"]
    assert set(defs) == {"Marie::Flow", "Marie::Deployment", "Marie::Executor"}
    flow = defs["Marie::Flow"]
    assert flow["properties"]["jtype"]["const"] == "Flow"
    # constructor kwargs are introspected into `with`
    assert "port" in flow["properties"]["with"]["properties"]
    # flow-level executors list refs the Deployment definition
    items = flow["properties"]["executors"]["items"]
    assert items == {"$ref": "#/definitions/Marie::Deployment"}
    # the whole thing must be JSON-serializable (CLI prints it)
    json.dumps(schema)


def test_export_parser_kinds():
    p = build_parser()
    args = p.parse_args(["export", "--kind", "schema"])
    assert args.kind == "schema" and args.uses is None
    args = p.parse_args(
        ["export", "--uses", "f.yml", "--kind", "kubernetes", "--namespace", "prod"]
    )
    assert args.kind == "kubernetes" and args.namespace == "prod"


def test_flow_mermaid_export():
    """Flowchart export (reference Flow._mermaid_str / `marie export
    flowchart`): every deployment is a node, edges follow `needs`,
    gateway is source and sink, replicas/shards annotate the label."""
    from marie_tpu.executor.text_extraction_executor import (
        TextExtractionExecutorMock,
    )
    from marie_tpu.orchestrate.export import to_mermaid

    f = (
        Flow()
        .add(uses=TextExtractionExecutorMock, name="a", replicas=2)
        .add(uses=TextExtractionExecutorMock, name="b", needs=["a"])
        .add(uses=TextExtractionExecutorMock, name="c", needs=["a"], shards=2)
        .needs_all(name="join")
    )
    m = to_mermaid(f)
    assert m.startswith("flowchart LR")
    assert 'a["a<br/>x2"]' in m
    assert 'c["c<br/>2 shards"]' in m
    assert "    gateway --> a" in m
    assert "    a --> b" in m and "    a --> c" in m
    assert "    b --> join" in m and "    c --> join" in m
    assert "    join --> gateway" in m
