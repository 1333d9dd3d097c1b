"""Flow export to Kubernetes / docker-compose.

Parity with the reference's deployment config export
(``/root/reference/marie/orchestrate/deployments/config/k8s.py`` and
``docker_compose.py``; surfaced as ``Flow.to_kubernetes_yaml`` /
``to_docker_compose_yaml``).  Each deployment becomes a Deployment+Service
pair (or a compose service) running ``marie executor``; the gateway maps
the flow topology via args.  TPU placement: worker pods request
``google.com/tpu`` resources and set the TPU topology env.
"""

from typing import Any, Dict, List, Optional

import yaml

_DEFAULT_IMAGE = "marie-tpu:latest"


def _executor_args(name: str, uses: Any) -> List[str]:
    uses_ref = uses if isinstance(uses, str) else getattr(uses, "__name__", str(uses))
    if not isinstance(uses, str) and hasattr(uses, "__module__"):
        uses_ref = f"{uses.__module__}.{uses.__name__}"
    return [
        "executor",
        "--uses", uses_ref,
        "--name", name,
        "--port", "8080",
    ]


def flow_to_kubernetes(flow, namespace: str = "marie", image: str = _DEFAULT_IMAGE,
                       tpu_resource: Optional[str] = "google.com/tpu",
                       tpu_count: int = 1) -> List[Dict[str, Any]]:
    """Returns a list of k8s manifests (Deployments + Services + gateway)."""
    manifests: List[Dict[str, Any]] = []
    for name, dep in flow._deployments.items():
        labels = {"app": f"marie-{name}"}
        container: Dict[str, Any] = {
            "name": name,
            "image": image,
            "args": _executor_args(name, dep.uses),
            "ports": [{"containerPort": 8080}],
        }
        if tpu_resource:
            container["resources"] = {
                "limits": {tpu_resource: tpu_count},
            }
        manifests.append(
            {
                "apiVersion": "apps/v1",
                "kind": "Deployment",
                "metadata": {"name": f"marie-{name}", "namespace": namespace},
                "spec": {
                    "replicas": dep.replicas,
                    "selector": {"matchLabels": labels},
                    "template": {
                        "metadata": {"labels": labels},
                        "spec": {"containers": [container]},
                    },
                },
            }
        )
        manifests.append(
            {
                "apiVersion": "v1",
                "kind": "Service",
                "metadata": {"name": f"marie-{name}", "namespace": namespace},
                "spec": {
                    "selector": labels,
                    "ports": [{"port": 8080, "targetPort": 8080}],
                },
            }
        )
    # gateway
    graph = flow._graph_representation()
    addresses = {
        name: [f"marie-{name}.{namespace}.svc:8080"]
        for name in flow._deployments
    }
    import json

    gw_labels = {"app": "marie-gateway"}
    manifests.append(
        {
            "apiVersion": "apps/v1",
            "kind": "Deployment",
            "metadata": {"name": "marie-gateway", "namespace": namespace},
            "spec": {
                "replicas": 1,
                "selector": {"matchLabels": gw_labels},
                "template": {
                    "metadata": {"labels": gw_labels},
                    "spec": {
                        "containers": [
                            {
                                "name": "gateway",
                                "image": image,
                                "command": ["python", "-m", "marie_tpu_cli"],
                                "args": ["server", "--start"],
                                "env": [
                                    {"name": "MARIE_GRAPH", "value": json.dumps(graph)},
                                    {"name": "MARIE_DEPLOYMENTS", "value": json.dumps(addresses)},
                                ],
                                "ports": [{"containerPort": 8080}],
                            }
                        ]
                    },
                },
            },
        }
    )
    manifests.append(
        {
            "apiVersion": "v1",
            "kind": "Service",
            "metadata": {"name": "marie-gateway", "namespace": namespace},
            "spec": {
                "selector": gw_labels,
                "ports": [{"port": 8080, "targetPort": 8080}],
                "type": "LoadBalancer",
            },
        }
    )
    return manifests


def flow_to_docker_compose(flow, image: str = _DEFAULT_IMAGE) -> Dict[str, Any]:
    services: Dict[str, Any] = {}
    for name, dep in flow._deployments.items():
        services[name] = {
            "image": image,
            "entrypoint": ["python", "-m", "marie_tpu_cli"],
            "command": _executor_args(name, dep.uses),
            "deploy": {"replicas": dep.replicas},
            "expose": [8080],
        }
    import json

    graph = flow._graph_representation()
    addresses = {n: [f"{n}:8080"] for n in flow._deployments}
    services["gateway"] = {
        "image": image,
        "entrypoint": ["python", "-m", "marie_tpu_cli"],
        "command": ["server", "--start"],
        "environment": {
            "MARIE_GRAPH": json.dumps(graph),
            "MARIE_DEPLOYMENTS": json.dumps(addresses),
        },
        "ports": ["8080:8080"],
        "depends_on": list(flow._deployments),
    }
    return {"version": "3.8", "services": services}


def to_kubernetes_yaml(flow, **kwargs) -> str:
    return yaml.safe_dump_all(flow_to_kubernetes(flow, **kwargs), sort_keys=False)


def to_docker_compose_yaml(flow, **kwargs) -> str:
    return yaml.safe_dump(flow_to_docker_compose(flow, **kwargs), sort_keys=False)


def to_mermaid(flow, direction: str = "LR") -> str:
    """Render the flow DAG as a mermaid flowchart (reference
    ``Flow._mermaid_str``, ``orchestrate/flow/base.py:2130`` — the text
    behind ``Flow.plot()``).  Gateway is the source/sink; replicas and
    shards annotate the node label."""
    lines = [f"flowchart {direction}"]
    lines.append('    gateway([gateway])')
    graph = flow._graph_representation()
    names = {n for dsts in graph.values() for n in dsts} | set(graph)
    names -= {"start-gateway", "end-gateway"}
    for name in sorted(names):
        dep = flow._deployments.get(name)
        label = name
        if dep is not None:
            extras = []
            if getattr(dep, "replicas", 1) > 1:
                extras.append(f"x{dep.replicas}")
            if getattr(dep, "shards", 1) > 1:
                extras.append(f"{dep.shards} shards")
            if getattr(dep, "external", False):
                extras.append("external")
            if extras:
                label = f"{name}<br/>{' / '.join(extras)}"
        lines.append(f'    {name}["{label}"]')
    for src, dsts in sorted(graph.items()):
        s = "gateway" if src == "start-gateway" else src
        for dst in dsts:
            d = "gateway" if dst == "end-gateway" else dst
            lines.append(f"    {s} --> {d}")
    # leaves implicitly feed the response
    for leaf in flow._leaves():
        edge = f"    {leaf} --> gateway"
        if edge not in lines:
            lines.append(edge)
    return "\n".join(lines)
