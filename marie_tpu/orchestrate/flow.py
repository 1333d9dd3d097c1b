"""Flow — a DAG of deployments behind a gateway.

Parity with the reference (``/root/reference/marie/orchestrate/flow/base.py:118``):
``.add(uses=..., needs=[...])`` chains deployments, ``needs_all()`` joins
all leaves, context-manager lifecycle, ``.block()``, YAML round-trip via
JAML (``jtype: Flow`` with ``executors:`` list), gateway protocol/port
config.
"""

from typing import Any, Dict, List, Optional, Sequence, Type, Union

from marie_tpu.enums import ProtocolType
from marie_tpu.excepts import FlowMissingDeploymentError, FlowTopologyError
from marie_tpu.jaml import JAML, JAMLCompatible
from marie_tpu.logging_core import MarieLogger
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.orchestrate.pods import Pod

GATEWAY = "gateway"


class Flow(JAMLCompatible):
    def __init__(
        self,
        port: Optional[int] = None,
        protocol: Union[str, Sequence[str]] = "grpc",
        prefetch: int = 0,
        name: str = "flow",
        **kwargs,
    ):
        self.logger = MarieLogger(f"flow/{name}")
        self.name = name
        self.port = port
        self.protocols = (
            [protocol] if isinstance(protocol, str) else list(protocol)
        )
        self.prefetch = prefetch
        self._deployments: Dict[str, Deployment] = {}
        self._last_added: Optional[str] = None
        self.gateway_pod: Optional[Pod] = None
        self._started = False

    # ------------------------------------------------------------------
    def add(
        self,
        uses: Union[Type, str, dict, None] = None,
        name: Optional[str] = None,
        needs: Optional[Union[str, List[str]]] = None,
        **kwargs,
    ) -> "Flow":
        name = name or f"executor{len(self._deployments)}"
        if name in self._deployments:
            raise FlowTopologyError(f"duplicate deployment name {name!r}")
        if needs is None:
            needs = [self._last_added] if self._last_added else []
        elif isinstance(needs, str):
            needs = [needs]
        for n in needs:
            if n != GATEWAY and n not in self._deployments:
                raise FlowMissingDeploymentError(
                    f"deployment {name!r} needs unknown {n!r}"
                )
        dep = Deployment(uses=uses, name=name, needs=needs, **kwargs)
        self._deployments[name] = dep
        self._last_added = name
        return self

    def needs_all(self, name: str = "joiner", **kwargs) -> "Flow":
        """Join all current leaves into one node (reference :836)."""
        leaves = self._leaves()
        return self.add(name=name, needs=leaves, **kwargs)

    def _leaves(self) -> List[str]:
        needed = set()
        for dep in self._deployments.values():
            needed.update(dep.needs)
        return [n for n in self._deployments if n not in needed]

    # ------------------------------------------------------------------
    def _graph_representation(self) -> Dict[str, List[str]]:
        graph: Dict[str, List[str]] = {"start-gateway": []}
        for name, dep in self._deployments.items():
            srcs = dep.needs or ["start-gateway"]
            for src in srcs:
                key = "start-gateway" if src == GATEWAY else src
                graph.setdefault(key, []).append(name)
        for leaf in self._leaves():
            graph.setdefault(leaf, []).append("end-gateway")
        return graph

    def build(self) -> Dict[str, List[str]]:
        graph = self._graph_representation()
        # validation happens inside TopologyGraph
        from marie_tpu.serve.runtimes.gateway.topology_graph import TopologyGraph

        TopologyGraph(graph)
        return graph

    # ------------------------------------------------------------------
    def start(self) -> "Flow":
        graph = self.build()
        for dep in self._deployments.values():
            dep.start()
        executor_addresses = {
            name: dep.addresses for name, dep in self._deployments.items()
        }
        floating = [d.name for d in self._deployments.values() if d.floating]
        conditions = {
            d.name: d.when for d in self._deployments.values() if d.when
        }
        self.gateway_pod = Pod(
            "gateway",
            graph_representation=graph,
            executor_addresses=executor_addresses,
            prefetch=self.prefetch,
            floating_deployments=floating,
            node_conditions=conditions,
            name=f"{self.name}/gateway",
            protocols=self.protocols,
            ports=[self.port] + [None] * (len(self.protocols) - 1),
            port=self.port,
        ).start()
        self._started = True
        return self

    @property
    def port_gateway(self) -> int:
        return self.gateway_pod.port if self.gateway_pod else (self.port or 0)

    @property
    def gateway_address(self) -> str:
        return f"127.0.0.1:{self.port_gateway}"

    def close(self) -> None:
        if self.gateway_pod is not None:
            self.gateway_pod.close()
            self.gateway_pod = None
        for dep in self._deployments.values():
            dep.close()
        self._started = False

    def __enter__(self) -> "Flow":
        return self.start()

    def __exit__(self, *args) -> None:
        self.close()

    def block(self) -> None:
        import time

        try:
            while self.gateway_pod is not None and self.gateway_pod.is_alive():
                time.sleep(0.5)
        except KeyboardInterrupt:
            pass

    # ------------------------------------------------------------------
    @classmethod
    def _from_yaml_config(cls, with_kwargs: Dict[str, Any], metas=None, raw=None):
        """Build a Flow from JAML config:

        jtype: Flow
        with: {port: ..., protocol: ...}
        executors:
          - name: ocr
            uses: {jtype: MyExec, with: {...}}
            needs: [..]
        """
        raw = raw or {}
        flow = cls(**with_kwargs)
        for item in raw.get("executors", []) or []:
            item = dict(item)
            uses = item.pop("uses", None)
            flow.add(uses=uses, **item)
        return flow

    def config_gateway(self, prefetch: int = 0, **kwargs) -> "Flow":
        self.prefetch = prefetch
        return self

    # --- deployment export (reference k8s.py / docker_compose.py) -------
    def to_kubernetes_yaml(self, **kwargs) -> str:
        from marie_tpu.orchestrate.export import to_kubernetes_yaml

        return to_kubernetes_yaml(self, **kwargs)

    def to_docker_compose_yaml(self, **kwargs) -> str:
        from marie_tpu.orchestrate.export import to_docker_compose_yaml

        return to_docker_compose_yaml(self, **kwargs)
