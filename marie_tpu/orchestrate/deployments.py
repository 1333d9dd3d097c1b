"""Deployment — a replicated executor (+ head when sharded).

Parity with the reference
(``/root/reference/marie/orchestrate/deployments/__init__.py:142``):
``replicas=N`` starts N worker pods balanced by the caller's connection
pool; ``shards=N`` adds a head pod doing ALL/ANY polling fan-out.  TPU
placement: one worker process per chip partition (the analog of
``CUDA_VISIBLE_DEVICES: RR``) — slot assignment is exported through
``TPU_VISIBLE_DEVICES``-style env per pod (configurable via
``env`` kwarg).
"""

from typing import Any, Dict, List, Optional, Type, Union

from marie_tpu.enums import PollingType
from marie_tpu.logging_core import MarieLogger
from marie_tpu.orchestrate.pods import Pod


class Deployment:
    def __init__(
        self,
        uses: Union[Type, str, dict, None] = None,
        uses_with: Optional[Dict[str, Any]] = None,
        name: str = "executor",
        replicas: int = 1,
        shards: int = 1,
        polling: str = "all",
        port: Optional[int] = None,
        protocol: str = "grpc",
        workspace: Optional[str] = None,
        needs: Optional[List[str]] = None,
        floating: bool = False,
        when: Optional[Dict[str, Any]] = None,
        stateful: bool = False,
        env: Optional[Dict[str, str]] = None,
        external: bool = False,
        host: str = "127.0.0.1",
        **kwargs,
    ):
        self.logger = MarieLogger(f"deployment/{name}")
        self.name = name
        # external deployments attach an already-running executor the
        # flow does NOT manage (reference Flow.add(external=True) —
        # tests/integration/external_deployment); host/port point at it
        self.external = external
        self.host = host
        self.uses = uses
        self.uses_with = uses_with
        self.replicas = replicas
        self.shards = shards
        self.polling = PollingType(polling.lower()) if isinstance(polling, str) else polling
        self.port = port
        self.protocol = protocol
        self.workspace = workspace
        self.needs = list(needs or [])
        self.floating = floating
        self.when = when
        self.stateful = stateful
        self.env = env or {}
        self.pods: List[Pod] = []
        self.head_pod: Optional[Pod] = None

    # ------------------------------------------------------------------
    def start(self) -> "Deployment":
        if self.external:
            if not self.port:
                raise ValueError(
                    f"external deployment {self.name!r} needs port="
                )
            return self  # nothing to spawn; addresses() points at it
        n_workers = self.replicas * self.shards
        raft_ports = None
        if self.stateful:
            from marie_tpu.helper import random_port

            raft_ports = [random_port() for _ in range(n_workers)]
        for i in range(n_workers):
            raft_cfg = None
            if raft_ports is not None:
                raft_cfg = {
                    "node_id": f"{self.name}-{i}",
                    "bind_addr": f"127.0.0.1:{raft_ports[i]}",
                    "peers": [
                        (f"{self.name}-{j}", f"127.0.0.1:{raft_ports[j]}")
                        for j in range(n_workers)
                        if j != i
                    ],
                }
            pod = Pod(
                "worker",
                uses=self.uses,
                uses_with=self.uses_with,
                name=self.name if n_workers == 1 else f"{self.name}/rep-{i}",
                workspace=self.workspace,
                protocol="grpc",
                port=self.port if (n_workers == 1 and self.shards == 1) else None,
                raft=raft_cfg,
            )
            self.pods.append(pod)
        for pod in self.pods:
            pod.start()

        if self.shards > 1:
            shard_addresses = {}
            for s in range(self.shards):
                shard_addresses[s] = [
                    self.pods[s * self.replicas + r].address
                    for r in range(self.replicas)
                ]
            self.head_pod = Pod(
                "head",
                shard_addresses=shard_addresses,
                # dicts carry per-endpoint polling ({'/index': 'any',
                # '*': 'all'}); plain modes travel as their string value
                polling=self.polling
                if isinstance(self.polling, dict)
                else str(self.polling),
                name=f"{self.name}/head",
                port=self.port,
            ).start()
        return self

    @property
    def addresses(self) -> List[str]:
        """Addresses the gateway should talk to."""
        if self.external:
            return [f"{self.host}:{self.port}"]
        if self.head_pod is not None:
            return [self.head_pod.address]
        return [p.address for p in self.pods]

    @property
    def first_port(self) -> int:
        if self.head_pod is not None:
            return self.head_pod.port
        return self.pods[0].port

    def is_ready(self) -> bool:
        pods = self.pods + ([self.head_pod] if self.head_pod else [])
        return all(p.is_alive() for p in pods)

    def close(self) -> None:
        if self.head_pod is not None:
            self.head_pod.close()
        for p in self.pods:
            p.close()
        self.pods = []
        self.head_pod = None

    def __enter__(self) -> "Deployment":
        return self.start()

    def __exit__(self, *args) -> None:
        self.close()

    def block(self) -> None:
        import time

        try:
            while self.is_ready():
                time.sleep(0.5)
        except KeyboardInterrupt:
            pass
