"""WorkerRequestHandler — loads the executor and executes requests.

Parity with the reference
(``/root/reference/marie/serve/runtimes/worker/request_handling.py:56``):
executor loading from class/YAML args, endpoint dispatch, dynamic-batching
queues per endpoint, multi-predecessor docs reduce, endpoint discovery,
snapshot/restore.
"""

import json
import os
import time
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional, Sequence, Type, Union

from marie_tpu.logging_core import MDC, MarieLogger
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.runtimes.worker.batch_queue import BatchQueue
from marie_tpu.types.docs import DocumentArray
from marie_tpu.types.request import DataRequest


class WorkerRequestHandler:
    def __init__(
        self,
        executor: Optional[BaseExecutor] = None,
        uses: Optional[Union[Type[BaseExecutor], str, dict]] = None,
        uses_with: Optional[Dict[str, Any]] = None,
        name: str = "executor",
        workspace: Optional[str] = None,
        hot_reload: bool = False,
        job_kv_path: Optional[str] = None,
        **kwargs,
    ):
        self.logger = MarieLogger(f"worker/{name}")
        self.name = name
        # per-request prometheus-scrapeable metrics (reference
        # request_handling.py:93-146 summaries/counters)
        from marie_tpu.metrics import MetricUnit, get_registry

        reg = get_registry()
        dims = {"runtime": "worker", "executor": name}
        self._m_latency = reg.metric(
            "request_seconds", MetricUnit.SECONDS, dims
        )
        self._m_docs = reg.metric("request_docs", MetricUnit.COUNT, dims)
        self._m_failed = reg.metric("failed_requests", MetricUnit.COUNT, dims)
        # wire-size observability (reference _record_request_size_ /
        # _record_response_size_monitoring, request_handling.py:532-585)
        self._m_req_bytes = reg.metric(
            "received_request_bytes", MetricUnit.BYTES, dims
        )
        self._m_resp_bytes = reg.metric(
            "sent_response_bytes", MetricUnit.BYTES, dims
        )
        # per-job bookkeeping KV (reference _record_started/_failed/
        # _successful_job, request_handling.py:1460-1556) — shared sqlite
        # file so the job dashboard stays truthful across worker crashes
        self._job_kv = None
        kv_path = job_kv_path or os.environ.get("MARIE_JOB_KV")
        if kv_path:
            try:
                from marie_tpu.storage.kv.sqlite_kv import SqliteKV

                self._job_kv = SqliteKV(kv_path)
            except Exception as ex:  # noqa: BLE001
                self.logger.warning(f"job KV unavailable: {ex!r}")
        self._uses, self._uses_with, self._workspace = uses, uses_with, workspace
        if executor is not None:
            self._executor = executor
        else:
            self._executor = self._load_executor(uses, uses_with, name, workspace)
        # one BatchQueue per (endpoint, parameters) so requests with
        # different parameters NEVER share a merged batch (reference
        # _batchqueue_instances[endpoint][param_key],
        # request_handling.py:739-753); instances materialize lazily per
        # distinct param set
        self._batch_queue_config: Dict[str, Dict] = {
            ep: dict(cfg)
            for ep, cfg in self._executor.dynamic_batching.items()
        }
        self._batch_queues: Dict[str, Dict[str, BatchQueue]] = {
            ep: {} for ep in self._batch_queue_config
        }
        self._reload_task = None
        if hot_reload:
            import asyncio

            try:
                self._reload_task = asyncio.get_running_loop().create_task(
                    self._hot_reload_loop()
                )
            except RuntimeError:
                pass  # no loop yet; caller can start it via start_hot_reload

    # ------------------------------------------------------------------
    async def _hot_reload_loop(self, interval: float = 1.0) -> None:
        """Reload the executor when its source module changes on disk
        (reference ``_hot_reload`` via watchfiles, request_handling.py:231;
        here an mtime poll — no watchfiles dependency)."""
        import importlib
        import inspect
        import os
        import asyncio

        module = inspect.getmodule(type(self._executor))
        src = getattr(module, "__file__", None)
        if src is None:
            return
        last = os.path.getmtime(src)
        while True:
            await asyncio.sleep(interval)
            try:
                mtime = os.path.getmtime(src)
            except OSError:
                continue
            if mtime == last:
                continue
            last = mtime
            self.logger.info(f"source change detected in {src}; reloading")
            try:
                importlib.reload(module)
                cls = getattr(module, type(self._executor).__name__)
                self._executor.close()
                self._executor = cls(
                    runtime_args={"name": self.name},
                    workspace=self._workspace,
                    **(self._uses_with or {}),
                )
            except Exception as ex:  # noqa: BLE001 — keep serving old code
                self.logger.error(f"hot reload failed: {ex!r}")

    # ------------------------------------------------------------------
    @staticmethod
    def _load_executor(uses, uses_with, name, workspace) -> BaseExecutor:
        uses_with = dict(uses_with or {})
        runtime_args = {"name": name, "workspace": workspace}
        if isinstance(uses, type) and issubclass(uses, BaseExecutor):
            return uses(runtime_args=runtime_args, workspace=workspace, **uses_with)
        if isinstance(uses, dict):
            from marie_tpu.jaml import JAML

            return JAML.construct(
                uses, expected_cls=BaseExecutor, extra_kwargs=uses_with
            )
        if isinstance(uses, str):
            import os

            if uses.startswith("hub://"):
                # executor-hub reference: resolve/install, then load the
                # bundle's config.yml (reference jinahub:// resolution)
                import sys

                from marie_tpu.hub import ExecutorHub

                hub = ExecutorHub(
                    registry_url=os.environ.get("MARIE_HUB_REGISTRY")
                )
                pkg_dir = hub.resolve(uses)
                if pkg_dir not in sys.path:
                    sys.path.insert(0, os.path.dirname(pkg_dir))
                    sys.path.insert(0, pkg_dir)
                config = os.path.join(pkg_dir, "config.yml")
                if not os.path.exists(config):
                    raise FileNotFoundError(
                        f"{uses}: bundle has no config.yml ({pkg_dir})"
                    )
                # import the bundle's py_modules so its jtype registers
                _import_py_modules(config)
                return BaseExecutor.load_config(
                    config, runtime_args=runtime_args, **uses_with
                )
            if not os.path.exists(uses) and "." in uses and "\n" not in uses:
                # dotted class path, e.g. mypkg.executors.MyExecutor
                import importlib

                mod_name, _, cls_name = uses.rpartition(".")
                try:
                    klass = getattr(importlib.import_module(mod_name), cls_name)
                    return klass(
                        runtime_args=runtime_args, workspace=workspace, **uses_with
                    )
                except (ImportError, AttributeError):
                    pass  # fall through to YAML loading for a clear error
            if os.path.isfile(uses) and uses.endswith((".yml", ".yaml")):
                # any config.yml may list py_modules to import, relative
                # to the config file (reference metas.py_modules —
                # scaffolded projects and hub bundles share the shape)
                _import_py_modules(uses)
            return BaseExecutor.load_config(
                uses, runtime_args=runtime_args, **uses_with
            )
        return BaseExecutor(runtime_args=runtime_args)

    @property
    def executor(self) -> BaseExecutor:
        return self._executor

    def _make_batch_fn(self, endpoint: str):
        async def _fn(docs, parameters):
            specific = (parameters or {}).get(self.name)
            if isinstance(specific, dict):
                parameters = {**parameters, **specific}
            return await self._executor.__acall__(endpoint, docs, parameters)

        return _fn

    # ------------------------------------------------------------------
    @staticmethod
    def reduce_docs(requests: Sequence[DataRequest]) -> DocumentArray:
        """Merge docs from multiple predecessor requests, deduped by id
        (reference doc-matrix reduce, ``request_handling.py:944``)."""
        seen = set()
        merged = DocumentArray()
        for req in requests:
            for doc in req.docs:
                if doc.id not in seen:
                    seen.add(doc.id)
                    merged.append(doc)
        return merged

    @staticmethod
    def merge_routes(requests: Sequence[DataRequest]) -> None:
        """Merge the routes of a request matrix into the first request so
        the response carries every executor hop that produced it, deduped
        by executor (reference ``merge_routes``,
        ``request_handling.py:855``)."""
        if len(requests) <= 1:
            return
        seen = {r.executor for r in requests[0].routes}
        for request in requests[1:]:
            for route in request.routes:
                if route.executor not in seen:
                    requests[0].proto.routes.add().CopyFrom(route)
                    seen.add(route.executor)

    async def process_data(
        self, requests: Sequence[DataRequest]
    ) -> DataRequest:
        """Execute one (or a matrix of) requests; returns the response."""
        req = requests[0]
        MDC.put("request_id", req.request_id)
        start = datetime.now(timezone.utc).isoformat()
        t0 = time.perf_counter()
        try:
            self._m_req_bytes.record(sum(r.proto.ByteSize() for r in requests))
        except Exception:  # noqa: BLE001 — metrics must never break serving
            pass
        job_id = (req.parameters or {}).get("job_id")
        await self._record_job(job_id, "started")
        try:
            target = req.target_executor
            if target and not _target_matches(target, self.name):
                return req  # not addressed to us — pass through

            if len(requests) > 1:
                docs = self.reduce_docs(requests)
                self.merge_routes(requests)
            else:
                docs = req.docs
            endpoint = req.exec_endpoint
            if (
                endpoint not in self._executor.requests
                and "/default" not in self._executor.requests
            ):
                # endpoint mismatch without a default endpoint: SKIP this
                # executor, docs pass through unchanged (reference
                # request_handling.py:714-726 — in a flow, only the
                # executors that serve the endpoint run)
                self.logger.debug(
                    f"skip executor: endpoint mismatch {endpoint!r} "
                    f"(serves {sorted(self._executor.requests)})"
                )
                req.docs = docs
                return req
            if self._executor.is_generator_endpoint(endpoint):
                # mirror the reference's "endpoint must be generator"
                # asymmetry (request_handling.py:1052): generator
                # endpoints only serve through the streaming RPCs
                raise ValueError(
                    f"endpoint {endpoint!r} is a generator endpoint — "
                    "call it via stream_doc / POST /post_stream"
                )

            # executor-specific parameters: a dict under this executor's
            # name overrides the top-level keys for THIS executor only
            # (reference _parse_params, request_handling.py:516)
            call_params = req.parameters
            specific = call_params.get(self.name)
            if isinstance(specific, dict):
                call_params = {**call_params, **specific}

            if endpoint in self._batch_queues:
                param_key = json.dumps(call_params, sort_keys=True, default=str)
                instances = self._batch_queues[endpoint]
                queue = instances.get(param_key)
                if queue is None:
                    queue = instances[param_key] = BatchQueue(
                        self._make_batch_fn(endpoint),
                        **self._batch_queue_config[endpoint],
                    )
                result = await queue.push(_clone_request(req, docs))
            else:
                result = await self._executor.__acall__(
                    endpoint, docs, call_params
                )

            if isinstance(result, DocumentArray):
                req.docs = result
            elif isinstance(result, list) and all(
                hasattr(d, "id") for d in result
            ):
                req.docs = DocumentArray(result)
            elif isinstance(result, dict):
                # dict returns ride along in parameters (reference puts
                # them under __results__ keyed by executor)
                params = req.parameters
                results_map = params.get("__results__", {})
                results_map[self.name] = result
                params["__results__"] = results_map
                req.parameters = params
                req.docs = docs
            else:
                req.docs = docs
            req.add_route(
                self.name, start, datetime.now(timezone.utc).isoformat()
            )
            self._m_latency.record(time.perf_counter() - t0)
            self._m_docs.record(len(req.docs))
            try:
                self._m_resp_bytes.record(req.proto.ByteSize())
            except Exception:  # noqa: BLE001
                pass
            await self._record_job(job_id, "successful")
            return req
        except Exception as ex:  # noqa: BLE001 — error travels in the envelope
            self.logger.error(f"endpoint {req.exec_endpoint} failed: {ex!r}")
            req.add_exception(ex, executor=type(self._executor).__name__)
            self._m_failed.record(1)
            await self._record_job(job_id, "failed", error=repr(ex))
            return req
        finally:
            MDC.remove("request_id")

    async def process_single_doc_stream(self, req: DataRequest):
        """Stream one document in → N documents out, yielding each doc AS
        the endpoint produces it (reference stream_doc generator contract,
        ``request_handling.py:1027-1052``).  Non-generator endpoints fall
        back to full processing and then yield the result docs."""
        endpoint = req.exec_endpoint
        if self._executor.is_generator_endpoint(endpoint):
            async for item in self._executor.__acall_stream__(
                endpoint, req.docs, req.parameters
            ):
                if isinstance(item, DocumentArray):
                    for d in item:
                        yield d
                else:
                    yield item
            return
        resp = await self.process_data([req])
        for d in resp.docs:
            yield d

    async def _record_job(
        self, job_id: Optional[str], state: str, error: Optional[str] = None
    ) -> None:
        """Per-job started/failed/successful record in the shared KV
        (reference request_handling.py:1460-1556) — written by the WORKER
        so the dashboard reflects reality even when the supervisor dies."""
        if not job_id or self._job_kv is None:
            return
        try:
            record = {
                "state": state,
                "executor": self.name,
                "timestamp": datetime.now(timezone.utc).isoformat(),
            }
            if error:
                record["error"] = error
            await self._job_kv.internal_kv_put(
                f"job/{job_id}/worker/{self.name}",
                json.dumps(record).encode(),
                namespace="worker_jobs",
            )
        except Exception as ex:  # noqa: BLE001 — bookkeeping must not fail serving
            self.logger.warning(f"job record write failed: {ex!r}")

    # ------------------------------------------------------------------
    def endpoints(self) -> Dict[str, Any]:
        """Endpoint discovery payload (JinaDiscoverEndpointsRPC parity)."""
        eps = sorted(self._executor.requests)
        return {
            "endpoints": eps,
            "write_endpoints": list(self._executor.write_endpoints),
            "schemas": {},
        }

    def info(self) -> Dict[str, Any]:
        from marie_tpu.helper import get_full_version

        return get_full_version()

    # ------------------------------------------------------------------
    def snapshot(self, snapshot_file: str) -> None:
        self._executor.snapshot(snapshot_file)

    def restore(self, snapshot_file: str) -> None:
        self._executor.restore(snapshot_file)

    async def close(self) -> None:
        for instances in self._batch_queues.values():
            for q in instances.values():
                await q.close()
        self._executor.close()


def _import_py_modules(config_path: str) -> None:
    """Import the ``py_modules`` a config.yml lists (paths relative to
    the config file) so their executor classes register for jtype
    construction (reference metas.py_modules loading)."""
    import importlib.util
    import os
    import sys

    import yaml as _yaml

    with open(config_path) as fp:
        cfg = _yaml.safe_load(fp) or {}
    base = os.path.dirname(os.path.abspath(config_path))
    for mod_rel in cfg.get("py_modules", []) or []:
        mod_path = os.path.join(base, mod_rel)
        mod_name = os.path.splitext(os.path.basename(mod_rel))[0]
        spec = importlib.util.spec_from_file_location(
            f"marie_pymod_{mod_name}", mod_path
        )
        module = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = module
        spec.loader.exec_module(module)


def _target_matches(pattern: str, name: str) -> bool:
    """``target_executor`` is a regex over executor names (reference
    gateway semantics, ``topology_graph.py:449``); a malformed pattern
    degrades to exact comparison."""
    import re

    try:
        return re.match(pattern, name) is not None
    except re.error:
        return pattern == name


def _clone_request(req: DataRequest, docs: DocumentArray) -> DataRequest:
    clone = DataRequest()
    clone.request_id = req.request_id
    clone.exec_endpoint = req.exec_endpoint
    clone.parameters = req.parameters
    clone.docs = docs
    return clone
