"""marie server shell — boots a Flow from YAML and binds the job/REST
control plane around it.

Parity with the reference server bootstrap
(``/root/reference/marie_server/__main__.py:134-330`` +
``marie/serve/runtimes/servers/marie_gateway.py:84``): env-file loading,
YAML with ENV/CONTEXT substitution, Flow start, job manager + scheduler +
REST ``/api/jobs/*`` API, Toast event wiring, auth.
"""

import asyncio
import json
import os
from typing import Any, Dict, List, Optional

from marie_tpu.logging_core import MarieLogger

logger = MarieLogger("server")


def load_env_file(path: Optional[str]) -> None:
    if not path or not os.path.exists(path):
        return
    with open(path) as fp:
        for line in fp:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, _, v = line.partition("=")
                os.environ.setdefault(k.strip(), v.strip())


def run_server(
    uses: Optional[str] = None,
    port: Optional[int] = None,
    protocols: Optional[List[str]] = None,
    env_file: Optional[str] = None,
) -> int:
    """``marie server --start --uses config.yml``"""
    from marie_tpu.helper import random_port
    from marie_tpu.orchestrate.flow import Flow

    load_env_file(env_file)
    # workers record per-job started/failed/successful into this shared KV
    # (reference worker request_handling.py:1460-1556 -> psql KV)
    os.makedirs("/tmp/marie", exist_ok=True)
    os.environ.setdefault("MARIE_JOB_KV", "/tmp/marie/kv.db")

    # cold-start killers (VERDICT r3 #6): persistent HLO cache + eager
    # deserialization of AOT-pinned serving executables, BEFORE the flow
    # spawns workers — the first request must not pay compile/load
    try:
        from marie_tpu.utils.jax_cache import enable_persistent_cache
        from marie_tpu.utils.program_zoo import prewarm

        enable_persistent_cache()
        n = prewarm()
        if n:
            logger.info(f"program zoo pre-warmed {n} executables")
    except Exception as ex:  # noqa: BLE001 — warm-up is best-effort
        logger.warning(f"program-zoo prewarm skipped: {ex!r}")

    if uses:
        _setup_auth(uses)
        flow = Flow.load_config(uses, context=dict(os.environ))
    else:
        # default: a mock extract flow so the control plane runs standalone
        from marie_tpu.serve.executors import BaseExecutor

        flow = Flow().add(uses=BaseExecutor, name="noop")
    if port:
        flow.port = port
    if protocols:
        flow.protocols = list(protocols)

    rest_port = random_port()
    with flow:
        logger.info(f"flow gateway at {flow.gateway_address}")
        try:
            asyncio.run(_run_control_plane(flow, rest_port))
        except KeyboardInterrupt:
            pass
    return 0


def _setup_auth(config_path: str) -> None:
    """Load API keys from the server YAML's ``auth.keys`` section
    (reference: marie_server/__main__.py setup_auth +
    config/service/marie.yml:266-276). Once keys exist, every server in
    this process enforces bearer auth."""
    try:
        from marie_tpu.auth import APIKeyManager
        from marie_tpu.jaml import JAML

        conf = JAML.load_config(config_path, context=dict(os.environ))
        keys = (conf.get("auth") or {}).get("keys") if isinstance(conf, dict) else None
        if keys:
            APIKeyManager.from_config(keys)
            logger.info(f"auth enabled with {len(keys)} configured key(s)")
    except Exception as ex:  # noqa: BLE001
        logger.warning(f"auth config not loaded: {ex!r}")


async def _run_control_plane(
    flow, rest_port: int, state_dir: str = "/tmp/marie"
) -> None:
    """REST job API + scheduler bound to the running flow."""
    import os

    os.makedirs(state_dir, exist_ok=True)
    from aiohttp import web

    from marie_tpu.clients import Client
    from marie_tpu.enums import JobStatus, WorkState
    from marie_tpu.job.job_manager import JobManager
    from marie_tpu.messaging import Toast
    from marie_tpu.messaging.native_handler import NativeToastHandler
    from marie_tpu.scheduler.models import WorkInfo
    from marie_tpu.scheduler.sql import SqlJobScheduler
    from marie_tpu.storage.kv.sqlite_kv import SqliteKV
    from marie_tpu.types.docs import Document, DocumentArray

    Toast.register(NativeToastHandler(os.path.join(state_dir, "events.jsonl")), native=True)

    kv = SqliteKV(os.path.join(state_dir, "kv.db"))
    client = Client(port=flow.port_gateway)

    async def distributor(job_id: str, info):
        meta = info.metadata or {}
        docs = DocumentArray(
            [Document(tags={"job_id": job_id, **meta.get("doc_tags", {})})]
        )
        return {
            "docs": len(
                await client.apost(
                    on=info.entrypoint or "/default",
                    inputs=docs,
                    parameters={"job_id": job_id, **meta.get("parameters", {})},
                )
            )
        }

    job_manager = JobManager(kv, job_distributor=distributor)

    async def scheduler_handler(work: WorkInfo) -> bool:
        job_id = await job_manager.submit_job(
            entrypoint=work.data.get("entrypoint", "/default"),
            metadata=work.data.get("metadata", {}),
        )
        # wait for terminal status
        while True:
            status = await job_manager.get_job_status(job_id)
            if status.is_terminal:
                return status == JobStatus.SUCCEEDED
            await asyncio.sleep(0.25)

    scheduler = SqlJobScheduler(
        os.path.join(state_dir, "scheduler.db"), job_handler=scheduler_handler
    )
    await scheduler.start()

    from marie_tpu.serve.runtimes.servers.http_server import make_auth_middleware

    app = web.Application(middlewares=[make_auth_middleware()])

    async def submit(request):
        body = await request.json()
        work = WorkInfo(
            name=body.get("queue", "default"),
            data={
                "entrypoint": body.get("entrypoint", "/default"),
                "metadata": body.get("metadata", {}),
            },
            priority=int(body.get("priority", 0)),
            retry_limit=int(body.get("retry_limit", 2)),
            # pg-boss extras carried by the scheduler schema
            dead_letter=body.get("dead_letter"),
            keep_until=float(body.get("keep_until", 0.0)),
        )
        job_id = await scheduler.submit_job(work)
        return web.json_response({"jobid": job_id, "status": "ok"})

    async def list_jobs(request):
        jobs = await scheduler.list_jobs()
        return web.json_response(
            {"jobs": [w.model_dump(mode="json") for w in jobs]}
        )

    async def job_info(request):
        job_id = request.match_info["job_id"]
        work = await scheduler.get_job(job_id)
        if work is None:
            return web.json_response({"error": "not found"}, status=404)
        payload = work.model_dump(mode="json")
        # worker-side execution records (truthful across worker crashes)
        try:
            keys = await kv.internal_kv_keys(
                f"job/{job_id}/worker/", namespace="worker_jobs"
            )
            workers = {}
            for k in keys:
                raw = await kv.internal_kv_get(k, namespace="worker_jobs")
                if raw:
                    workers[k.rsplit("/", 1)[-1]] = json.loads(raw)
            if workers:
                payload["workers"] = workers
        except Exception:  # noqa: BLE001 — records are best-effort
            pass
        return web.json_response(payload)

    async def stop_job(request):
        ok = await scheduler.cancel_job(request.match_info["job_id"])
        return web.json_response({"stopped": ok})

    async def delete_job(request):
        ok = await scheduler.cancel_job(request.match_info["job_id"])
        return web.json_response({"deleted": ok})

    async def health(request):
        return web.json_response({"status": "OK"})

    async def metrics(request):
        from marie_tpu.metrics import render_prometheus

        return web.Response(
            text=render_prometheus(), content_type="text/plain", charset="utf-8"
        )

    # SSE event stream (reference marie_gateway SSE endpoints)
    subscribers: list = []

    class _SSEToast:
        def notify(self, event, notification, **kw):
            for q in list(subscribers):
                q.put_nowait({"event": event, **notification})

    Toast.register(_SSEToast())

    async def events_stream(request):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            }
        )
        await resp.prepare(request)
        q: asyncio.Queue = asyncio.Queue()
        subscribers.append(q)
        try:
            while True:
                ev = await q.get()
                await resp.write(
                    f"event: {ev.get('event', 'message')}\n"
                    f"data: {json.dumps(ev)}\n\n".encode()
                )
        except (ConnectionResetError, asyncio.CancelledError):
            pass
        finally:
            subscribers.remove(q)
        return resp

    async def nodes(request):
        """Deployment/node listing (reference /api/invoke nodes command)."""
        return web.json_response(
            {
                "gateway": f"127.0.0.1:{flow.port_gateway}",
                "deployments": {
                    name: dep.addresses
                    for name, dep in flow._deployments.items()
                },
            }
        )

    def make_document_forwarder(flow_endpoint: str):
        """REST façade forwarding into a flow endpoint (reference
        rest_extension.py:144 + the per-capability mserve routers
        ``marie_server/executors/{extract,ner,classifier,overlay}``)."""

        async def forwarder(request):
            body = await request.json()
            doc = Document(tags={})
            if body.get("uri") and not body.get("data"):
                # pass the uri through — the executor resolves it
                doc.uri = body["uri"]
            else:
                # full payload key zoo: data/srcData/srcBase64/srcFile/
                # srcUrl (reference extract_payload, marie/api:56)
                from marie_tpu.api.payload import parse_payload_to_frames

                try:
                    frames, checksum, _ = parse_payload_to_frames(
                        body, body.get("queue_id", "api")
                    )
                except (ValueError, FileNotFoundError) as ex:
                    return web.json_response(
                        {"error": str(ex) or
                         "request needs 'data' (base64) or 'uri'"},
                        status=400,
                    )
                doc.tensor = frames[0]
                doc.tags["checksum"] = checksum
                doc.tags["pages"] = len(frames)
            params = {
                "mode": body.get("mode", "sparse"),
                "output_format": body.get("output_format", "xywh"),
                "features": body.get("features", {}),
            }
            if body.get("doc_id"):
                params["doc_id"] = body["doc_id"]
            if body.get("doc_type"):
                params["doc_type"] = body["doc_type"]
            if body.get("regions"):
                params["regions"] = body["regions"]
            try:
                resp = await client.apost(
                    on=flow_endpoint, inputs=DocumentArray([doc]),
                    parameters=params, return_responses=True,
                )
            except Exception as ex:  # noqa: BLE001
                return web.json_response(
                    {"status": "failed", "error": repr(ex)}, status=500
                )
            results = resp.parameters.get("__results__", {})
            payload = next(iter(results.values()), {}) if results else {}
            if not payload and len(resp.docs):
                # executors that annotate docs instead of returning dicts
                payload = {
                    "status": "succeeded",
                    "docs": resp.docs.to_dict(),
                }
            return web.json_response(payload if payload else {"status": "succeeded"})

        return forwarder

    async def capability_status(request):
        """Per-capability status probes (reference ``/api/*/status``)."""
        return web.json_response({"status": "OK"})

    # the reference's per-capability REST surface
    # (marie_server/executors/*/mserve_torch.py)
    app.router.add_post(
        "/api/document/extract", make_document_forwarder("/document/extract")
    )
    app.router.add_post(
        "/api/ner/extract", make_document_forwarder("/ner/extract")
    )
    app.router.add_post(
        "/api/document/classify", make_document_forwarder("/document/classify")
    )
    app.router.add_post(
        "/api/overlay", make_document_forwarder("/overlay/segment")
    )
    for probe in ("/api/document/status", "/api/ner/status",
                  "/api/overlay/status"):
        app.router.add_get(probe, capability_status)
    async def schedule_put(request):
        """Cron schedules over the wire (pg-boss schedule semantics)."""
        body = await request.json()
        try:
            scheduler.schedule(
                body["queue"], body["cron"], data=body.get("data") or {}
            )
        except (KeyError, ValueError) as ex:
            return web.json_response({"error": repr(ex)}, status=400)
        return web.json_response({"status": "ok"})

    async def schedule_list(request):
        return web.json_response({"schedules": scheduler.schedules()})

    async def schedule_delete(request):
        ok = scheduler.unschedule(request.match_info["name"])
        if not ok:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response({"status": "ok"})

    app.router.add_post("/api/schedules", schedule_put)
    app.router.add_get("/api/schedules", schedule_list)
    app.router.add_delete("/api/schedules/{name}", schedule_delete)
    app.router.add_post("/api/jobs/submit", submit)
    app.router.add_get("/api/jobs", list_jobs)
    app.router.add_get("/api/jobs/{job_id}", job_info)
    app.router.add_post("/api/jobs/{job_id}/stop", stop_job)
    app.router.add_delete("/api/jobs/{job_id}", delete_job)
    app.router.add_get("/api/events", events_stream)
    app.router.add_get("/api/nodes", nodes)
    app.router.add_get("/health/status", health)
    app.router.add_get("/metrics", metrics)

    from marie_tpu.helper import default_bind_host

    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, default_bind_host(), rest_port)
    await site.start()
    logger.info(f"job REST API at http://127.0.0.1:{rest_port}/api/jobs")

    try:
        while True:
            await asyncio.sleep(3600)
    finally:
        await scheduler.stop()
        await runner.cleanup()
