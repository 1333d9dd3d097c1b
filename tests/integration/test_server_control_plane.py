"""Server shell control plane: REST job API over a live flow
(reference §3.4 job submission path)."""

import asyncio
import json

import pytest

import aiohttp

from marie_tpu.helper import random_port
from marie_tpu.orchestrate.flow import Flow
from marie_tpu_server import _run_control_plane
from tests.integration.executors import EchoExecutor


@pytest.fixture
def flow():
    with Flow().add(uses=EchoExecutor, name="echo") as f:
        yield f


async def test_job_rest_api_lifecycle(flow, tmp_path, monkeypatch):
    # isolate the sqlite state per test
    monkeypatch.setattr(
        "marie_tpu.scheduler.sql.POLL_MIN", 0.1, raising=True
    )
    rest_port = random_port()
    cp_task = asyncio.create_task(
        _run_control_plane(flow, rest_port, state_dir=str(tmp_path))
    )
    base = f"http://127.0.0.1:{rest_port}"
    try:
        async with aiohttp.ClientSession() as session:
            # wait for the REST app to come up
            for _ in range(50):
                try:
                    async with session.get(f"{base}/health/status") as r:
                        if r.status == 200:
                            break
                except aiohttp.ClientError:
                    pass
                await asyncio.sleep(0.1)

            async with session.post(
                f"{base}/api/jobs/submit",
                json={"entrypoint": "/echo", "metadata": {}},
            ) as r:
                body = await r.json()
                job_id = body["jobid"]
                assert body["status"] == "ok"

            state = None
            for _ in range(100):
                async with session.get(f"{base}/api/jobs/{job_id}") as r:
                    info = await r.json()
                    state = info["state"]
                if state in ("completed", "failed"):
                    break
                await asyncio.sleep(0.2)
            assert state == "completed", info

            async with session.get(f"{base}/api/jobs") as r:
                jobs = (await r.json())["jobs"]
                assert any(j["id"] == job_id for j in jobs)

            async with session.get(f"{base}/api/nodes") as r:
                nodes = await r.json()
                assert "echo" in nodes["deployments"]

            async with session.get(f"{base}/api/jobs/missing") as r:
                assert r.status == 404
    finally:
        cp_task.cancel()
        try:
            await cp_task
        except asyncio.CancelledError:
            pass


async def test_document_extract_rest(tmp_path):
    import base64
    import io

    import numpy as np
    from PIL import Image

    from marie_tpu.executor.text_extraction_executor import (
        TextExtractionExecutorMock,
    )

    with Flow().add(uses=TextExtractionExecutorMock, name="extract_t") as f:
        rest_port = random_port()
        cp_task = asyncio.create_task(
            _run_control_plane(f, rest_port, state_dir=str(tmp_path))
        )
        base = f"http://127.0.0.1:{rest_port}"
        try:
            async with aiohttp.ClientSession() as session:
                for _ in range(50):
                    try:
                        async with session.get(f"{base}/health/status") as r:
                            if r.status == 200:
                                break
                    except aiohttp.ClientError:
                        pass
                    await asyncio.sleep(0.1)

                img = Image.fromarray(
                    (255 * __import__("numpy").ones((64, 64, 3))).astype("uint8")
                )
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                async with session.post(
                    f"{base}/api/document/extract",
                    json={"data": base64.b64encode(buf.getvalue()).decode()},
                ) as r:
                    body = await r.json()
                    assert r.status == 200, body
                    assert body["status"] == "succeeded"
                    assert body["metadata"]["ocr"]

                async with session.post(
                    f"{base}/api/document/extract", json={}
                ) as r:
                    assert r.status == 400
        finally:
            cp_task.cancel()
            try:
                await cp_task
            except asyncio.CancelledError:
                pass


async def test_capability_rest_facades(tmp_path):
    """The reference's per-capability REST surface (/api/ner/extract,
    /api/document/classify, /api/overlay + status probes) forwards into
    the flow (marie_server/executors/*/mserve_torch.py parity)."""
    import base64
    import io

    from PIL import Image

    from tests.integration.executors import CapabilitiesExecutor

    with Flow().add(uses=CapabilitiesExecutor, name="caps") as f:
        rest_port = random_port()
        cp_task = asyncio.create_task(
            _run_control_plane(f, rest_port, state_dir=str(tmp_path))
        )
        base = f"http://127.0.0.1:{rest_port}"
        try:
            async with aiohttp.ClientSession() as session:
                for _ in range(50):
                    try:
                        async with session.get(f"{base}/health/status") as r:
                            if r.status == 200:
                                break
                    except aiohttp.ClientError:
                        pass
                    await asyncio.sleep(0.1)

                img = Image.new("RGB", (32, 32), (255, 255, 255))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                payload = {"data": base64.b64encode(buf.getvalue()).decode()}

                async with session.post(
                    f"{base}/api/ner/extract",
                    json={**payload, "doc_id": "d-77"},
                ) as r:
                    body = await r.json()
                    assert r.status == 200, body
                    assert body["kind"] == "ner" and body["doc_id"] == "d-77"

                async with session.post(
                    f"{base}/api/document/classify",
                    json={**payload, "doc_type": "invoice"},
                ) as r:
                    body = await r.json()
                    assert body["kind"] == "classify"
                    assert body["doc_type"] == "invoice"

                # doc-annotating endpoint: docs ride back in the payload
                async with session.post(
                    f"{base}/api/overlay", json=payload
                ) as r:
                    body = await r.json()
                    assert r.status == 200, body
                    assert body["docs"][0]["tags"]["cleaned"] is True

                for probe in ("/api/document/status", "/api/ner/status",
                              "/api/overlay/status"):
                    async with session.get(base + probe) as r:
                        assert (await r.json())["status"] == "OK"
        finally:
            cp_task.cancel()
            try:
                await cp_task
            except asyncio.CancelledError:
                pass


async def test_schedule_rest_api(tmp_path):
    """Cron schedules over REST: create, list, delete; a '* * * * *'
    schedule enqueues a job the monitor loop picks up."""
    from tests.integration.executors import EchoExecutor

    with Flow().add(uses=EchoExecutor, name="echo") as f:
        rest_port = random_port()
        cp_task = asyncio.create_task(
            _run_control_plane(f, rest_port, state_dir=str(tmp_path))
        )
        base = f"http://127.0.0.1:{rest_port}"
        try:
            async with aiohttp.ClientSession() as session:
                for _ in range(50):
                    try:
                        async with session.get(f"{base}/health/status") as r:
                            if r.status == 200:
                                break
                    except aiohttp.ClientError:
                        pass
                    await asyncio.sleep(0.1)

                async with session.post(
                    f"{base}/api/schedules",
                    json={"queue": "default", "cron": "* * * * *",
                          "data": {"entrypoint": "/echo"}},
                ) as r:
                    assert r.status == 200, await r.text()
                async with session.post(
                    f"{base}/api/schedules",
                    json={"queue": "bad", "cron": "nope"},
                ) as r:
                    assert r.status == 400
                async with session.get(f"{base}/api/schedules") as r:
                    names = [s["name"] for s in (await r.json())["schedules"]]
                    assert names == ["default"]

                # the monitor loop fires within its interval; a job for
                # queue 'default' must appear
                seen = False
                for _ in range(120):
                    async with session.get(f"{base}/api/jobs") as r:
                        jobs = (await r.json())["jobs"]
                    if any(j["name"] == "default" for j in jobs):
                        seen = True
                        break
                    await asyncio.sleep(0.25)
                assert seen, "cron schedule never enqueued a job"

                async with session.delete(f"{base}/api/schedules/default") as r:
                    assert r.status == 200
                async with session.get(f"{base}/api/schedules") as r:
                    assert (await r.json())["schedules"] == []
        finally:
            cp_task.cancel()
            try:
                await cp_task
            except asyncio.CancelledError:
                pass
