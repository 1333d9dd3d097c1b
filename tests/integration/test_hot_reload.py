"""Executor hot reload (reference _hot_reload via watchfiles)."""

import asyncio
import os
import sys
import textwrap

import pytest

from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest


async def test_hot_reload_swaps_executor(tmp_path):
    mod_dir = tmp_path / "hotmod"
    mod_dir.mkdir()
    (mod_dir / "__init__.py").write_text("")
    exec_file = mod_dir / "exec_v.py"
    exec_file.write_text(textwrap.dedent("""
        from marie_tpu.serve.executors import BaseExecutor
        from marie_tpu.serve.executors.decorators import requests

        class VersionedExecutor(BaseExecutor):
            @requests(on="/v")
            def version(self, docs, **kwargs):
                for d in docs:
                    d.text = "v1"
                return docs
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        import importlib

        mod = importlib.import_module("hotmod.exec_v")
        handler = WorkerRequestHandler(executor=mod.VersionedExecutor(), name="hot")
        reload_task = asyncio.create_task(handler._hot_reload_loop(interval=0.2))

        req = DataRequest.from_docs(DocumentArray([Document()]), "/v")
        resp = await handler.process_data([req])
        assert resp.docs.texts == ["v1"]

        # mutate the source (force a newer mtime)
        exec_file.write_text(exec_file.read_text().replace('"v1"', '"v2"'))
        os.utime(exec_file, (os.path.getmtime(exec_file) + 5,) * 2)

        for _ in range(50):
            await asyncio.sleep(0.2)
            req = DataRequest.from_docs(DocumentArray([Document()]), "/v")
            resp = await handler.process_data([req])
            if resp.docs.texts == ["v2"]:
                break
        assert resp.docs.texts == ["v2"]
        reload_task.cancel()
    finally:
        sys.path.remove(str(tmp_path))
