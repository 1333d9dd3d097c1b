"""BatchQueue edge behaviour (reference batch_queue.py:19 semantics):
error fan-out, result split-back alignment under mixed request sizes,
oversized single requests, and racing pushes around the flush boundary.
"""

import asyncio

import pytest

from marie_tpu.serve.runtimes.worker.batch_queue import BatchQueue
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest


def _req(texts):
    return DataRequest.from_docs(
        DocumentArray([Document(text=t) for t in texts]), endpoint="/x"
    )


def test_error_fans_out_to_every_waiter():
    async def boom(docs, parameters):
        raise ValueError("batch exploded")

    async def run():
        q = BatchQueue(boom, preferred_batch_size=4, timeout=50)
        tasks = [asyncio.create_task(q.push(_req(["a"]))) for _ in range(4)]
        results = await asyncio.gather(*tasks, return_exceptions=True)
        assert all(isinstance(r, ValueError) for r in results)

    asyncio.run(run())


def test_split_back_alignment_with_mixed_sizes():
    """Requests of different doc counts must get exactly their own docs
    back, in order, after a single merged execution."""
    calls = []

    async def tag(docs, parameters):
        calls.append(len(docs))
        for i, d in enumerate(docs):
            d.tags["pos"] = i
        return docs

    async def run():
        q = BatchQueue(tag, preferred_batch_size=6, timeout=5_000)
        t1 = asyncio.create_task(q.push(_req(["a", "b"])))
        t2 = asyncio.create_task(q.push(_req(["c"])))
        t3 = asyncio.create_task(q.push(_req(["d", "e", "f"])))
        r1, r2, r3 = await asyncio.gather(t1, t2, t3)
        assert [d.text for d in r1] == ["a", "b"]
        assert [d.text for d in r2] == ["c"]
        assert [d.text for d in r3] == ["d", "e", "f"]
        # merged into ONE execution, positions prove the merge order
        assert calls == [6]
        assert [d.tags["pos"] for d in r3] == [3, 4, 5]

    asyncio.run(run())


def test_oversized_single_request_flushes_alone():
    """One request larger than preferred_batch_size must still run
    (immediately), not dead-letter waiting for a batch that can't fill."""

    async def echo(docs, parameters):
        return docs

    async def run():
        q = BatchQueue(echo, preferred_batch_size=2, timeout=60_000)
        out = await asyncio.wait_for(
            q.push(_req(["a", "b", "c", "d", "e"])), timeout=5
        )
        assert len(out) == 5

    asyncio.run(run())


def test_timeout_flush_fires_for_partial_batch():
    async def echo(docs, parameters):
        return docs

    async def run():
        q = BatchQueue(echo, preferred_batch_size=100, timeout=50)
        out = await asyncio.wait_for(q.push(_req(["lonely"])), timeout=5)
        assert [d.text for d in out] == ["lonely"]

    asyncio.run(run())


def test_storm_of_racing_pushes_loses_nothing():
    """Many concurrent single-doc pushes around the flush boundary: every
    waiter resolves with exactly its own doc."""

    async def echo(docs, parameters):
        await asyncio.sleep(0.001)
        return docs

    async def run():
        q = BatchQueue(echo, preferred_batch_size=8, timeout=30)
        tasks = [
            asyncio.create_task(q.push(_req([f"t{i}"]))) for i in range(50)
        ]
        results = await asyncio.gather(*tasks)
        assert [r[0].text for r in results] == [f"t{i}" for i in range(50)]
        await q.close()

    asyncio.run(run())
