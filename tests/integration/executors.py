"""Importable test executors (pods spawn with 'spawn', so these must live
in an importable module, not inside test functions)."""

from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import dynamic_batching, requests, write
from marie_tpu.types.docs import Document, DocumentArray


class EchoExecutor(BaseExecutor):
    @requests(on="/echo")
    def echo(self, docs: DocumentArray, parameters: dict, **kwargs):
        for d in docs:
            d.text = f"echo:{d.text}"
        return docs

    @requests(on="/tag")
    def tag(self, docs: DocumentArray, parameters: dict, **kwargs):
        for d in docs:
            d.tags["tagged"] = parameters.get("value", "yes")
        return docs

    @requests(on="/boom")
    def boom(self, docs: DocumentArray, **kwargs):
        raise RuntimeError("intentional failure")


class UpperExecutor(BaseExecutor):
    @requests
    def upper(self, docs: DocumentArray, **kwargs):
        for d in docs:
            d.text = (d.text or "").upper()
        return docs


class SuffixExecutor(BaseExecutor):
    def __init__(self, suffix: str = "!", **kwargs):
        super().__init__(**kwargs)
        self.suffix = suffix

    @requests
    def add_suffix(self, docs: DocumentArray, **kwargs):
        for d in docs:
            d.text = (d.text or "") + self.suffix
        return docs


class BatchRecordingExecutor(BaseExecutor):
    """Records observed batch sizes into doc tags (dynamic batching test)."""

    @requests(on="/batch")
    @dynamic_batching(preferred_batch_size=4, timeout=300)
    def run_batch(self, docs: DocumentArray, **kwargs):
        n = len(docs)
        for d in docs:
            d.tags["batch_size"] = n
        return docs


class SnapshotExecutor(BaseExecutor):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.counter = 0

    @requests(on="/incr")
    @write
    def incr(self, docs: DocumentArray, **kwargs):
        self.counter += len(docs)
        for d in docs:
            d.tags["counter"] = self.counter
        return docs

    @requests(on="/count")
    def count(self, docs: DocumentArray, **kwargs):
        # READ endpoint: served locally by any replica, never through RAFT
        for d in docs:
            d.tags["counter"] = self.counter
        return docs

    def snapshot(self, snapshot_file: str) -> None:
        with open(snapshot_file, "w") as fp:
            fp.write(str(self.counter))

    def restore(self, snapshot_file: str) -> None:
        with open(snapshot_file) as fp:
            self.counter = int(fp.read())


class SlowCountingExecutor(BaseExecutor):
    """Tracks concurrent in-flight calls (for prefetch/backpressure tests)."""

    def __init__(self, delay: float = 0.25, **kwargs):
        super().__init__(**kwargs)
        self.delay = delay
        self._inflight = 0
        self._max_inflight = 0

    @requests(on="/slow")
    async def slow(self, docs: DocumentArray, **kwargs):
        import asyncio

        self._inflight += 1
        self._max_inflight = max(self._max_inflight, self._inflight)
        await asyncio.sleep(self.delay)
        for d in docs:
            d.tags["max_inflight"] = self._max_inflight
        self._inflight -= 1
        return docs


class TokenStreamExecutor(BaseExecutor):
    """Generator endpoints: documents stream out one at a time as they
    are produced (reference __is_generator__ stream_doc contract)."""

    @requests(on="/stream")
    async def stream_tokens(self, docs: DocumentArray, **kwargs):
        import asyncio

        text = docs[0].text or ""
        for i, tok in enumerate(text.split()):
            await asyncio.sleep(0.05)
            yield Document(id=f"tok{i}", text=tok)

    @requests(on="/sync-stream")
    def sync_stream(self, docs: DocumentArray, **kwargs):
        import time as _time

        for i in range(3):
            _time.sleep(0.05)
            yield Document(id=f"s{i}", text=f"part{i}")


class CapabilitiesExecutor(BaseExecutor):
    """Dict-returning endpoints matching the server's REST facades."""

    @requests(on="/ner/extract")
    def ner(self, docs: DocumentArray, parameters: dict, **kwargs):
        return {"status": "succeeded", "kind": "ner",
                "doc_id": parameters.get("doc_id")}

    @requests(on="/document/classify")
    def classify(self, docs: DocumentArray, parameters: dict, **kwargs):
        return {"status": "succeeded", "kind": "classify",
                "doc_type": parameters.get("doc_type")}

    @requests(on="/overlay/segment")
    def overlay(self, docs: DocumentArray, **kwargs):
        for d in docs:
            d.tags["cleaned"] = True
        return docs


class SleepyExecutor(BaseExecutor):
    """Sleeps per-doc tags['delay'] seconds — ordering tests."""

    @requests
    def run(self, docs: DocumentArray, **kwargs):
        import time as _time

        for d in docs:
            _time.sleep(float(d.tags.get("delay", 0)))
            d.text = f"done:{d.text}"
        return docs


class ParamBatchExecutor(BaseExecutor):
    """Tags docs with the parameter value their batch ran with
    (param-keyed dynamic-batching isolation test)."""

    @requests(on="/pbatch")
    @dynamic_batching(preferred_batch_size=2, timeout=250)
    def run(self, docs: DocumentArray, parameters: dict, **kwargs):
        for d in docs:
            d.tags["seen"] = parameters.get("v", "?")
            d.tags["batch"] = len(docs)
        return docs


class ShardIdentityExecutor(BaseExecutor):
    """Appends one doc identifying this shard process — makes ALL vs ANY
    polling observable (ALL returns one doc per shard)."""

    @requests(on="/collect")
    def collect(self, docs: DocumentArray, **kwargs):
        import os

        return DocumentArray([Document(id=f"shard-{os.getpid()}", text="hit")])

    @requests(on="/one")
    def one(self, docs: DocumentArray, **kwargs):
        import os

        return DocumentArray([Document(id=f"one-{os.getpid()}", text="hit")])
