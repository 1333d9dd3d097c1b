"""Incremental document streaming from a generator executor endpoint.

The serving-side analog of LLM token streaming: an ``@requests`` method
that ``yield``s documents streams them to the client AS they are
produced — over gRPC ``stream_doc`` (shown here) or HTTP NDJSON
(``POST /post_stream``).  Reference contract: generator endpoints,
``marie/serve/runtimes/worker/request_handling.py:1027``.

    python examples/streaming_tokens.py
"""

import asyncio
import sys
import time

sys.path.insert(0, ".")

from marie_tpu.utils.platform import honor_jax_platforms  # noqa: E402

honor_jax_platforms()

from marie_tpu.clients.grpc_client import GRPCClient
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests
from marie_tpu.types.docs import Document, DocumentArray


class SummarizerExecutor(BaseExecutor):
    """Emits one summary sentence at a time (stand-in for any
    incremental producer: LLM tokens, per-region OCR, page-by-page
    pipeline output)."""

    @requests(on="/summarize")
    async def summarize(self, docs: DocumentArray, **kwargs):
        text = docs[0].text or ""
        for i, sentence in enumerate(s for s in text.split(".") if s.strip()):
            await asyncio.sleep(0.3)  # pretend each costs real compute
            yield Document(id=f"s{i}", text=sentence.strip() + ".")


def main() -> None:
    flow = Flow().add(uses=SummarizerExecutor, name="summarizer")
    with flow:
        client = GRPCClient(port=flow.port_gateway)

        async def consume():
            t0 = time.perf_counter()
            doc = Document(
                id="d0",
                text=(
                    "Marie-tpu serves document AI on TPU hardware. "
                    "Generator endpoints stream results incrementally. "
                    "The client renders them as they arrive."
                ),
            )
            async for d in client.astream_doc("/summarize", doc):
                print(f"  +{time.perf_counter() - t0:5.2f}s  {d.text}")

        print("streaming summary:")
        asyncio.run(consume())


if __name__ == "__main__":
    main()
