"""GatewayJobDistributor — sends a job's work into the flow via the
streamer (reference: ``/root/reference/marie/job/gateway_job_distributor.py:13``)."""

from typing import Any, Optional

from marie_tpu.job.common import JobInfo
from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest


class GatewayJobDistributor:
    def __init__(self, streamer, default_endpoint: str = "/default"):
        self.streamer = streamer
        self.default_endpoint = default_endpoint
        self.logger = MarieLogger("GatewayJobDistributor")

    async def __call__(self, job_id: str, info: JobInfo) -> Any:
        return await self.send(job_id, info)

    async def send(self, job_id: str, info: JobInfo) -> Any:
        meta = info.metadata or {}
        doc = Document(tags={"job_id": job_id, **meta.get("doc_tags", {})})
        if "asset_key" in meta:
            doc.uri = meta["asset_key"]
        req = DataRequest.from_docs(
            DocumentArray([doc]),
            endpoint=info.entrypoint or self.default_endpoint,
            parameters={"job_id": job_id, **meta.get("parameters", {})},
        )
        resp = await self.streamer.process_single_data(req)
        if resp.is_error():
            st = resp.proto.header.status
            raise RuntimeError(
                f"job {job_id} failed in flow: {st.description}"
            )
        return {
            "docs": len(resp.docs),
            "parameters": resp.parameters,
        }
