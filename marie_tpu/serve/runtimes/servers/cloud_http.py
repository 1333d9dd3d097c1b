"""Cloud-container HTTP variants: Sagemaker and Azure-ML app shapes
(reference ``marie/serve/runtimes/servers/http.py:265,302`` — FastAPI
CSP apps over the worker handler, pinned to port 8080, with the
``/ping`` health route AWS requires and JSON-or-CSV request bodies,
``worker/http_csp_app.py:141-237``).

Both subclass the standard aiohttp :class:`HTTPServer` and add:

* ``GET /ping``         — 200 health probe (Sagemaker contract)
* ``GET /health``       — inherited (Azure liveness)
* ``POST /invocations`` — body dispatched to the handler's default (or
  ``X-Marie-Endpoint``-named) endpoint; ``application/json`` bodies use
  the ``/post`` schema or a bare docs list, ``text/csv`` bodies become
  one doc per line (header-less ``text[,tag=value...]`` columns — the
  reference's no-header CSV contract, http_csp_app.py:209-218)
* Azure additionally aliases ``POST /score``.

Port defaults to 8080 (the cloud containers' fixed contract) but stays
overridable for local tests.
"""

from typing import Optional

from marie_tpu.serve.runtimes.servers.http_server import HTTPServer

CLOUD_PORT = 8080


def _csv_docs(body: str):
    docs = []
    for line in body.splitlines():
        line = line.strip()
        if not line:
            continue
        cols = line.split(",")
        doc = {"text": cols[0]}
        tags = {}
        for col in cols[1:]:
            k, sep, v = col.partition("=")
            if sep:
                tags[k.strip()] = v
        if tags:
            doc["tags"] = tags
        docs.append(doc)
    return docs


class SagemakerHTTPServer(HTTPServer):
    """``protocol: sagemaker`` — /invocations + /ping on port 8080."""

    DEFAULT_ENDPOINT = "/default"
    INVOCATION_PATHS = ("/invocations",)

    def __init__(self, req_handler, port: Optional[int] = None, **kwargs):
        from aiohttp import web

        async def ping(request):
            return web.json_response({})

        async def invocations(request):
            ctype = (request.content_type or "").lower()
            if ctype in ("text/csv", "application/csv"):
                payload = {"data": _csv_docs(await request.text())}
            else:
                import json as _json

                try:
                    payload = await request.json()
                except _json.JSONDecodeError:
                    return web.json_response(
                        {"error": "body must be JSON or CSV"}, status=400
                    )
                if isinstance(payload, list):
                    payload = {"data": payload}
            payload.setdefault(
                "execEndpoint",
                request.headers.get("X-Marie-Endpoint", self.DEFAULT_ENDPOINT),
            )
            return await self.dispatch_payload(payload)

        extra = list(kwargs.pop("extra_routes", None) or [])
        extra.append({"method": "GET", "path": "/ping", "handler": ping})
        for path in self.INVOCATION_PATHS:
            extra.append(
                {"method": "POST", "path": path, "handler": invocations}
            )
        super().__init__(
            req_handler, port=port or CLOUD_PORT, extra_routes=extra, **kwargs
        )


class AzureHTTPServer(SagemakerHTTPServer):
    """``protocol: azure`` — same CSP app shape; Azure ML probes
    ``GET /health`` (inherited) and posts to ``/score`` as well."""

    INVOCATION_PATHS = ("/invocations", "/score")
