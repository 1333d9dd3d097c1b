"""NER extraction over the REST job API — usage parity with the
reference's ``examples/ner_extract.py`` (submit a document to the
``/api/ner/extract``-style endpoint with bearer auth and poll for the
result).  Here the server is ``marie_tpu_server`` and the document
travels as base64 in the job payload.

    # terminal 1
    python -m marie_tpu_server --uses config/service/marie.yml
    # terminal 2
    python examples/ner_extract.py <file> --url http://127.0.0.1:8080 --api-key <key>
"""

import argparse
import base64
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url: str, payload: dict, headers: dict) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _get(url: str, headers: dict) -> dict:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--api-key", default=os.environ.get("MARIE_API_KEY", ""))
    ap.add_argument("--queue-id", default="0000-0000-0000-0000")
    ap.add_argument("--timeout", type=float, default=300.0)
    args = ap.parse_args()

    headers = (
        {"Authorization": f"Bearer {args.api_key}"} if args.api_key else {}
    )
    with open(args.file, "rb") as f:
        data = base64.b64encode(f.read()).decode()

    job = _post(
        f"{args.url}/api/jobs",
        {
            "entrypoint": "/ner/extract",
            "metadata": {
                "queue_id": args.queue_id,
                "doc": {"base64": data, "name": os.path.basename(args.file)},
            },
        },
        headers,
    )
    job_id = job.get("job_id") or job.get("id")
    print(f"submitted job {job_id}")

    deadline = time.time() + args.timeout
    while time.time() < deadline:
        status = _get(f"{args.url}/api/jobs/{job_id}", headers)
        state = status.get("status") or status.get("state")
        if state in ("SUCCEEDED", "COMPLETED", "successful"):
            print(json.dumps(status.get("result", status), indent=2))
            return 0
        if state in ("FAILED", "failed"):
            print(json.dumps(status, indent=2), file=sys.stderr)
            return 1
        time.sleep(1.0)
    print("timed out waiting for the job", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
