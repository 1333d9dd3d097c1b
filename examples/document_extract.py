"""REST extract client — usage parity with the reference's
``examples/document_extract.py`` (POST a base64 TIFF/PNG to
``/api/document/extract`` with bearer auth, poll the jobs API).

Start a server first (see ``marie_tpu_server``):

    python -m marie_tpu_server --uses config/service/extract.yml &
    python examples/document_extract.py sample.tif --port 51000 \
        --api-key mau_...

Self-contained: no storage/queue side-channels — the response body IS
the extract payload (the reference round-trips artifacts through S3).
"""

import argparse
import base64
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=51000)
    ap.add_argument("--api-key", default=os.environ.get("MARIE_API_KEY", ""))
    ap.add_argument("--mode", default="sparse")
    ap.add_argument("--output-format", default="xywh")
    ap.add_argument(
        "--regions", default=None,
        help="JSON list of {id,pageIndex,x,y,w,h} region selectors",
    )
    args = ap.parse_args()

    import urllib.request

    with open(args.file, "rb") as fp:
        payload = {
            "data": base64.b64encode(fp.read()).decode(),
            "mode": args.mode,
            "output_format": args.output_format,
        }
    if args.regions:
        payload["regions"] = json.loads(args.regions)

    req = urllib.request.Request(
        f"http://{args.host}:{args.port}/api/document/extract",
        data=json.dumps(payload).encode(),
        headers={
            "Content-Type": "application/json; charset=utf-8",
            **(
                {"Authorization": f"Bearer {args.api_key}"}
                if args.api_key
                else {}
            ),
        },
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        body = json.load(resp)
    json.dump(body, sys.stdout, indent=1, default=str)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
