"""CLI `deployment` and `gateway` subcommands serve end-to-end
(reference marie_cli api.py deployment/gateway/dryrun)."""

import json
import subprocess
import sys
import time

from marie_tpu.clients import Client
from marie_tpu.helper import random_port
from marie_tpu.orchestrate.deployments import Deployment
from tests.integration.executors import UpperExecutor


def test_cli_gateway_over_running_deployment():
    with Deployment(uses=UpperExecutor, name="up") as dep:
        gw_port = random_port()
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "marie_tpu_cli", "gateway",
                "--deployments", json.dumps({"up": [dep.addresses[0]]}),
                "--port", str(gw_port),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        try:
            client = Client(port=gw_port)
            deadline = time.time() + 60
            docs = None
            while time.time() < deadline:
                try:
                    from marie_tpu.types.docs import Document

                    docs = client.post("/default", [Document(text="cli")])
                    break
                except Exception:
                    time.sleep(0.5)
            assert docs is not None and docs[0].text == "CLI"
        finally:
            proc.terminate()
            proc.wait(10)
