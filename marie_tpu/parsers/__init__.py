"""CLI argument parser tree (reference: ``/root/reference/marie/parsers/__init__.py:188``)."""

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="marie",
        description="marie-tpu: TPU-native document-AI serving framework",
    )
    sub = parser.add_subparsers(dest="cli", required=True)

    # server (reference: parsers/server.py set_server_parser)
    server = sub.add_parser("server", help="start/control the marie server")
    server.add_argument("--start", action="store_true", help="start the server")
    server.add_argument("--uses", type=str, help="YAML config for the flow")
    server.add_argument("--port", type=int, default=None)
    server.add_argument("--protocol", type=str, default="grpc,http")
    server.add_argument("--env-file", type=str, default=None)
    server.add_argument("--watch", action="store_true", help="live status console")

    # executor
    executor = sub.add_parser("executor", help="run a single executor")
    executor.add_argument("--uses", type=str, required=True)
    executor.add_argument("--port", type=int, default=None)
    executor.add_argument("--name", type=str, default="executor")
    executor.add_argument("--protocol", type=str, default="grpc")

    # flow
    flow = sub.add_parser("flow", help="run a flow from YAML")
    flow.add_argument("--uses", type=str, required=True)
    flow.add_argument("--port", type=int, default=None)

    # deployment (reference api.py:12 — executor + replicas/shards)
    deployment = sub.add_parser(
        "deployment", help="run a deployment (executor with replicas/shards)"
    )
    deployment.add_argument("--uses", type=str, required=True)
    deployment.add_argument("--port", type=int, default=None)
    deployment.add_argument("--name", type=str, default="deployment")
    deployment.add_argument("--replicas", type=int, default=1)
    deployment.add_argument("--shards", type=int, default=1)
    deployment.add_argument("--polling", type=str, default="all")

    # gateway (reference api.py:92 — entry server over executor addresses)
    gateway = sub.add_parser(
        "gateway", help="run a standalone gateway over executor addresses"
    )
    gateway.add_argument(
        "--deployments", type=str, required=True,
        help='JSON {"name": ["host:port", ...], ...}',
    )
    gateway.add_argument(
        "--graph", type=str, default=None,
        help="JSON DAG {src: [dst,...]}; default chains all deployments",
    )
    gateway.add_argument("--port", type=int, default=None)
    gateway.add_argument("--protocol", type=str, default="grpc")

    # ping
    ping = sub.add_parser("ping", help="health-check a runtime")
    ping.add_argument("host", type=str, help="host:port")

    # dryrun (reference api.py:120)
    dryrun = sub.add_parser("dryrun", help="flow readiness probe")
    dryrun.add_argument("host", type=str, help="gateway host:port")

    # client
    client = sub.add_parser("client", help="send a request")
    client.add_argument("host", type=str, help="host:port")
    client.add_argument("--endpoint", type=str, default="/")
    client.add_argument("--protocol", type=str, default="grpc")
    client.add_argument("--data", type=str, default="{}", help="JSON doc list or text")

    # job commands (reference REST /api/jobs/*)
    job = sub.add_parser("job", help="job queue operations")
    job_sub = job.add_subparsers(dest="job_cmd", required=True)
    for name in ("submit", "list", "info", "stop", "delete"):
        p = job_sub.add_parser(name)
        p.add_argument("--server", type=str, default="127.0.0.1:8080")
        if name == "submit":
            p.add_argument("--entrypoint", type=str, required=True)
            p.add_argument("--metadata", type=str, default="{}")
        elif name != "list":
            p.add_argument("job_id", type=str)

    # new (reference api.py:179 — scaffold a project from a template)
    new = sub.add_parser("new", help="scaffold a new marie project")
    new.add_argument("name", type=str, help="project directory to create")
    new.add_argument(
        "--type", type=str, default="flow", choices=["flow", "deployment"],
    )

    # hub (reference: jina/marie hub — executor bundle registry)
    hub = sub.add_parser("hub", help="executor hub operations")
    hub_sub = hub.add_subparsers(dest="hub_cmd", required=True)
    hp = hub_sub.add_parser("push", help="publish an executor bundle")
    hp.add_argument("path", type=str, help="executor directory (with config.yml)")
    hp.add_argument("--name", type=str, default=None)
    hp.add_argument("--version", type=str, default="0.1.0")
    for name in ("pull", "versions", "manifest"):
        p = hub_sub.add_parser(name)
        p.add_argument("ref", type=str, help="executor ref (name[:version])")
    hub_sub.add_parser("list", help="list local hub bundles")

    # shell completions (reference resources/completions)
    comp = sub.add_parser(
        "completions", help="emit a shell completion script"
    )
    comp.add_argument("shell", type=str, choices=["bash", "zsh"])

    # help lookup (reference marie_cli/lookup.py — `marie help port`)
    hlp = sub.add_parser("help", help="look up a CLI argument across commands")
    hlp.add_argument("query", type=str, help="argument name, e.g. 'port'")

    # check / export / help
    check = sub.add_parser("check", help="environment + device diagnostics")
    export = sub.add_parser("export", help="export flow configs")
    export.add_argument("--uses", type=str, default=None)
    export.add_argument(
        "--kind", type=str, default="graph",
        choices=["graph", "yaml", "kubernetes", "docker-compose", "schema",
                 "flowchart"],
    )
    export.add_argument("--namespace", type=str, default="marie")

    return parser
