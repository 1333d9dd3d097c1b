"""``marie`` console entrypoint (reference: ``marie_cli/__init__.py`` +
``marie_cli/api.py``)."""

import json
import sys


def main(argv=None) -> int:
    from marie_tpu.parsers import build_parser

    parser = build_parser()
    args = parser.parse_args(argv)
    cmd = args.cli

    if cmd == "server":
        return _server(args)
    if cmd == "executor":
        return _executor(args)
    if cmd == "flow":
        return _flow(args)
    if cmd == "deployment":
        return _deployment(args)
    if cmd == "gateway":
        return _gateway(args)
    if cmd == "ping":
        return _ping(args)
    if cmd == "dryrun":
        return _ping(args)  # same probe, reference-named alias
    if cmd == "client":
        return _client(args)
    if cmd == "job":
        return _job(args)
    if cmd == "check":
        return _check(args)
    if cmd == "export":
        return _export(args)
    if cmd == "help":
        return _help_lookup(args, parser)
    if cmd == "completions":
        return _completions(args, parser)
    if cmd == "new":
        return _new(args)
    if cmd == "hub":
        return _hub(args)
    parser.print_help()
    return 1


def _cli_tree(parser):
    """{command: [options...]} for every (possibly nested) subcommand."""
    import argparse

    tree = {}
    for action in parser._subparsers._group_actions:
        if not isinstance(action, argparse._SubParsersAction):
            continue
        stack = list(action.choices.items())
        while stack:
            name, sp = stack.pop()
            opts = []
            for a in sp._actions:
                if isinstance(a, argparse._SubParsersAction):
                    stack.extend((f"{name} {n}", s) for n, s in a.choices.items())
                    opts.extend(a.choices)
                    continue
                opts.extend(a.option_strings)
            tree[name] = sorted(set(opts))
    return tree


def _completions(args, parser) -> int:
    """Emit a bash/zsh completion script generated from the live parser
    tree (reference ships static scripts in resources/completions)."""
    tree = _cli_tree(parser)
    top = sorted(k for k in tree if " " not in k)
    if args.shell == "bash":
        cases = "\n".join(
            f'    {name.split()[-1]}) opts="{" ".join(opts)}" ;;'
            for name, opts in sorted(tree.items())
            if " " not in name
        )
        print(f"""# bash completion for marie — source this file
_marie_complete() {{
  local cur prev opts
  cur="${{COMP_WORDS[COMP_CWORD]}}"
  if [[ $COMP_CWORD -eq 1 ]]; then
    COMPREPLY=( $(compgen -W "{" ".join(top)}" -- "$cur") )
    return 0
  fi
  case "${{COMP_WORDS[1]}}" in
{cases}
    *) opts="" ;;
  esac
  COMPREPLY=( $(compgen -W "$opts" -- "$cur") )
}}
complete -F _marie_complete marie""")
    else:  # zsh
        cases = "\n".join(
            f'    {name}) _values "options" {" ".join(opts) or "-h"} ;;'
            for name, opts in sorted(tree.items())
            if " " not in name
        )
        print(f"""#compdef marie
_marie() {{
  if (( CURRENT == 2 )); then
    _values "command" {" ".join(top)}
    return
  fi
  case "$words[2]" in
{cases}
  esac
}}
_marie "$@" """)
    return 0


def _help_lookup(args, parser) -> int:
    """Search every subcommand's arguments for ``query`` and print where
    it appears with its help text (reference ``marie help``,
    marie_cli/lookup.py lookup_and_print)."""
    import argparse

    query = args.query.lower().lstrip("-")
    hits = []
    for action in parser._subparsers._group_actions:
        if not isinstance(action, argparse._SubParsersAction):
            continue
        for name, sp in action.choices.items():
            stack = [(name, sp)]
            while stack:
                cmd_name, p = stack.pop()
                for a in p._actions:
                    if isinstance(a, argparse._SubParsersAction):
                        stack.extend(
                            (f"{cmd_name} {n}", s) for n, s in a.choices.items()
                        )
                        continue
                    names = [o.lstrip("-") for o in a.option_strings] or [a.dest]
                    if any(query == n.lower() for n in names):
                        flag = ", ".join(a.option_strings) or a.dest
                        hits.append((cmd_name, flag, a.help or ""))
    if not hits:
        print(f"no argument matching {args.query!r} found")
        return 1
    for cmd_name, flag, help_text in hits:
        print(f"marie {cmd_name}  {flag}")
        if help_text:
            print(f"    {help_text}")
    return 0


def _new(args) -> int:
    """Scaffold a project from the bundled template (reference
    ``marie new``, marie_cli/api.py:179)."""
    import os
    import shutil

    import marie_tpu

    template_root = os.path.join(
        os.path.dirname(marie_tpu.__file__), "resources", "project-template",
        args.type,
    )
    target = os.path.abspath(args.name)
    if os.path.exists(target):
        print(f"error: {target} already exists")
        return 1
    shutil.copytree(template_root, target)
    print(f"created {args.type} project at {target}")
    for base, _, files in os.walk(target):
        for f in sorted(files):
            print("  ", os.path.relpath(os.path.join(base, f), target))
    return 0


def _hub(args) -> int:
    """Executor hub operations over the local/remote bundle registry
    (reference ``marie hub``; hub semantics in marie_tpu/hub.py)."""
    import json
    import os

    from marie_tpu.hub import ExecutorHub, parse_hub_ref as _parse

    def parse_hub_ref(ref: str):
        # the CLI accepts bare `name[:version]`; the library form is
        # `hub://name[:version]`
        return _parse(ref if ref.startswith("hub://") else f"hub://{ref}")

    # docker://-prefixed refs go to an OCI registry (hub_docker.py —
    # reference hubble docker-image hub; registry/creds from
    # MARIE_REGISTRY / MARIE_REGISTRY_USER / MARIE_REGISTRY_PASSWORD)
    def _registry_client():
        from marie_tpu.hub_docker import RegistryClient

        url = os.environ.get("MARIE_REGISTRY")
        if not url:
            raise SystemExit(
                "docker:// hub refs need MARIE_REGISTRY (registry URL)"
            )
        return RegistryClient(
            url,
            username=os.environ.get("MARIE_REGISTRY_USER"),
            password=os.environ.get("MARIE_REGISTRY_PASSWORD"),
        )

    hub = ExecutorHub()
    cmd = args.hub_cmd
    if cmd == "push":
        name = args.name or os.path.basename(os.path.abspath(args.path))
        if name.startswith("docker://"):
            from marie_tpu.hub_docker import push_executor_image

            digest, _ = push_executor_image(
                _registry_client(), args.path, name[len("docker://"):],
                tag=args.version,
            )
            print(f"pushed {name}:{args.version} {digest}")
            return 0
        bundle = hub.push(args.path, name=name, version=args.version)
        print(f"pushed {name}:{args.version} -> {bundle}")
        return 0
    if cmd == "pull":
        if args.ref.startswith("docker://"):
            from marie_tpu.hub_docker import pull_executor_image

            body = args.ref[len("docker://"):]
            image, _, tag = body.partition(":")
            dest = os.path.join(
                os.path.expanduser("~/.marie/hub-images"),
                image.replace("/", "__"), tag or "latest",
            )
            pull_executor_image(
                _registry_client(), image, tag or "latest", dest
            )
            print(dest)
            return 0
        name, version = parse_hub_ref(args.ref)
        installed = hub.pull(name, version)
        print(installed)
        return 0
    if cmd == "versions":
        name, _ = parse_hub_ref(args.ref)
        for v in hub.versions(name):
            print(v)
        return 0
    if cmd == "manifest":
        name, version = parse_hub_ref(args.ref)
        print(json.dumps(hub.manifest(name, version), indent=1, sort_keys=True))
        return 0
    if cmd == "list":
        for entry in hub.list():
            line = f"{entry['name']}:{entry['version']}"
            if "sha256" in entry:
                line += f"  sha256:{entry['sha256'][:12]}"
            print(line)
        return 0
    return 1


def _server(args) -> int:
    if args.watch:
        from marie_tpu_server.watch import main as watch_main

        return watch_main([args.uses] if args.uses else None)
    from marie_tpu_server import run_server

    return run_server(
        uses=args.uses, port=args.port,
        protocols=[p.strip() for p in args.protocol.split(",")],
        env_file=args.env_file,
    )


def _executor(args) -> int:
    from marie_tpu.orchestrate.deployments import Deployment

    with Deployment(
        uses=args.uses, name=args.name, port=args.port, protocol=args.protocol
    ) as dep:
        print(f"executor {args.name} serving at {dep.addresses[0]}", flush=True)
        dep.block()
    return 0


def _flow(args) -> int:
    from marie_tpu.orchestrate.flow import Flow

    flow = Flow.load_config(args.uses)
    if args.port:
        flow.port = args.port
    with flow:
        print(f"flow gateway at {flow.gateway_address}", flush=True)
        flow.block()
    return 0


def _deployment(args) -> int:
    from marie_tpu.orchestrate.deployments import Deployment

    with Deployment(
        uses=args.uses, name=args.name, port=args.port,
        replicas=args.replicas, shards=args.shards, polling=args.polling,
    ) as dep:
        print(
            f"deployment {args.name} ({args.replicas}x{args.shards}) "
            f"serving at {dep.addresses[0]}", flush=True,
        )
        dep.block()
    return 0


def _gateway(args) -> int:
    from marie_tpu.orchestrate.pods import Pod

    deployments = json.loads(args.deployments)
    if args.graph:
        graph = json.loads(args.graph)
    else:
        names = list(deployments)
        graph = {"start-gateway": names[:1]}
        for a, b in zip(names, names[1:]):
            graph[a] = [b]
        if names:
            graph[names[-1]] = ["end-gateway"]
    pod = Pod(
        "gateway",
        graph_representation=graph,
        executor_addresses=deployments,
        port=args.port,
        protocol=args.protocol,
        name="gateway",
    ).start()
    print(f"gateway serving at {pod.address}", flush=True)
    try:
        import time

        while pod.is_alive():
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        pod.close()
    return 0


def _ping(args) -> int:
    from marie_tpu.clients import Client

    host, _, port = args.host.partition(":")
    try:
        ok = Client(host=host or "127.0.0.1", port=int(port)).dry_run()
        print("OK" if ok else "DEGRADED")
        return 0 if ok else 1
    except Exception as ex:  # noqa: BLE001
        print(f"UNREACHABLE: {ex!r}")
        return 1


def _client(args) -> int:
    from marie_tpu.clients import Client
    from marie_tpu.types.docs import Document, DocumentArray

    host, _, port = args.host.partition(":")
    raw = args.data
    try:
        data = json.loads(raw)
        docs = DocumentArray.from_dict(data if isinstance(data, list) else [data])
    except json.JSONDecodeError:
        docs = DocumentArray([Document(text=raw)])
    client = Client(host=host or "127.0.0.1", port=int(port), protocol=args.protocol)
    result = client.post(args.endpoint, docs)
    print(json.dumps(result.to_dict(), indent=2, default=str))
    return 0


def _job(args) -> int:
    import asyncio

    import aiohttp

    async def call(method, path, payload=None):
        async with aiohttp.ClientSession() as s:
            fn = getattr(s, method)
            async with fn(f"http://{args.server}{path}", json=payload) as r:
                return await r.json()

    cmd = args.job_cmd
    if cmd == "submit":
        out = asyncio.run(
            call("post", "/api/jobs/submit", {
                "entrypoint": args.entrypoint,
                "metadata": json.loads(args.metadata),
            })
        )
    elif cmd == "list":
        out = asyncio.run(call("get", "/api/jobs"))
    elif cmd == "info":
        out = asyncio.run(call("get", f"/api/jobs/{args.job_id}"))
    elif cmd == "stop":
        out = asyncio.run(call("post", f"/api/jobs/{args.job_id}/stop"))
    else:  # delete
        out = asyncio.run(call("delete", f"/api/jobs/{args.job_id}"))
    print(json.dumps(out, indent=2))
    return 0


def _check(args) -> int:
    from marie_tpu.helper import get_full_version

    print(json.dumps(get_full_version(), indent=2))
    return 0


def _export(args) -> int:
    if args.kind == "schema":
        # full YAML JSON-schema, no flow needed (reference marie/schemas)
        from marie_tpu.schemas import get_full_schema

        print(json.dumps(get_full_schema(), indent=2))
        return 0
    from marie_tpu.orchestrate.flow import Flow

    flow = Flow.load_config(args.uses)
    if args.kind == "graph":
        print(json.dumps(flow.build(), indent=2))
    elif args.kind == "kubernetes":
        from marie_tpu.orchestrate.export import to_kubernetes_yaml

        print(to_kubernetes_yaml(flow, namespace=args.namespace))
    elif args.kind == "docker-compose":
        from marie_tpu.orchestrate.export import to_docker_compose_yaml

        print(to_docker_compose_yaml(flow))
    elif args.kind == "flowchart":
        from marie_tpu.orchestrate.export import to_mermaid

        print(to_mermaid(flow))
    else:
        from marie_tpu.jaml import JAML

        print(JAML.dump(JAML.deconstruct(flow)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
