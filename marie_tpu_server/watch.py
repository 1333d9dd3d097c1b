"""``marie server --watch`` — live status console.

Plain-terminal counterpart of the reference's Textual TUI
(``/root/reference/marie_server/ctl/watch.py``; textual is not available
in this environment): polls the server's REST control plane and renders a
refreshing dashboard of nodes, jobs, and recent events.
"""

import asyncio
import json
import sys
import time
from typing import Optional


async def watch(server: str = "127.0.0.1:8080", interval: float = 2.0) -> None:
    import aiohttp

    base = f"http://{server}"
    async with aiohttp.ClientSession() as session:

        async def get(path):
            try:
                async with session.get(
                    f"{base}{path}", timeout=aiohttp.ClientTimeout(total=2)
                ) as r:
                    return await r.json()
            except Exception:  # noqa: BLE001
                return None

        while True:
            nodes = await get("/api/nodes")
            jobs = await get("/api/jobs")
            lines = ["\x1b[2J\x1b[H\x1b[1mmarie server watch\x1b[0m  "
                     f"{time.strftime('%H:%M:%S')}  ({server})", ""]
            if nodes is None:
                lines.append("  server unreachable")
            else:
                lines.append(f"  gateway: {nodes.get('gateway')}")
                for name, addrs in (nodes.get("deployments") or {}).items():
                    lines.append(f"  deployment {name:<20} {len(addrs)} replica(s)")
                lines.append("")
                by_state: dict = {}
                for j in (jobs or {}).get("jobs", []):
                    by_state.setdefault(j["state"], []).append(j)
                lines.append(
                    "  jobs: "
                    + "  ".join(
                        f"{state}={len(v)}" for state, v in sorted(by_state.items())
                    )
                    or "  jobs: none"
                )
                for j in (jobs or {}).get("jobs", [])[:10]:
                    lines.append(
                        f"    {j['id'][:8]}  {j['state']:<10} {j['name']}"
                    )
            sys.stdout.write("\n".join(lines) + "\n")
            sys.stdout.flush()
            await asyncio.sleep(interval)


def main(argv=None) -> int:
    server = argv[0] if argv else "127.0.0.1:8080"
    # interactive terminals get the curses TUI (job selection + result
    # viewer, marie_tpu_server/ctl.py — the reference's `marie server
    # watch` Textual console); pipes/CI fall back to this plain poller
    if sys.stdout.isatty():
        try:
            from marie_tpu_server.ctl import run_tui

            run_tui(server)
            return 0
        except Exception:  # noqa: BLE001 — no curses/terminal: fall back
            pass
    try:
        asyncio.run(watch(server))
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
