import asyncio

from marie_tpu.serve.discovery import DiscoveryClient, DiscoveryServer


async def test_put_get_delete():
    server = DiscoveryServer()
    await server.start()
    try:
        client = DiscoveryClient(server.address)
        await client.put("gateway/worker-1", "127.0.0.1:1234")
        await client.put("gateway/worker-2", "127.0.0.1:5678")
        await client.put("other/x", "y")
        items = await client.get_prefix("gateway/")
        assert items == {
            "gateway/worker-1": "127.0.0.1:1234",
            "gateway/worker-2": "127.0.0.1:5678",
        }
        await client.delete("gateway/worker-1")
        items = await client.get_prefix("gateway/")
        assert list(items) == ["gateway/worker-2"]
        await client.close()
    finally:
        await server.stop()


async def test_lease_expiry_without_keepalive():
    server = DiscoveryServer()
    await server.start()
    try:
        client = DiscoveryClient(server.address)
        await client.put("gateway/mortal", "addr", ttl=1.2)
        assert await client.get_prefix("gateway/")
        await asyncio.sleep(2.5)  # reaper runs every 1s
        assert await client.get_prefix("gateway/") == {}
        await client.close()
    finally:
        await server.stop()


async def test_register_keepalive_sustains_lease():
    server = DiscoveryServer()
    await server.start()
    try:
        client = DiscoveryClient(server.address)
        await client.register("gateway/alive", "addr", ttl=1.0)
        await asyncio.sleep(2.5)
        assert "gateway/alive" in await client.get_prefix("gateway/")
        await client.close()
        # keepalive stopped -> lease expires (observe via a fresh client)
        await asyncio.sleep(2.5)
        probe = DiscoveryClient(server.address)
        assert await probe.get_prefix("gateway/") == {}
        await probe.close()
    finally:
        await server.stop()


async def test_watch_events():
    server = DiscoveryServer()
    await server.start()
    try:
        client = DiscoveryClient(server.address)
        events = []
        task = await client.watch("gateway/", events.append)
        await asyncio.sleep(0.2)  # let the watch stream attach
        await client.put("gateway/w1", "a1")
        await client.put("ignored/w2", "a2")
        await client.delete("gateway/w1")
        await asyncio.sleep(0.5)
        task.cancel()
        ops = [(e["op"], e["key"]) for e in events]
        assert ("put", "gateway/w1") in ops
        assert ("delete", "gateway/w1") in ops
        assert all(not k.startswith("ignored/") for _, k in ops)
        await client.close()
    finally:
        await server.stop()
