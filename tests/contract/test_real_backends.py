"""Env-gated contract tests against REAL remote backends (VERDICT r3 #7).

The same client contracts that tests/integration/test_remote_fakes.py and
test_etcd_client.py pin against in-process fakes, re-run against real
services when reachable:

  MARIE_TEST_S3    s3 endpoint URL; MARIE_TEST_S3_KEY / _SECRET creds
  MARIE_TEST_ETCD  etcd host:port (gRPC v3 API)
  MARIE_TEST_AMQP  amqp:// URL (needs pika)

Each module skips-with-reason when its env var is absent — in this
environment they all skip (no servers, no drivers), and the fakes remain
the wire-shape coverage; on a machine with dockerized services the same
assertions run for real.
"""

import asyncio
import os
import uuid

import pytest

S3_URL = os.environ.get("MARIE_TEST_S3", "")
ETCD = os.environ.get("MARIE_TEST_ETCD", "")
AMQP = os.environ.get("MARIE_TEST_AMQP", "")


@pytest.mark.skipif(not S3_URL, reason="MARIE_TEST_S3 unset — no real S3")
def test_real_s3_roundtrip():
    from marie_tpu.storage.s3_storage import S3StorageHandler

    h = S3StorageHandler(
        endpoint_url=S3_URL,
        access_key=os.environ.get("MARIE_TEST_S3_KEY", "minioadmin"),
        secret_key=os.environ.get("MARIE_TEST_S3_SECRET", "minioadmin"),
        region=os.environ.get("MARIE_TEST_S3_REGION", "us-east-1"),
    )
    assert h.ping() is True
    key = f"s3://marie-contract/{uuid.uuid4().hex}/a.txt"
    assert not h.exists(key)
    h.write_bytes(key, b"real s3 contract")
    assert h.exists(key)
    assert h.read_bytes(key) == b"real s3 contract"
    prefix = key.rsplit("/", 1)[0] + "/"
    assert key in h.list(prefix)
    h.delete(key)
    assert not h.exists(key)


@pytest.mark.skipif(not ETCD, reason="MARIE_TEST_ETCD unset — no real etcd")
def test_real_etcd_kv_lease_watch():
    from marie_tpu.serve.discovery.etcd_client import EtcdClient

    async def drive():
        client = EtcdClient(ETCD)
        ns = f"contract/{uuid.uuid4().hex}"
        try:
            await client.put(f"{ns}/rep-0", "a")
            await client.put(f"{ns}/rep-1", "b")
            items = await client.get_prefix(f"{ns}/")
            assert items == {f"{ns}/rep-0": "a", f"{ns}/rep-1": "b"}

            # lease: registered key survives keepalive, bare ttl expires
            await client.register(f"{ns}/alive", "x", ttl=1)
            await client.put(f"{ns}/dies", "y", ttl=1)
            await asyncio.sleep(2.5)
            items = await client.get_prefix(f"{ns}/")
            assert f"{ns}/alive" in items
            assert f"{ns}/dies" not in items

            # watch sees a put
            events = []
            task = await client.watch(f"{ns}/", events.append)
            await asyncio.sleep(0.3)  # let the watch register
            await client.put(f"{ns}/watched", "z")
            await asyncio.sleep(1.0)
            task.cancel()
            assert any(
                e.get("op") == "put" and e.get("key", "").endswith("watched")
                for e in events
            )
        finally:
            await client.close()

    asyncio.run(drive())


@pytest.mark.skipif(not AMQP, reason="MARIE_TEST_AMQP unset — no real broker")
def test_real_rabbit_toast_roundtrip():
    pytest.importorskip("pika", reason="real AMQP run needs pika")
    from marie_tpu.messaging.rabbit_handler import RabbitToastHandler

    handler = RabbitToastHandler(url=AMQP)
    handler.notify("contract.started", {"jobid": "j1", "event": "started"})
    handler.close()
