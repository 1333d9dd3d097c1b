import asyncio

import pytest

from marie_tpu.enums import JobStatus
from marie_tpu.excepts import JobNotFoundError
from marie_tpu.job.job_manager import JobManager
from marie_tpu.storage.kv.in_memory import InMemoryKV


async def check_job_status(manager, job_id, want, timeout=5.0):
    for _ in range(int(timeout / 0.05)):
        status = await manager.get_job_status(job_id)
        if status == want:
            return True
        await asyncio.sleep(0.05)
    return False


async def test_submit_succeeds():
    async def distributor(job_id, info):
        return {"ok": True}

    mgr = JobManager(InMemoryKV(), job_distributor=distributor)
    job_id = await mgr.submit_job(entrypoint="/extract")
    assert await check_job_status(mgr, job_id, JobStatus.SUCCEEDED)
    info = await mgr.job_info_client.get_info(job_id)
    assert info.start_time is not None
    assert info.end_time is not None


async def test_submit_fails():
    async def distributor(job_id, info):
        raise RuntimeError("exploded")

    mgr = JobManager(InMemoryKV(), job_distributor=distributor)
    job_id = await mgr.submit_job(entrypoint="/x")
    assert await check_job_status(mgr, job_id, JobStatus.FAILED)
    info = await mgr.job_info_client.get_info(job_id)
    assert "exploded" in info.message


async def test_stop_running_job():
    started = asyncio.Event()

    async def distributor(job_id, info):
        started.set()
        await asyncio.sleep(30)

    mgr = JobManager(InMemoryKV(), job_distributor=distributor)
    job_id = await mgr.submit_job(entrypoint="/x")
    await asyncio.wait_for(started.wait(), 5)
    assert await mgr.stop_job(job_id)
    assert await mgr.get_job_status(job_id) == JobStatus.STOPPED


async def test_duplicate_submission_rejected():
    mgr = JobManager(InMemoryKV())
    job_id = await mgr.submit_job(entrypoint="/x", submission_id="fixed")
    await check_job_status(mgr, job_id, JobStatus.SUCCEEDED)
    with pytest.raises(ValueError):
        await mgr.submit_job(entrypoint="/x", submission_id="fixed")


async def test_unknown_job_raises():
    mgr = JobManager(InMemoryKV())
    with pytest.raises(JobNotFoundError):
        await mgr.get_job_status("nope")


async def test_slots_gating():
    mgr = JobManager(InMemoryKV(), max_slots=1)
    started = asyncio.Event()

    async def distributor(job_id, info):
        started.set()
        await asyncio.sleep(0.2)

    mgr.job_distributor = distributor
    await mgr.submit_job(entrypoint="/a")
    await asyncio.wait_for(started.wait(), 5)
    assert not mgr.has_available_slot()


async def test_recover_running_jobs():
    kv = InMemoryKV()
    mgr = JobManager(kv)
    from marie_tpu.job.common import JobInfo

    await mgr.job_info_client.put_info(
        "ghost", JobInfo(status=JobStatus.RUNNING, entrypoint="/x")
    )
    await mgr.recover_running_jobs()
    assert await mgr.get_job_status("ghost") == JobStatus.FAILED


async def test_list_and_delete():
    mgr = JobManager(InMemoryKV())
    job_id = await mgr.submit_job(entrypoint="/x")
    await check_job_status(mgr, job_id, JobStatus.SUCCEEDED)
    jobs = await mgr.list_jobs()
    assert job_id in jobs
    assert await mgr.delete_job(job_id)
    jobs = await mgr.list_jobs()
    assert job_id not in jobs
