import asyncio
import time

import pytest

from marie_tpu.enums import WorkState
from marie_tpu.scheduler.models import ExistingWorkPolicy, WorkInfo
from marie_tpu.scheduler.sql import SqlJobScheduler


@pytest.fixture
def sched(tmp_path):
    return SqlJobScheduler(str(tmp_path / "sched.db"))


async def test_submit_and_fetch(sched):
    work = WorkInfo(name="q1", data={"x": 1})
    job_id = await sched.submit_job(work)
    got = sched.fetch_next("q1")
    assert got is not None
    assert got.id == job_id
    assert got.state == WorkState.ACTIVE
    assert got.data == {"x": 1}
    # no double-fetch (SKIP LOCKED contract)
    assert sched.fetch_next("q1") is None


async def test_priority_order(sched):
    low = await sched.submit_job(WorkInfo(name="q", priority=0))
    high = await sched.submit_job(WorkInfo(name="q", priority=5))
    first = sched.fetch_next("q")
    assert first.id == high


async def test_complete_and_history(sched):
    job_id = await sched.submit_job(WorkInfo(name="q"))
    sched.fetch_next("q")
    sched.complete_job(job_id)
    job = await sched.get_job(job_id)
    assert job.state == WorkState.COMPLETED
    states = [h["state"] for h in sched.job_history(job_id)]
    assert states == ["created", "active", "completed"]


async def test_fail_retries_then_terminal(sched):
    job_id = await sched.submit_job(
        WorkInfo(name="q", retry_limit=2, retry_delay=0.0, retry_backoff=False)
    )
    for i in range(2):
        got = sched.fetch_next("q")
        assert got is not None, f"retry {i} not fetchable"
        sched.fail_job(job_id, "boom")
        job = await sched.get_job(job_id)
        assert job.state == WorkState.RETRY
    sched.fetch_next("q")
    sched.fail_job(job_id, "boom-final")
    job = await sched.get_job(job_id)
    assert job.state == WorkState.FAILED


async def test_cancel_and_resume(sched):
    job_id = await sched.submit_job(WorkInfo(name="q"))
    assert await sched.cancel_job(job_id)
    assert (await sched.get_job(job_id)).state == WorkState.CANCELLED
    assert sched.fetch_next("q") is None
    assert await sched.resume_job(job_id)
    assert sched.fetch_next("q").id == job_id


async def test_start_after_delay(sched):
    await sched.submit_job(WorkInfo(name="q", start_after=time.time() + 60))
    assert sched.fetch_next("q") is None  # not runnable yet


async def test_reject_duplicate_policy(sched):
    await sched.submit_job(WorkInfo(name="uniq"))
    with pytest.raises(ValueError):
        await sched.submit_job(
            WorkInfo(name="uniq", policy=ExistingWorkPolicy.REJECT_DUPLICATE)
        )


async def test_poll_loop_runs_handler(tmp_path):
    done = []

    async def handler(work):
        done.append(work.id)
        return True

    sched = SqlJobScheduler(str(tmp_path / "s.db"), job_handler=handler)
    sched._poll_interval = 0.05
    import marie_tpu.scheduler.sql as sqlmod

    old_min = sqlmod.POLL_MIN
    sqlmod.POLL_MIN = 0.05
    try:
        await sched.start()
        job_id = await sched.submit_job(WorkInfo(name="default"))
        for _ in range(80):
            job = await sched.get_job(job_id)
            if job.state == WorkState.COMPLETED:
                break
            await asyncio.sleep(0.05)
        assert done == [job_id]
        assert (await sched.get_job(job_id)).state == WorkState.COMPLETED
    finally:
        await sched.stop()
        sqlmod.POLL_MIN = old_min


async def test_multiprocess_like_contention(tmp_path):
    """Two scheduler instances on the same DB never claim the same job."""
    db = str(tmp_path / "shared.db")
    a = SqlJobScheduler(db)
    b = SqlJobScheduler(db)
    ids = set()
    for _ in range(10):
        ids.add(await a.submit_job(WorkInfo(name="q")))
    claimed = []
    for _ in range(20):
        for s in (a, b):
            got = s.fetch_next("q")
            if got:
                claimed.append(got.id)
    assert len(claimed) == 10
    assert len(set(claimed)) == 10


async def test_concurrent_fetch_no_double_claim(sched):
    """Two workers racing fetch_next must never claim the same job (the
    atomic conditional-UPDATE analog of pg-boss FOR UPDATE SKIP LOCKED,
    reference marie/scheduler/plans.py:188)."""
    import threading

    n_jobs = 30
    for i in range(n_jobs):
        await sched.submit_job(WorkInfo(name="race", data={"i": i}))

    claims: list = []
    lock = threading.Lock()

    def worker():
        while True:
            got = sched.fetch_next("race")
            if got is None:
                return
            with lock:
                claims.append(got.id)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(claims) == n_jobs, f"claimed {len(claims)}/{n_jobs}"
    assert len(set(claims)) == n_jobs, "a job was double-claimed"


async def test_dead_letter_on_terminal_failure(sched):
    """Exhausted retry budget re-enqueues the payload on the DLQ with a
    fresh id/budget (pg-boss dead_letter — reference fixtures.py:56)."""
    job_id = await sched.submit_job(
        WorkInfo(
            name="q", data={"k": "v"}, retry_limit=0, dead_letter="q-dlq"
        )
    )
    sched.fetch_next("q")
    sched.fail_job(job_id, "boom")
    assert (await sched.get_job(job_id)).state == WorkState.FAILED
    dlq = sched.fetch_next("q-dlq")
    assert dlq is not None
    assert dlq.id != job_id
    assert dlq.data == {"k": "v"}
    assert dlq.retry_count == 0
    # the dead-letter copy must NOT chain to another DLQ (no loops)
    assert dlq.dead_letter is None
    detail = sched.job_history(dlq.id)[0]["detail"]
    assert job_id in detail and "boom" in detail


async def test_dead_letter_on_expiry(sched):
    """Expired active jobs dead-letter too (monitor-loop path)."""
    job_id = await sched.submit_job(
        WorkInfo(name="q", expire_in_seconds=0.01, dead_letter="q-dlq")
    )
    sched.fetch_next("q")
    await asyncio.sleep(0.05)
    # run one monitor sweep inline
    conn = sched._conn()
    now = time.time()
    with conn:
        rows = sched._exec(
            conn,
            "SELECT id FROM job WHERE state='active' AND "
            "expire_in_seconds>0 AND started_on+expire_in_seconds<?",
            (now,),
        ).fetchall()
        for r in rows:
            sched._exec(
                conn,
                "UPDATE job SET state='expired', completed_on=? WHERE id=?",
                (now, r["id"]),
            )
            sched._dead_letter(conn, r["id"], "expired")
    assert (await sched.get_job(job_id)).state == WorkState.EXPIRED
    assert sched.fetch_next("q-dlq") is not None


async def test_output_persisted(sched):
    """Handler results and terminal errors persist in the output column
    (pg-boss output — reference fixtures.py:88)."""
    job_id = await sched.submit_job(WorkInfo(name="q"))
    sched.fetch_next("q")
    sched.complete_job(job_id, output={"pages": 3})
    assert (await sched.get_job(job_id)).output == {"pages": 3}

    fail_id = await sched.submit_job(WorkInfo(name="q", retry_limit=0))
    sched.fetch_next("q")
    sched.fail_job(fail_id, "exploded")
    assert (await sched.get_job(fail_id)).output == {"error": "exploded"}


async def test_keep_until_blocks_archive(sched):
    """Terminal jobs stay queryable until keep_until passes, even once
    older than the archive age threshold."""
    keep_id = await sched.submit_job(
        WorkInfo(name="q", keep_until=time.time() + 3600)
    )
    gone_id = await sched.submit_job(WorkInfo(name="q"))
    for _ in range(2):
        got = sched.fetch_next("q")
        sched.complete_job(got.id)
    conn = sched._conn()
    with conn:  # backdate both past the 1h archive threshold
        sched._exec(
            conn, "UPDATE job SET completed_on=?", (time.time() - 7200,)
        )
        now = time.time()
        old = sched._exec(
            conn,
            "SELECT * FROM job WHERE state IN "
            "('completed','failed','cancelled','expired') "
            "AND completed_on < ? AND keep_until < ?",
            (now - 3600, now),
        ).fetchall()
        for r in old:
            sched._exec(conn, sched._archive_upsert_sql(),
                        (r["id"], r["name"], r["state"], r["data"], now))
            sched._exec(conn, "DELETE FROM job WHERE id=?", (r["id"],))
    assert await sched.get_job(keep_id) is not None
    assert await sched.get_job(gone_id) is None


def test_cron_matching():
    """5-field cron semantics (pg-boss schedule table, fixtures.py:153)."""
    from marie_tpu.scheduler.sql import cron_matches

    t = time.struct_time((2026, 8, 18, 14, 30, 0, 1, 230, -1))  # Tue 14:30
    assert cron_matches("* * * * *", t)
    assert cron_matches("30 14 * * *", t)
    assert not cron_matches("31 14 * * *", t)
    assert cron_matches("*/15 * * * *", t)  # 30 % 15 == 0
    assert not cron_matches("*/7 * * * *", t)
    assert cron_matches("30 14 18 8 *", t)
    assert not cron_matches("30 14 19 8 *", t)
    assert cron_matches("* * * * 2", t)  # Tuesday (0=Sunday)
    assert not cron_matches("* * * * 0", t)
    assert cron_matches("0-45 9-17 * * 1-5", t)
    with pytest.raises(ValueError):
        cron_matches("* * *", t)


async def test_schedule_fires_and_dedupes_within_minute(sched):
    sched.schedule("nightly", "* * * * *", data={"task": "sweep"})
    assert [s["name"] for s in sched.schedules()] == ["nightly"]

    # pin to the start of a minute: with wall-clock `now`, now+1 can
    # cross a minute boundary and double-fire (flake under load)
    now = float((int(time.time()) // 60) * 60 + 1)
    assert sched._run_schedules(now) == 1
    # same minute: no double fire
    assert sched._run_schedules(now + 1) == 0
    # next minute: fires again
    assert sched._run_schedules(now + 61) == 1

    got = sched.fetch_next("nightly")
    assert got is not None and got.data == {"task": "sweep"}
    assert "cron" in sched.job_history(got.id)[0]["detail"]

    assert sched.unschedule("nightly")
    assert sched._run_schedules(now + 300) == 0


async def test_schedule_upsert_and_validation(sched):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sched.schedule("bad", "not a cron")
    sched.schedule("s1", "0 9 * * *")
    sched.schedule("s1", "0 10 * * *")  # upsert replaces
    assert sched.schedules()[0]["cron"] == "0 10 * * *"
