import asyncio
from datetime import timedelta

import pytest

from eioku_tpu.domain.artifacts import utcnow
from eioku_tpu.domain.models import Task, TaskStatus, Video
from eioku_tpu.queue import (
    Job,
    JobProducer,
    JobStatus,
    MemoryJobQueue,
    SqliteJobQueue,
    Worker,
    WorkerSettings,
)
from eioku_tpu.repositories import TaskRepository, VideoRepository
from eioku_tpu.services.reconciler import Reconciler


@pytest.fixture(params=["sqlite", "memory"])
def queue(request, db):
    if request.param == "sqlite":
        return SqliteJobQueue(db)
    return MemoryJobQueue()


class TestQueueSemantics:
    def test_enqueue_claim_complete(self, queue):
        queue.enqueue(Job(job_id="j1", function="f", args=[1]))
        job = queue.claim("w1")
        assert job.job_id == "j1" and job.status is JobStatus.RUNNING
        assert job.attempts == 1
        queue.complete("j1", {"ok": True})
        assert queue.get("j1").status is JobStatus.COMPLETED
        assert queue.get("j1").result == {"ok": True}

    def test_dedup(self, queue):
        assert queue.enqueue(Job(job_id="j1", function="f")) is not None
        assert queue.enqueue(Job(job_id="j1", function="f")) is None
        queue.claim("w1")
        assert queue.enqueue(Job(job_id="j1", function="f")) is None  # running
        queue.complete("j1")
        assert queue.enqueue(Job(job_id="j1", function="f")) is not None  # re-run OK

    def test_priority_order(self, queue):
        queue.enqueue(Job(job_id="low", function="f", priority=9))
        queue.enqueue(Job(job_id="high", function="f", priority=1))
        assert queue.claim("w").job_id == "high"

    def test_retry_then_fail(self, queue):
        queue.enqueue(Job(job_id="j", function="f", max_tries=2))
        queue.claim("w")
        assert queue.fail("j", "boom") is JobStatus.QUEUED  # attempt 1 of 2
        queue.claim("w")
        assert queue.fail("j", "boom2") is JobStatus.FAILED
        assert queue.get("j").error == "boom2"

    def test_abort_queued_cancels(self, queue):
        queue.enqueue(Job(job_id="j", function="f"))
        assert queue.request_abort("j")
        assert queue.get("j").status is JobStatus.CANCELLED
        assert not queue.request_abort("nonexistent")

    def test_abort_running_flags(self, queue):
        queue.enqueue(Job(job_id="j", function="f"))
        queue.claim("w")
        assert queue.request_abort("j")
        assert queue.is_abort_requested("j")
        assert queue.get("j").status is JobStatus.RUNNING  # cooperative

    def test_lease_expiry_requeues(self, queue):
        queue.enqueue(Job(job_id="j", function="f", timeout_s=0.0, max_tries=2))
        queue.claim("w")
        # force the lease into the past
        j = queue.get("j")
        assert j.lease_expires_at is not None
        if isinstance(queue, MemoryJobQueue):
            j.lease_expires_at = utcnow() - timedelta(seconds=1)
        assert queue.requeue_expired() == 1
        assert queue.get("j").status is JobStatus.QUEUED
        # crashes don't consume a try: requeued while attempts <= max_tries
        queue.claim("w")
        if isinstance(queue, MemoryJobQueue):
            queue.get("j").lease_expires_at = utcnow() - timedelta(seconds=1)
        assert queue.requeue_expired() == 1
        queue.claim("w")
        if isinstance(queue, MemoryJobQueue):
            queue.get("j").lease_expires_at = utcnow() - timedelta(seconds=1)
        assert queue.requeue_expired() == 0
        assert queue.get("j").status is JobStatus.FAILED

    def test_future_lease_not_requeued(self, queue):
        # regression: lease format must compare correctly against "now"
        queue.enqueue(Job(job_id="j", function="f", timeout_s=3600))
        queue.claim("w")
        assert queue.requeue_expired() == 0
        assert queue.get("j").status is JobStatus.RUNNING

    def test_counts_and_list(self, queue):
        queue.enqueue(Job(job_id="a", function="f"))
        queue.enqueue(Job(job_id="b", function="f"))
        queue.claim("w")
        counts = queue.counts()
        assert counts.get("queued") == 1 and counts.get("running") == 1
        assert len(queue.list_jobs(queue="ml_jobs")) == 2
        assert len(queue.list_jobs(status=JobStatus.QUEUED)) == 1


class TestJobProducer:
    def test_enqueue_task(self):
        q = MemoryJobQueue()
        p = JobProducer(q)
        job = p.enqueue_task("t1", "scene_detection", "v1", "/x.mp4", {"a": 1})
        assert job.job_id == "ml_t1"
        assert job.args == ["t1", "scene_detection", "v1", "/x.mp4", {"a": 1}]
        assert p.enqueue_task("t1", "scene_detection", "v1", "/x.mp4") is None
        assert p.job_exists("t1")

    def test_rejects_unknown_type(self):
        p = JobProducer(MemoryJobQueue())
        with pytest.raises(ValueError):
            p.enqueue_task("t1", "mystery_task", "v1", "/x.mp4")


class TestWorker:
    def _worker(self, queue, **kw):
        return Worker(queue, WorkerSettings(max_jobs=2, poll_delay_s=0.01,
                                            abort_poll_s=0.01, **kw))

    def test_executes_jobs(self, queue):
        async def go():
            done = []

            async def f(ctx, x):
                done.append(x)
                return x * 2

            w = self._worker(queue)
            w.register("f", f)
            queue.enqueue(Job(job_id="j1", function="f", args=[3]))
            queue.enqueue(Job(job_id="j2", function="f", args=[4]))
            await w.drain()
            assert sorted(done) == [3, 4]
            assert queue.get("j1").result == 6
            assert w.jobs_completed == 2

        asyncio.run(go())

    def test_failure_and_retry(self, queue):
        async def go():
            calls = []

            async def flaky(ctx):
                calls.append(ctx["attempt"])
                if ctx["attempt"] == 1:
                    raise RuntimeError("first attempt fails")
                return "ok"

            w = self._worker(queue)
            w.register("flaky", flaky)
            queue.enqueue(Job(job_id="j", function="flaky", max_tries=2))
            await w.drain()
            assert calls == [1, 2]
            assert queue.get("j").status is JobStatus.COMPLETED

        asyncio.run(go())

    def test_unknown_function_fails(self, queue):
        async def go():
            w = self._worker(queue)
            queue.enqueue(Job(job_id="j", function="nope"))
            await w.drain()
            assert queue.get("j").status is JobStatus.FAILED

        asyncio.run(go())

    def test_timeout(self, queue):
        async def go():
            async def slow(ctx):
                await asyncio.sleep(5)

            w = self._worker(queue)
            w.register("slow", slow)
            queue.enqueue(Job(job_id="j", function="slow", timeout_s=0.05))
            await w.drain()
            assert queue.get("j").status is JobStatus.FAILED
            assert "timeout" in queue.get("j").error

        asyncio.run(go())

    def test_abort_cancels_running(self, queue):
        async def go():
            started = asyncio.Event()

            async def long(ctx):
                started.set()
                await asyncio.sleep(30)

            w = self._worker(queue)
            w.register("long", long)
            queue.enqueue(Job(job_id="j", function="long"))
            runner = asyncio.create_task(w.run())
            await asyncio.wait_for(started.wait(), 5)
            queue.request_abort("j")
            for _ in range(200):
                if queue.get("j").status is JobStatus.CANCELLED:
                    break
                await asyncio.sleep(0.01)
            w.stop()
            await asyncio.wait_for(runner, 5)
            assert queue.get("j").status is JobStatus.CANCELLED

        asyncio.run(go())

    def test_cron_runs(self, queue):
        async def go():
            ticks = []

            async def cron_fn(ctx):
                ticks.append(1)

            w = self._worker(queue)
            w.add_cron(cron_fn, interval_s=0.001, run_at_startup=True)
            await w.run(max_iterations=3)
            assert len(ticks) >= 2

        asyncio.run(go())


class TestReconciler:
    def _setup(self, db):
        videos, tasks = VideoRepository(db), TaskRepository(db)
        q = SqliteJobQueue(db)
        producer = JobProducer(q)
        v = videos.save(Video(path="/v.mp4"))
        return videos, tasks, q, producer, v

    def test_pending_without_job_reenqueued(self, db):
        videos, tasks, q, producer, v = self._setup(db)
        t = tasks.save(Task(video_id=v.id, task_type="scene_detection"))
        rec = Reconciler(tasks, videos, producer)
        report = rec.run()
        assert report.pending_reenqueued == 1
        assert producer.job_exists(t.id)
        # idempotent: second run does nothing
        assert rec.run().pending_reenqueued == 0

    def test_running_task_with_completed_job_synced(self, db):
        videos, tasks, q, producer, v = self._setup(db)
        t = tasks.save(Task(video_id=v.id, task_type="ocr", language="en"))
        producer.enqueue_task(t.id, "ocr", v.id, v.path)
        tasks.update_status(t.id, TaskStatus.RUNNING)
        q.claim("w")
        q.complete(f"ml_{t.id}")
        report = Reconciler(tasks, videos, producer).run()
        assert report.statuses_synced == 1
        assert tasks.get(t.id).status is TaskStatus.COMPLETED

    def test_running_task_without_job_reset(self, db):
        videos, tasks, q, producer, v = self._setup(db)
        t = tasks.save(Task(video_id=v.id, task_type="transcription"))
        tasks.update_status(t.id, TaskStatus.RUNNING)
        report = Reconciler(tasks, videos, producer).run()
        assert report.running_reset == 1
        got = tasks.get(t.id)
        assert got.status is TaskStatus.PENDING
        assert producer.job_exists(t.id)

    def test_failed_job_marks_task_failed(self, db):
        videos, tasks, q, producer, v = self._setup(db)
        t = tasks.save(Task(video_id=v.id, task_type="ocr", language="en"))
        producer.enqueue_task(t.id, "ocr", v.id, v.path)
        tasks.update_status(t.id, TaskStatus.RUNNING)
        q.claim("w")
        q.fail(f"ml_{t.id}", "exploded")
        report = Reconciler(tasks, videos, producer).run()
        assert report.statuses_synced == 1
        got = tasks.get(t.id)
        assert got.status is TaskStatus.FAILED and "exploded" in got.error


class TestConcurrentClaims:
    def test_claim_once_under_threads(self, db):
        """N threads racing to claim must never double-claim a job."""
        import threading
        q = SqliteJobQueue(db)
        for i in range(40):
            q.enqueue(Job(job_id=f"j{i}", function="f"))
        claimed: list[str] = []
        lock = threading.Lock()

        def worker(wid):
            while True:
                job = q.claim(f"w{wid}")
                if job is None:
                    return
                with lock:
                    claimed.append(job.job_id)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert sorted(claimed) == sorted({f"j{i}" for i in range(40)})
        assert len(claimed) == len(set(claimed)) == 40


class TestCli:
    def test_cli_commands(self, db, tmp_path, monkeypatch, capsys):
        """Exercise the ops CLI command functions against a seeded context."""
        import argparse
        import eioku_tpu.cli as cli
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig

        config = AppConfig(scan_paths=[], auto_discover=False,
                           index_dir=str(tmp_path / "idx"))
        ctx = build_context(config, db=db)
        v = VideoRepository(db).save(Video(path="/v.mp4"))
        t = TaskRepository(db).save(Task(video_id=v.id, task_type="ocr",
                                         language="en"))
        ctx.producer.enqueue_task(t.id, "ocr", v.id, v.path)
        monkeypatch.setattr(cli, "_ctx", lambda args: ctx)
        args = argparse.Namespace(db=None, config=None, limit=50)
        assert cli.cmd_tasks(args) == 0
        out = capsys.readouterr().out
        assert "ocr" in out and "pending" in out
        assert cli.cmd_videos(argparse.Namespace(db=None, limit=10)) == 0
        assert "/v.mp4" in capsys.readouterr().out
        assert cli.cmd_resync(argparse.Namespace(db=None)) == 0
        assert cli.cmd_reconcile(argparse.Namespace(db=None)) == 0
        assert "pending_reenqueued" in capsys.readouterr().out
