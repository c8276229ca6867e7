"""ML worker service entrypoint.

Capability parity: /root/reference/ml-service/src/main_worker.py:88-152 (queue
`ml_jobs`, WORKER_MAX_JOBS default 1 to serialize the accelerator, job timeout
3600 s, max_tries 1, poll 0.1 s, schema registration at startup) and
/root/reference/backend/src/main_worker.py:76-147 (reconcile cron every 5 min).
One worker binary serves both roles here.

Usage: python -m eioku_tpu.workers.main [--db URL] [--max-jobs N] [--once]
"""
from __future__ import annotations

import argparse
import asyncio

from eioku_tpu.api.app import build_context
from eioku_tpu.config.settings import load_config
from eioku_tpu.ml.engine import InferenceEngine
from eioku_tpu.queue.queue import SqliteJobQueue
from eioku_tpu.queue.worker import Worker, WorkerSettings
from eioku_tpu.utils.logging import setup_logging
from eioku_tpu.workers.task_handler import process_ml_task


def build_worker(app_ctx=None, config=None, settings: WorkerSettings | None = None,
                 engine: InferenceEngine | None = None,
                 reconcile_interval_s: float = 300.0) -> Worker:
    app_ctx = app_ctx or build_context(config or load_config())
    engine = engine or InferenceEngine(
        model_cache_dir=app_ctx.config.model_cache_dir,
        model_profile=app_ctx.config.model_profile)
    queue = app_ctx.producer.queue
    if not isinstance(queue, SqliteJobQueue):
        queue = SqliteJobQueue(app_ctx.db)
    worker = Worker(queue, settings or WorkerSettings(),
                    ctx={"app_ctx": app_ctx, "engine": engine,
                         "semantic_index": app_ctx.extra.get("semantic_index"),
                         "visual_index": app_ctx.extra.get("visual_index")})
    worker.register("process_ml_task", process_ml_task)

    async def reconcile_cron(ctx):
        app_ctx.reconciler.run()

    worker.add_cron(reconcile_cron, interval_s=reconcile_interval_s)
    return worker


def main() -> None:
    parser = argparse.ArgumentParser(description="eioku-tpu ML worker")
    parser.add_argument("--config", default=None)
    parser.add_argument("--db", default=None)
    parser.add_argument("--max-jobs", type=int, default=None)
    parser.add_argument("--once", action="store_true",
                        help="drain the queue then exit")
    args = parser.parse_args()

    from eioku_tpu.utils.device import maybe_force_cpu
    maybe_force_cpu()  # EIOKU_FORCE_CPU=1: tests spawning real workers stay off the TPU tunnel
    setup_logging("eioku-ml-worker")
    from eioku_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()  # multi-host no-op unless EIOKU_COORDINATOR set
    config = load_config(args.config)
    if args.db:
        config.database_url = args.db
    settings = WorkerSettings()
    if args.max_jobs is not None:
        settings.max_jobs = args.max_jobs
    worker = build_worker(config=config, settings=settings)

    async def _serve() -> None:
        import signal

        loop = asyncio.get_running_loop()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                loop.add_signal_handler(sig, worker.stop)
            except (NotImplementedError, RuntimeError):
                pass
        if args.once:
            await worker.drain()
        else:
            await worker.run()

    asyncio.run(_serve())


if __name__ == "__main__":
    main()
