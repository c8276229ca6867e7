from eioku_tpu.queue.jobs import Job, JobStatus
from eioku_tpu.queue.producer import JobProducer
from eioku_tpu.queue.queue import MemoryJobQueue, SqliteJobQueue
from eioku_tpu.queue.worker import CronJob, Worker, WorkerSettings

__all__ = [
    "Job",
    "JobStatus",
    "SqliteJobQueue",
    "MemoryJobQueue",
    "JobProducer",
    "Worker",
    "WorkerSettings",
    "CronJob",
]
