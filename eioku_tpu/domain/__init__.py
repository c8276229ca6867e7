from eioku_tpu.domain.artifacts import ArtifactEnvelope, Run, SelectionPolicy
from eioku_tpu.domain.models import PathConfig, Task, TaskStatus, Video, VideoStatus

__all__ = [
    "ArtifactEnvelope",
    "Run",
    "SelectionPolicy",
    "Video",
    "VideoStatus",
    "Task",
    "TaskStatus",
    "PathConfig",
]
