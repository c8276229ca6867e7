from eioku_tpu.repositories.artifact_repository import ArtifactRepository
from eioku_tpu.repositories.path_config_repository import PathConfigRepository
from eioku_tpu.repositories.run_repository import RunRepository
from eioku_tpu.repositories.selection_policy_manager import SelectionPolicyManager
from eioku_tpu.repositories.task_repository import TaskRepository
from eioku_tpu.repositories.video_repository import VideoRepository

__all__ = [
    "VideoRepository",
    "TaskRepository",
    "ArtifactRepository",
    "RunRepository",
    "PathConfigRepository",
    "SelectionPolicyManager",
]
