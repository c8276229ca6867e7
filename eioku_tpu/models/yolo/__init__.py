from eioku_tpu.models.yolo.model import (
    YOLO_VARIANTS,
    YoloConfig,
    init_yolo_params,
    yolo_forward,
)

__all__ = ["YoloConfig", "YOLO_VARIANTS", "init_yolo_params", "yolo_forward"]
