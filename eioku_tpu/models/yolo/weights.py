"""Ultralytics YOLOv8 checkpoint -> JAX param tree converter.

Ports torch OIHW conv weights to HWIO and BN stats into the functional param
layout of model.py. Needed for numerical parity with the reference's detector
(SURVEY.md hard-part 4); in zero-egress environments models fall back to random
init and the converter is exercised with synthetic state dicts.

Ultralytics layer indices (public yolov8 yaml):
  0 stem, 1 down1, 2 c2f_1, 3 down2, 4 c2f_2, 5 down3, 6 c2f_3, 7 down4,
  8 c2f_4, 9 sppf, 12 neck_c2f_td1, 15 neck_c2f_td2, 16 neck_down1,
  18 neck_c2f_bu1, 19 neck_down2, 21 neck_c2f_bu2, 22 detect
"""
from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import Params
from eioku_tpu.models.yolo.model import YoloConfig, init_yolo_params

log = logging.getLogger(__name__)

_BLOCK_TO_INDEX = {
    "stem": 0, "down1": 1, "c2f_1": 2, "down2": 3, "c2f_2": 4, "down3": 5,
    "c2f_3": 6, "down4": 7, "c2f_4": 8, "sppf": 9, "neck_c2f_td1": 12,
    "neck_c2f_td2": 15, "neck_down1": 16, "neck_c2f_bu1": 18,
    "neck_down2": 19, "neck_c2f_bu2": 21,
}

_DETECT_INDEX = 22


def _conv_w(t) -> jnp.ndarray:
    """torch OIHW -> jax HWIO."""
    return jnp.asarray(np.transpose(np.asarray(t, dtype=np.float32), (2, 3, 1, 0)))


def _convbn_from(sd: dict, prefix: str) -> Params:
    return {
        "w": _conv_w(sd[f"{prefix}.conv.weight"]),
        "bn": {
            "gamma": jnp.asarray(np.asarray(sd[f"{prefix}.bn.weight"], np.float32)),
            "beta": jnp.asarray(np.asarray(sd[f"{prefix}.bn.bias"], np.float32)),
            "mean": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_mean"],
                                           np.float32)),
            "var": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_var"],
                                          np.float32)),
        },
    }


def _c2f_from(sd: dict, prefix: str, n: int) -> Params:
    return {
        "cv1": _convbn_from(sd, f"{prefix}.cv1"),
        "cv2": _convbn_from(sd, f"{prefix}.cv2"),
        "m": [{"cv1": _convbn_from(sd, f"{prefix}.m.{j}.cv1"),
               "cv2": _convbn_from(sd, f"{prefix}.m.{j}.cv2")} for j in range(n)],
    }


def _plain_conv_from(sd: dict, prefix: str) -> Params:
    return {"w": _conv_w(sd[f"{prefix}.weight"]),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))}


def convert_ultralytics_state_dict(sd: dict, cfg: YoloConfig) -> Params:
    """Convert an ultralytics DetectionModel state_dict (key prefix 'model.N.')."""
    # normalize potential 'model.model.N.' prefixes from full checkpoint objects
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    params = init_yolo_params(cfg)  # gives correct structure + m counts

    def c2f_n(block: str) -> int:
        return len(params[block]["m"])

    for block, idx in _BLOCK_TO_INDEX.items():
        prefix = f"{idx}"
        if block.startswith(("c2f", "neck_c2f")):
            params[block] = _c2f_from(sd, prefix, c2f_n(block))
        elif block == "sppf":
            params[block] = {"cv1": _convbn_from(sd, f"{prefix}.cv1"),
                             "cv2": _convbn_from(sd, f"{prefix}.cv2")}
        else:
            params[block] = _convbn_from(sd, prefix)
    for lvl in range(3):
        params[f"head_box_{lvl}"] = {
            "0": _convbn_from(sd, f"{_DETECT_INDEX}.cv2.{lvl}.0"),
            "1": _convbn_from(sd, f"{_DETECT_INDEX}.cv2.{lvl}.1"),
            "2": _plain_conv_from(sd, f"{_DETECT_INDEX}.cv2.{lvl}.2"),
        }
        params[f"head_cls_{lvl}"] = {
            "0": _convbn_from(sd, f"{_DETECT_INDEX}.cv3.{lvl}.0"),
            "1": _convbn_from(sd, f"{_DETECT_INDEX}.cv3.{lvl}.1"),
            "2": _plain_conv_from(sd, f"{_DETECT_INDEX}.cv3.{lvl}.2"),
        }
    return params


def load_yolo_checkpoint(path: str, cfg: YoloConfig) -> Params:
    """Load an ultralytics .pt checkpoint (requires torch, CPU-only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "model" in obj:
        model = obj["model"]
        sd = model.state_dict() if hasattr(model, "state_dict") else model
    else:
        sd = obj
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_ultralytics_state_dict(sd, cfg)


# -- inverse mapping (testing aid: our params -> ultralytics-style names) ----------


def export_ultralytics_state_dict(params: Params, cfg: YoloConfig) -> dict:
    """Inverse of convert_ultralytics_state_dict, used to validate the converter
    round-trips without a real checkpoint."""
    sd: dict = {}

    def put_convbn(prefix: str, p: Params) -> None:
        sd[f"{prefix}.conv.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        sd[f"{prefix}.bn.weight"] = np.asarray(p["bn"]["gamma"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bn"]["beta"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(p["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(p["bn"]["var"])

    def put_c2f(prefix: str, p: Params) -> None:
        put_convbn(f"{prefix}.cv1", p["cv1"])
        put_convbn(f"{prefix}.cv2", p["cv2"])
        for j, m in enumerate(p["m"]):
            put_convbn(f"{prefix}.m.{j}.cv1", m["cv1"])
            put_convbn(f"{prefix}.m.{j}.cv2", m["cv2"])

    for block, idx in _BLOCK_TO_INDEX.items():
        prefix = f"{idx}"
        if block.startswith(("c2f", "neck_c2f")):
            put_c2f(prefix, params[block])
        elif block == "sppf":
            put_convbn(f"{prefix}.cv1", params[block]["cv1"])
            put_convbn(f"{prefix}.cv2", params[block]["cv2"])
        else:
            put_convbn(prefix, params[block])
    for lvl in range(3):
        for branch, key in (("cv2", "head_box"), ("cv3", "head_cls")):
            p = params[f"{key}_{lvl}"]
            put_convbn(f"{_DETECT_INDEX}.{branch}.{lvl}.0", p["0"])
            put_convbn(f"{_DETECT_INDEX}.{branch}.{lvl}.1", p["1"])
            sd[f"{_DETECT_INDEX}.{branch}.{lvl}.2.weight"] = np.transpose(
                np.asarray(p["2"]["w"]), (3, 2, 0, 1))
            sd[f"{_DETECT_INDEX}.{branch}.{lvl}.2.bias"] = np.asarray(p["2"]["b"])
    return {f"model.{k}": v for k, v in sd.items()}
