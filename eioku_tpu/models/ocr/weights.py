"""EasyOCR CRAFT checkpoint (craft_mlt_25k.pth) -> JAX param tree.

Key layout in the public checkpoint: VGG trunk under basenet.slice1..4 with
*global* torchvision feature indices preserved, dilated fc6/fc7 under
basenet.slice5.{1,2}, U-Net blocks under upconvN.conv.{0,1,3,4}
(conv/bn/conv/bn), head under conv_cls.{0,2,4,6,8}.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eioku_tpu.models.layers import Params
from eioku_tpu.models.ocr.craft import init_craft_params

# our vgg conv i -> (slice name, torchvision feature index of the conv)
_VGG_KEYS = [
    ("slice1", 0), ("slice1", 3), ("slice1", 7), ("slice1", 10),
    ("slice2", 14), ("slice2", 17),
    ("slice3", 20), ("slice3", 24), ("slice3", 27),
    ("slice4", 30), ("slice4", 34), ("slice4", 37),
]


def _cw(sd, key):
    return jnp.asarray(np.transpose(np.asarray(sd[key], np.float32), (2, 3, 1, 0)))


def _b(sd, key):
    return jnp.asarray(np.asarray(sd[key], np.float32))


def _bn(sd, prefix):
    return {"gamma": _b(sd, f"{prefix}.weight"), "beta": _b(sd, f"{prefix}.bias"),
            "mean": _b(sd, f"{prefix}.running_mean"),
            "var": _b(sd, f"{prefix}.running_var")}


def convert_craft_state_dict(sd: dict) -> Params:
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p = init_craft_params()
    for i, (slc, idx) in enumerate(_VGG_KEYS):
        base = f"basenet.{slc}.{idx}"
        p["vgg"][i] = {"w": _cw(sd, f"{base}.weight"),
                       "b": _b(sd, f"{base}.bias"),
                       "bn": _bn(sd, f"basenet.{slc}.{idx + 1}")}
    p["fc"]["fc6"] = {"w": _cw(sd, "basenet.slice5.1.weight"),
                      "b": _b(sd, "basenet.slice5.1.bias")}
    p["fc"]["fc7"] = {"w": _cw(sd, "basenet.slice5.2.weight"),
                      "b": _b(sd, "basenet.slice5.2.bias")}
    for u in range(4):
        base = f"upconv{u + 1}.conv"
        p["up"][u] = {
            "conv1": {"w": _cw(sd, f"{base}.0.weight"),
                      "b": _b(sd, f"{base}.0.bias"),
                      "bn": _bn(sd, f"{base}.1")},
            "conv2": {"w": _cw(sd, f"{base}.3.weight"),
                      "b": _b(sd, f"{base}.3.bias"),
                      "bn": _bn(sd, f"{base}.4")},
        }
    for hi, idx in enumerate([0, 2, 4, 6, 8]):
        p["head"][hi] = {"w": _cw(sd, f"conv_cls.{idx}.weight"),
                         "b": _b(sd, f"conv_cls.{idx}.bias")}
    return p


def load_ocr_checkpoints(cache_dir: str | None):
    """Returns (craft_params, crnn_params, pretrained?)."""
    import os

    from eioku_tpu.models.ocr.crnn import convert_easyocr_recognizer, init_crnn_params

    craft = crnn = None
    if cache_dir:
        cpath = os.path.join(cache_dir, "craft_mlt_25k.pth")
        if os.path.isfile(cpath):
            import torch
            sd = torch.load(cpath, map_location="cpu", weights_only=False)
            sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
            craft = convert_craft_state_dict(sd)
        for name in ("latin_g2.pth", "english_g2.pth"):
            rpath = os.path.join(cache_dir, name)
            if os.path.isfile(rpath):
                import torch
                sd = torch.load(rpath, map_location="cpu", weights_only=False)
                sd = {k: v.numpy() if hasattr(v, "numpy") else v
                      for k, v in sd.items()}
                crnn = convert_easyocr_recognizer(sd)
                break
    pretrained = craft is not None and crnn is not None
    if craft is None:
        craft = init_craft_params(seed=0)
    if crnn is None:
        crnn = init_crnn_params(seed=0)
    return craft, crnn, pretrained
