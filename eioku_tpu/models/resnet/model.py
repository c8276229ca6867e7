"""ResNet18 in functional JAX (NHWC) for Places365 scene classification.

Capability parity: /root/reference/ml-service/src/services/model_manager.py:560-713
(torchvision resnet18 with a 365-way fc, weights from
resnet18_places365.pth.tar when present else random, resize 224 + ImageNet
normalization, softmax top-5). Converter accepts torchvision/places365
state-dict naming.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import (
    KeyGen,
    Params,
    batchnorm,
    conv2d,
    init_batchnorm,
    init_linear,
    kaiming,
    linear,
    max_pool,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

STAGE_CHANNELS = [64, 128, 256, 512]


def _init_block(kg: KeyGen, c_in: int, c_out: int, downsample: bool) -> Params:
    p: Params = {
        "conv1": {"w": kaiming(kg(), (3, 3, c_in, c_out))},
        "bn1": init_batchnorm(c_out),
        "conv2": {"w": kaiming(kg(), (3, 3, c_out, c_out))},
        "bn2": init_batchnorm(c_out),
    }
    if downsample:
        p["down"] = {"w": kaiming(kg(), (1, 1, c_in, c_out)),
                     "bn": init_batchnorm(c_out)}
    return p


def init_resnet18_params(num_classes: int = 365, seed: int = 0) -> Params:
    kg = KeyGen(seed)
    p: Params = {
        "conv1": {"w": kaiming(kg(), (7, 7, 3, 64))},
        "bn1": init_batchnorm(64),
        "layers": [],
        "fc": init_linear(kg(), 512, num_classes),
    }
    c_in = 64
    for si, c_out in enumerate(STAGE_CHANNELS):
        blocks = [
            _init_block(kg, c_in, c_out, downsample=(si > 0)),
            _init_block(kg, c_out, c_out, downsample=False),
        ]
        p["layers"].append(blocks)
        c_in = c_out
    return p


def _block(x, p: Params, stride: int) -> jnp.ndarray:
    identity = x
    out = jax.nn.relu(batchnorm(conv2d(x, p["conv1"]["w"], stride=stride),
                                p["bn1"], eps=1e-5))
    out = batchnorm(conv2d(out, p["conv2"]["w"]), p["bn2"], eps=1e-5)
    if "down" in p:
        identity = batchnorm(conv2d(x, p["down"]["w"], stride=stride),
                             p["down"]["bn"], eps=1e-5)
    return jax.nn.relu(out + identity)


@jax.jit
def resnet18_forward(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, 224, 224, 3] normalized -> logits [B, num_classes]."""
    x = conv2d(images, params["conv1"]["w"], stride=2)
    x = jax.nn.relu(batchnorm(x, params["bn1"], eps=1e-5))
    x = max_pool(x, 3, stride=2)
    for si, blocks in enumerate(params["layers"]):
        stride = 1 if si == 0 else 2
        x = _block(x, blocks[0], stride)
        x = _block(x, blocks[1], 1)
    x = jnp.mean(x, axis=(1, 2))
    return linear(x, params["fc"])


def preprocess(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB [B, 224, 224, 3] -> ImageNet-normalized bf16 (classification
    is robust to half-precision activations; conv accumulation stays fp32)."""
    x = frames_u8.astype(jnp.float32) / 255.0
    return ((x - IMAGENET_MEAN) / IMAGENET_STD).astype(jnp.bfloat16)


# -- torchvision converter ---------------------------------------------------------


def convert_torchvision_state_dict(sd: dict, num_classes: int = 365) -> Params:
    sd = {k.removeprefix("module."): v for k, v in sd.items()}  # places365 ckpts

    def cw(key):
        return jnp.asarray(np.transpose(np.asarray(sd[key], np.float32),
                                        (2, 3, 1, 0)))

    def bn(prefix):
        return {"gamma": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
                "beta": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
                "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"],
                                               np.float32)),
                "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"],
                                              np.float32))}

    p: Params = {
        "conv1": {"w": cw("conv1.weight")},
        "bn1": bn("bn1"),
        "layers": [],
        "fc": {"w": jnp.asarray(np.asarray(sd["fc.weight"], np.float32).T),
               "b": jnp.asarray(np.asarray(sd["fc.bias"], np.float32))},
    }
    for si in range(4):
        blocks = []
        for bi in range(2):
            base = f"layer{si + 1}.{bi}"
            blk: Params = {
                "conv1": {"w": cw(f"{base}.conv1.weight")},
                "bn1": bn(f"{base}.bn1"),
                "conv2": {"w": cw(f"{base}.conv2.weight")},
                "bn2": bn(f"{base}.bn2"),
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["down"] = {"w": cw(f"{base}.downsample.0.weight"),
                               "bn": bn(f"{base}.downsample.1")}
            blocks.append(blk)
        p["layers"].append(blocks)
    return p


def load_places365(cache_dir: str | None, seed: int = 0
                   ) -> tuple[Params, list[str], bool]:
    """Returns (params, class_names, pretrained?). Looks for
    resnet18_places365.pth.tar and categories_places365.txt under cache_dir
    (same file layout the reference expects)."""
    import os
    labels = [f"place_{i}" for i in range(365)]
    params, pretrained = None, False
    if cache_dir:
        cat = os.path.join(cache_dir, "categories_places365.txt")
        if os.path.isfile(cat):
            # "/a/apartment_building/outdoor 8" -> "apartment_building/outdoor"
            # (strip only the alphabetical-bucket prefix; the reference keeps
            # the indoor/outdoor qualifier, which disambiguates class pairs)
            with open(cat) as f:
                labels = [line.split(" ")[0][3:]
                          if line.startswith("/") and len(line) > 3
                          else line.split(" ")[0]
                          for line in f.read().strip().splitlines()]
        for name in ("resnet18_places365.pth.tar", "resnet18_places365.pth"):
            ckpt = os.path.join(cache_dir, name)
            if os.path.isfile(ckpt):
                import torch
                obj = torch.load(ckpt, map_location="cpu", weights_only=False)
                sd = obj.get("state_dict", obj)
                sd = {k: v.numpy() if hasattr(v, "numpy") else v
                      for k, v in sd.items()}
                params = convert_torchvision_state_dict(sd)
                pretrained = True
                break
    if params is None:
        params = init_resnet18_params(365, seed)
    return params, labels, pretrained
