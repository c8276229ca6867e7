"""CRAFT text detector in functional JAX (NHWC).

TPU-native rebuild of EasyOCR's detector (the reference runs easyocr per frame,
/root/reference/ml-service/src/services/model_manager.py:469-558). Public CRAFT
architecture: VGG16-BN backbone (through relu5_3 plus dilated fc6/fc7 convs),
U-Net style double-conv upsampling over skip connections, 2-channel head
(region score, affinity score) at half input resolution. Box extraction from
the score maps is host-side connected components (eioku_tpu/ml/ocr_task.py) —
the dynamic-shape part that stays off the device (SURVEY.md hard-part 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from eioku_tpu.models.layers import (
    KeyGen,
    Params,
    batchnorm,
    conv2d,
    init_batchnorm,
    kaiming,
    max_pool,
    upsample2x_bilinear,
)

# VGG16-BN trunk as CRAFT slices it: 12 convs (stage 5 keeps only two convs,
# conv13/pool5 are dropped). (out_channels, pool_after). Skip activations are
# taken after convs 4, 6, 9, 12 — relu2_2 (128 @ /2), relu3_2 (256 @ /4),
# relu4_3 (512 @ /8), relu5_3 (512 @ /16).
_VGG_PLAN = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False),
]
_SKIP_AFTER_CONV = {4: "relu2_2", 6: "relu3_2", 9: "relu4_3", 12: "relu5_3"}


def _init_convbn(kg, c_in, c_out, k):
    return {"w": kaiming(kg(), (k, k, c_in, c_out)), "b": jnp.zeros(c_out),
            "bn": init_batchnorm(c_out)}


def _init_double_conv(kg, c_in, c_mid, c_out):
    return {"conv1": _init_convbn(kg, c_in, c_mid, 1),
            "conv2": _init_convbn(kg, c_mid, c_out, 3)}


def init_craft_params(seed: int = 0) -> Params:
    kg = KeyGen(seed)
    p: Params = {"vgg": [], "fc": {}, "up": [], "head": []}
    c_in = 3
    for c_out, _pool in _VGG_PLAN:
        p["vgg"].append(_init_convbn(kg, c_in, c_out, 3))
        c_in = c_out
    # fc6 (dilated) + fc7 as in CRAFT's basenet slice5
    p["fc"]["fc6"] = {"w": kaiming(kg(), (3, 3, 512, 1024)), "b": jnp.zeros(1024)}
    p["fc"]["fc7"] = {"w": kaiming(kg(), (1, 1, 1024, 1024)), "b": jnp.zeros(1024)}
    p["up"] = [
        _init_double_conv(kg, 1024 + 512, 512, 256),
        _init_double_conv(kg, 256 + 512, 256, 128),
        _init_double_conv(kg, 128 + 256, 128, 64),
        _init_double_conv(kg, 64 + 128, 64, 32),
    ]
    head_plan = [(32, 32, 3), (32, 32, 3), (32, 16, 3), (16, 16, 1)]
    for c_i, c_o, k in head_plan:
        p["head"].append({"w": kaiming(kg(), (k, k, c_i, c_o)),
                          "b": jnp.zeros(c_o)})
    p["head"].append({"w": kaiming(kg(), (1, 1, 16, 2)), "b": jnp.zeros(2)})
    return p


def _convbn(x, p, dilation: int = 1):
    return jax.nn.relu(batchnorm(
        conv2d(x, p["w"], p["b"], dilation=dilation), p["bn"], eps=1e-5))


def _double_conv(x, p):
    return _convbn(_convbn(x, p["conv1"]), p["conv2"])


@jax.jit
def craft_forward(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] normalized (H, W divisible by 32) ->
    score maps [B, H/2, W/2, 2] (region, affinity).

    Faithful to the public checkpoint's quirks (clovaai basenet/vgg16_bn.py):
    each slice ends at a BatchNorm, so the U-Net skips are PRE-ReLU bn
    outputs (the misleading h_relu* names notwithstanding), slice5 consumes
    the pre-ReLU bn5_2, and its fc6/fc7 convs carry no activation at all.
    """
    x = images
    skips = {}
    conv_i = 0
    for (_c_out, pool), pconv in zip(_VGG_PLAN, params["vgg"]):
        conv_i += 1
        pre = batchnorm(conv2d(x, pconv["w"], pconv["b"]), pconv["bn"],
                        eps=1e-5)
        if conv_i in _SKIP_AFTER_CONV:
            skips[_SKIP_AFTER_CONV[conv_i]] = pre
        # the trunk continues through ReLU (each next slice starts with one),
        # except after the last conv: slice5 consumes bn5_2 pre-ReLU
        x = pre if conv_i == len(_VGG_PLAN) else jax.nn.relu(pre)
        if pool:
            x = max_pool(x, 2, stride=2)
    # slice5: maxpool3 s1 + dilated fc6 + fc7 — no activations
    y = max_pool(x, 3, stride=1)
    y = conv2d(y, params["fc"]["fc6"]["w"], params["fc"]["fc6"]["b"],
               padding=[(6, 6), (6, 6)], dilation=6)
    y = conv2d(y, params["fc"]["fc7"]["w"], params["fc"]["fc7"]["b"])

    y = jnp.concatenate([y, skips["relu5_3"]], axis=-1)
    y = _double_conv(y, params["up"][0])
    y = upsample2x_bilinear(y)
    y = jnp.concatenate([y, skips["relu4_3"]], axis=-1)
    y = _double_conv(y, params["up"][1])
    y = upsample2x_bilinear(y)
    y = jnp.concatenate([y, skips["relu3_2"]], axis=-1)
    y = _double_conv(y, params["up"][2])
    y = upsample2x_bilinear(y)
    y = jnp.concatenate([y, skips["relu2_2"]], axis=-1)
    feat = _double_conv(y, params["up"][3])

    h = feat
    for i, pc in enumerate(params["head"]):
        h = conv2d(h, pc["w"], pc["b"])
        if i < len(params["head"]) - 1:
            h = jax.nn.relu(h)
    return h
