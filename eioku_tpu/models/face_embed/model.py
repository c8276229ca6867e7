"""ArcFace iresnet18 face embedder in functional JAX (NHWC).

Identity embeddings for cross-video face clustering (the People view). The
reference declared face clusters but never built clustering — its cluster_id
is always None (/root/reference/ml-service/src/services/model_manager.py:390,
SURVEY.md non-goals); this goes beyond with real identity embeddings.

Architecture = insightface's iresnet18 ("r18" ArcFace backbone): 3x3 stem
(no maxpool), four stages of pre-activation IBasicBlocks [2,2,2,2] with
per-channel PReLU, stride-2 at each stage entry, then BN -> flatten(512*7*7)
-> fc 512 -> feature BN. Inputs are 112x112 RGB in [-1, 1]
(((x/255)-0.5)/0.5). Embeddings are L2-normalized by the caller for cosine
clustering. Converter accepts insightface arcface_torch state dicts
(ms1mv3_arcface_r18's backbone.pth) dropped in MODEL_CACHE_DIR.
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
)

INPUT_SIZE = 112
EMBED_DIM = 512
STAGE_CHANNELS = [64, 128, 256, 512]
BN_EPS = 1e-5


def _prelu(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU (torch nn.PReLU(ch)); w broadcasts over NHW."""
    w = w.astype(x.dtype)
    return jnp.where(x >= 0, x, x * w)


def _init_block(kg: KeyGen, c_in: int, c_out: int, stride: int) -> Params:
    p: Params = {
        "bn1": init_batchnorm(c_in),
        "conv1": {"w": kaiming(kg(), (3, 3, c_in, c_out))},
        "bn2": init_batchnorm(c_out),
        "prelu": jnp.full((c_out,), 0.25, jnp.float32),
        "conv2": {"w": kaiming(kg(), (3, 3, c_out, c_out))},
        "bn3": init_batchnorm(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["down"] = {"w": kaiming(kg(), (1, 1, c_in, c_out)),
                     "bn": init_batchnorm(c_out)}
    return p


def init_face_embed_params(seed: int = 0) -> Params:
    kg = KeyGen(seed)
    p: Params = {
        "conv1": {"w": kaiming(kg(), (3, 3, 3, 64))},
        "bn1": init_batchnorm(64),
        "prelu": jnp.full((64,), 0.25, jnp.float32),
        "layers": [],
        "bn2": init_batchnorm(512),
        "fc": init_linear(kg(), 512 * 7 * 7, EMBED_DIM),
        "features": init_batchnorm(EMBED_DIM),
    }
    c_in = 64
    for c_out in STAGE_CHANNELS:
        p["layers"].append([
            _init_block(kg, c_in, c_out, stride=2),
            _init_block(kg, c_out, c_out, stride=1),
        ])
        c_in = c_out
    return p


def _block(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    """Pre-activation IBasicBlock: bn1 -> conv1 -> bn2 -> prelu ->
    conv2(stride) -> bn3, plus (optionally downsampled) identity."""
    h = batchnorm(x, p["bn1"], eps=BN_EPS)
    h = conv2d(h, p["conv1"]["w"])
    h = _prelu(batchnorm(h, p["bn2"], eps=BN_EPS), p["prelu"])
    h = conv2d(h, p["conv2"]["w"], stride=stride)
    h = batchnorm(h, p["bn3"], eps=BN_EPS)
    if "down" in p:
        x = batchnorm(conv2d(x, p["down"]["w"], stride=stride), p["down"]["bn"],
                      eps=BN_EPS)
    return h + x


@jax.jit
def face_embed(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, 112, 112, 3] float in [-1, 1] -> [B, 512] embeddings
    (unnormalized — callers L2-normalize for cosine clustering)."""
    x = conv2d(images, params["conv1"]["w"])
    x = _prelu(batchnorm(x, params["bn1"], eps=BN_EPS), params["prelu"])
    for stage in params["layers"]:
        for bi, block_p in enumerate(stage):
            x = _block(x, block_p, stride=2 if bi == 0 else 1)
    x = batchnorm(x, params["bn2"], eps=BN_EPS)
    # torch flattens NCHW (C-major); transpose so the fc weight layout matches
    b = x.shape[0]
    x = x.transpose(0, 3, 1, 2).reshape(b, -1)
    x = linear(x.astype(jnp.float32), params["fc"])
    return batchnorm(x, params["features"], eps=BN_EPS)


def preprocess(crops: np.ndarray) -> np.ndarray:
    """uint8 [B, 112, 112, 3] RGB -> float32 in [-1, 1] (insightface norm)."""
    return (crops.astype(np.float32) / 255.0 - 0.5) / 0.5


# -- insightface weight conversion --------------------------------------------------


def convert_arcface_state_dict(sd: dict) -> Params:
    """insightface arcface_torch iresnet18 state dict -> our param tree.
    Accepts raw or 'module.'-prefixed keys (DDP checkpoints)."""
    sd = {k.removeprefix("module."): np.asarray(v, np.float32)
          for k, v in sd.items()}

    def bn(prefix: str) -> Params:
        return {"gamma": jnp.asarray(sd[f"{prefix}.weight"]),
                "beta": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    def conv(prefix: str) -> Params:
        # torch OIHW -> HWIO
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}

    p: Params = {
        "conv1": conv("conv1"),
        "bn1": bn("bn1"),
        "prelu": jnp.asarray(sd["prelu.weight"]),
        "layers": [],
        "bn2": bn("bn2"),
        "fc": {"w": jnp.asarray(_fc_weight(sd)), "b": jnp.asarray(sd["fc.bias"])},
        "features": bn("features"),
    }
    for si in range(4):
        stage = []
        for bi in range(2):
            base = f"layer{si + 1}.{bi}"
            bp: Params = {
                "bn1": bn(f"{base}.bn1"),
                "conv1": conv(f"{base}.conv1"),
                "bn2": bn(f"{base}.bn2"),
                "prelu": jnp.asarray(sd[f"{base}.prelu.weight"]),
                "conv2": conv(f"{base}.conv2"),
                "bn3": bn(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                bp["down"] = {
                    "w": jnp.asarray(
                        sd[f"{base}.downsample.0.weight"].transpose(2, 3, 1, 0)),
                    "bn": bn(f"{base}.downsample.1"),
                }
            stage.append(bp)
        p["layers"].append(stage)
    return p


def _fc_weight(sd: dict) -> np.ndarray:
    """fc.weight is [512, 512*7*7] over torch's NCHW flatten order; our
    forward transposes activations to C-major before the matmul, so only the
    usual [out, in] -> [in, out] transpose is needed."""
    return sd["fc.weight"].T


def load_face_embed(cache_dir: str | None, seed: int = 0
                    ) -> tuple[Params, bool]:
    """Load `{cache_dir}/arcface_r18.pth` (or insightface's backbone.pth
    under arcface_r18/) when present; random init otherwise."""
    import os
    if cache_dir:
        for name in ("arcface_r18.pth", "arcface_r18/backbone.pth",
                     "backbone.pth"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                import torch
                sd = torch.load(path, map_location="cpu", weights_only=True)
                return convert_arcface_state_dict(
                    {k: v.numpy() for k, v in sd.items()}), True
    return init_face_embed_params(seed), False
