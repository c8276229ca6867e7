"""CLIP (ViT-B/32) dual encoder in functional JAX — text→visual retrieval.

Beyond the reference: its "semantic video search" spec only ever covered
transcript text (.kiro/specs/semantic-video-search/requirements.md, and even
that was unimplemented — SURVEY.md section 0). A video library is mostly
pictures; CLIP embeds keyframes and free-text queries into one space so
"red car at night" finds the *moment*, not just the words. TPU-first: the
image tower is a 12-layer ViT whose patch-conv + attention + MLP stack is
pure MXU work, batched over keyframes; both towers jit to single programs.

Weights port from a HuggingFace `CLIPModel` state dict
(openai/clip-vit-base-patch32) via convert_hf_state_dict; random init
otherwise (zero-egress images stay functional, recognition is noise).

Architecture (HF modeling_clip.py names in the converter):
  vision: conv patchify 32x32/s32 -> [CLS]+49 tokens + learned pos ->
          12x pre-LN transformer (width 768, heads 12, QuickGELU) ->
          post-LN on CLS -> linear projection (no bias) -> 512-d
  text:   BPE ids (ctx 77) + learned pos -> 12x pre-LN causal transformer
          (width 512, heads 8, QuickGELU) -> final LN -> take EOT token
          (= argmax of ids: EOT is the largest id) -> projection -> 512-d
Both outputs L2-normalize; similarity = cosine.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import (
    KeyGen,
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    mha,
    xavier,
)

# HF CLIPProcessor normalization constants (image_processing_clip.py)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # vision tower (ViT-B/32)
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp: int = 2048
    compute_dtype: str = "float32"

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _init_block(kg: KeyGen, width: int, mlp: int) -> Params:
    return {
        "ln1": init_layernorm(width),
        "q": init_linear(kg(), width, width),
        "k": init_linear(kg(), width, width),
        "v": init_linear(kg(), width, width),
        "o": init_linear(kg(), width, width),
        "ln2": init_layernorm(width),
        "fc1": init_linear(kg(), width, mlp),
        "fc2": init_linear(kg(), mlp, width),
    }


def init_clip_params(cfg: ClipConfig, seed: int = 0) -> Params:
    kg = KeyGen(seed)
    vw, tw = cfg.vision_width, cfg.text_width
    return {
        "visual": {
            "cls": xavier(kg(), (vw,)) * 0.02,
            # HWIO patch conv, no bias (HF patch_embedding bias=False)
            "patch": xavier(kg(), (cfg.patch_size, cfg.patch_size, 3, vw)),
            "pos": xavier(kg(), (cfg.n_patches + 1, vw)) * 0.02,
            "pre_ln": init_layernorm(vw),
            "blocks": [_init_block(kg, vw, cfg.vision_mlp)
                       for _ in range(cfg.vision_layers)],
            "post_ln": init_layernorm(vw),
            "proj": xavier(kg(), (vw, cfg.embed_dim)),
        },
        "text": {
            "tok_emb": xavier(kg(), (cfg.vocab_size, tw)) * 0.02,
            "pos": xavier(kg(), (cfg.context_length, tw)) * 0.01,
            "blocks": [_init_block(kg, tw, cfg.text_mlp)
                       for _ in range(cfg.text_layers)],
            "final_ln": init_layernorm(tw),
            "proj": xavier(kg(), (tw, cfg.embed_dim)),
        },
    }


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    # CLIP's activation (x * sigmoid(1.702 x)), NOT tanh/erf GELU
    return x * jax.nn.sigmoid(1.702 * x)


def _block(x: jnp.ndarray, p: Params, n_heads: int,
           mask: jnp.ndarray | None) -> jnp.ndarray:
    h = layernorm(x, p["ln1"], eps=1e-5)
    q, k, v = linear(h, p["q"]), linear(h, p["k"]), linear(h, p["v"])
    x = x + linear(mha(q, k, v, n_heads, mask=mask), p["o"])
    h = layernorm(x, p["ln2"], eps=1e-5)
    x = x + linear(_quick_gelu(linear(h, p["fc1"])), p["fc2"])
    return x


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


@partial(jax.jit, static_argnames=("cfg",))
def clip_encode_image(params: Params, images: jnp.ndarray,
                      cfg: ClipConfig) -> jnp.ndarray:
    """images [B, H, W, 3] float32, already resized + CLIP-normalized
    (preprocess_images) -> L2-normalized embeddings [B, embed_dim]."""
    p = params["visual"]
    dtype = jnp.dtype(cfg.compute_dtype)
    x = images.astype(dtype)
    # patchify: conv k=s=patch (VALID: exact tiling, no padding)
    x = jax.lax.conv_general_dilated(
        x, p["patch"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.vision_width)  # [B, 49, W]
    cls = jnp.broadcast_to(p["cls"].astype(dtype),
                           (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1) + p["pos"].astype(dtype)[None]
    x = layernorm(x, p["pre_ln"], eps=1e-5)
    for blk in p["blocks"]:
        x = _block(x, blk, cfg.vision_heads, mask=None)
    pooled = layernorm(x[:, 0].astype(jnp.float32), p["post_ln"], eps=1e-5)
    return _normalize(pooled @ p["proj"].astype(jnp.float32))


@partial(jax.jit, static_argnames=("cfg",))
def clip_encode_text(params: Params, token_ids: jnp.ndarray,
                     cfg: ClipConfig) -> jnp.ndarray:
    """token_ids [B, context_length] int32 (SOT ... EOT 0-padded) ->
    L2-normalized embeddings [B, embed_dim]."""
    p = params["text"]
    dtype = jnp.dtype(cfg.compute_dtype)
    s = token_ids.shape[1]
    x = (p["tok_emb"][token_ids] + p["pos"][:s][None]).astype(dtype)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    for blk in p["blocks"]:
        x = _block(x, blk, cfg.text_heads, mask=causal)
    x = layernorm(x.astype(jnp.float32), p["final_ln"], eps=1e-5)
    # EOT = the largest token id in the sequence (HF pooling trick:
    # modeling_clip.py text pooled_output); argmax returns the FIRST max,
    # so zero-padding after EOT never wins
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    return _normalize(pooled @ p["proj"].astype(jnp.float32))


def preprocess_images(frames: list[np.ndarray],
                      cfg: ClipConfig) -> np.ndarray:
    """uint8 RGB frames (any geometry) -> [B, S, S, 3] float32, resized
    shortest-side + center-cropped + normalized exactly like HF's
    CLIPImageProcessor (bicubic)."""
    import cv2
    size = cfg.image_size
    out = np.empty((len(frames), size, size, 3), np.float32)
    for i, f in enumerate(frames):
        h, w = f.shape[:2]
        scale = size / min(h, w)
        nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
        r = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_CUBIC)
        top, left = (nh - size) // 2, (nw - size) // 2
        out[i] = r[top:top + size, left:left + size].astype(np.float32) / 255.0
    return (out - IMAGE_MEAN) / IMAGE_STD


# -- HF weight conversion --------------------------------------------------------


def convert_hf_state_dict(sd: dict, cfg: ClipConfig) -> Params:
    """Convert a HuggingFace CLIPModel state dict (openai/clip-vit-base-*
    naming: vision_model.*, text_model.*, visual_projection, text_projection)
    into our param tree."""
    def t(key: str) -> np.ndarray:
        return np.asarray(sd[key], dtype=np.float32)

    def lin(prefix: str) -> Params:
        return {"w": jnp.asarray(t(f"{prefix}.weight").T),
                "b": jnp.asarray(t(f"{prefix}.bias"))}

    def ln(prefix: str) -> Params:
        return {"gamma": jnp.asarray(t(f"{prefix}.weight")),
                "beta": jnp.asarray(t(f"{prefix}.bias"))}

    def blocks(base: str, n: int) -> list[Params]:
        out = []
        for i in range(n):
            b = f"{base}.layers.{i}"
            out.append({
                "ln1": ln(f"{b}.layer_norm1"),
                "q": lin(f"{b}.self_attn.q_proj"),
                "k": lin(f"{b}.self_attn.k_proj"),
                "v": lin(f"{b}.self_attn.v_proj"),
                "o": lin(f"{b}.self_attn.out_proj"),
                "ln2": ln(f"{b}.layer_norm2"),
                "fc1": lin(f"{b}.mlp.fc1"),
                "fc2": lin(f"{b}.mlp.fc2"),
            })
        return out

    # HF spells it "pre_layrnorm" (sic)
    pre_ln_key = "vision_model.pre_layrnorm" \
        if "vision_model.pre_layrnorm.weight" in sd \
        else "vision_model.pre_layernorm"
    return {
        "visual": {
            "cls": jnp.asarray(t("vision_model.embeddings.class_embedding")
                               .reshape(-1)),
            # OIHW -> HWIO
            "patch": jnp.asarray(
                t("vision_model.embeddings.patch_embedding.weight")
                .transpose(2, 3, 1, 0)),
            "pos": jnp.asarray(
                t("vision_model.embeddings.position_embedding.weight")),
            "pre_ln": ln(pre_ln_key),
            "blocks": blocks("vision_model.encoder", cfg.vision_layers),
            "post_ln": ln("vision_model.post_layernorm"),
            "proj": jnp.asarray(t("visual_projection.weight").T),
        },
        "text": {
            "tok_emb": jnp.asarray(
                t("text_model.embeddings.token_embedding.weight")),
            "pos": jnp.asarray(
                t("text_model.embeddings.position_embedding.weight")),
            "blocks": blocks("text_model.encoder", cfg.text_layers),
            "final_ln": ln("text_model.final_layer_norm"),
            "proj": jnp.asarray(t("text_projection.weight").T),
        },
    }


def load_clip(cache_dir: str | None, cfg: ClipConfig | None = None,
              seed: int = 0) -> tuple[Params, ClipConfig, bool]:
    """Load from `{cache_dir}/clip-vit-b32/pytorch_model.bin` when present;
    random init otherwise. Returns (params, cfg, pretrained?)."""
    import os
    cfg = cfg or ClipConfig()
    if cache_dir:
        for name in ("clip-vit-b32/pytorch_model.bin", "clip.bin"):
            path = os.path.join(cache_dir, name)
            if os.path.isfile(path):
                import torch
                sd = torch.load(path, map_location="cpu", weights_only=True)
                sd = {k: v.numpy() for k, v in sd.items()}
                return convert_hf_state_dict(sd, cfg), cfg, True
    return init_clip_params(cfg, seed), cfg, False
