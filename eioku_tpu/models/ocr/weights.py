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


# language -> EasyOCR generation-2 recognizer model (all share the
# None-VGG-BiLSTM-CTC architecture; only n_classes/charset differ). The
# reference instantiates easyocr.Reader per task language
# (model_manager.py:469-558); languages outside this map use the latin model.
RECOGNIZER_FOR_LANGUAGE = {
    "ja": "japanese_g2",
    "ko": "korean_g2",
    "zh": "zh_sim_g2",
    "ru": "cyrillic_g2", "uk": "cyrillic_g2", "be": "cyrillic_g2",
    "bg": "cyrillic_g2", "mn": "cyrillic_g2", "sr": "cyrillic_g2",
    "ar": "arabic_g2", "fa": "arabic_g2", "ur": "arabic_g2",
    "hi": "devanagari_g2", "mr": "devanagari_g2", "ne": "devanagari_g2",
    "th": "thai_g2",
    "el": "greek_g2",
    "bn": "bengali_g2",
    "te": "telugu_g2",
    "kn": "kannada_g2",
}


def recognizer_for_language(lang: str) -> str:
    return RECOGNIZER_FOR_LANGUAGE.get(lang.lower(), "latin_g2")


def _load_charset(cache_dir: str, model: str) -> str | None:
    """Charset sidecar `{model}_chars.txt` (the character list the checkpoint
    was trained with, one line or one char per line; index 0 stays CTC blank).
    """
    import os

    path = os.path.join(cache_dir, f"{model}_chars.txt")
    if not os.path.isfile(path):
        return None
    with open(path, encoding="utf-8") as f:
        text = f.read()
    lines = [ln for ln in text.split("\n") if ln != ""]
    # one char per line (EasyOCR's char files) vs a single charset string
    if len(lines) > 1 and all(len(ln) == 1 for ln in lines):
        return "".join(lines)
    return text.rstrip("\n")


def load_ocr_checkpoints(cache_dir: str | None, recognizer: str = "latin_g2"):
    """Returns (craft_params, crnn_params, charset, pretrained?).

    The recognizer checkpoint is `{cache_dir}/{recognizer}.pth`; for the latin
    family `english_g2.pth` doubles as a fallback and the built-in latin
    charset covers it. Other scripts need a charset sidecar (above); without
    one the recognizer falls back to latin so output stays well-defined.
    """
    import os

    from eioku_tpu.models.ocr.crnn import (
        LATIN_CHARSET,
        convert_easyocr_recognizer,
        init_crnn_params,
    )

    craft = crnn = None
    charset = LATIN_CHARSET
    if cache_dir:
        cpath = os.path.join(cache_dir, "craft_mlt_25k.pth")
        if os.path.isfile(cpath):
            import torch
            sd = torch.load(cpath, map_location="cpu", weights_only=False)
            sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
            craft = convert_craft_state_dict(sd)
        names = [f"{recognizer}.pth"]
        if recognizer == "latin_g2":
            names.append("english_g2.pth")
        for name in names:
            rpath = os.path.join(cache_dir, name)
            if not os.path.isfile(rpath):
                continue
            model = name.removesuffix(".pth")
            cs = _load_charset(cache_dir, model)
            if cs is None and recognizer not in ("latin_g2", "english_g2"):
                import logging
                logging.getLogger(__name__).warning(
                    "no charset sidecar %s_chars.txt for OCR model %s; "
                    "falling back to the latin recognizer", model, model)
                continue
            import torch
            sd = torch.load(rpath, map_location="cpu", weights_only=False)
            sd = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in sd.items()}
            crnn = convert_easyocr_recognizer(sd)
            if cs is not None:
                charset = cs
            break
        if crnn is None and recognizer != "latin_g2":
            # non-latin model unavailable: retry with the latin family
            return load_ocr_checkpoints(cache_dir, "latin_g2")
    pretrained = craft is not None and crnn is not None
    if craft is None:
        craft = init_craft_params(seed=0)
    if crnn is None:
        crnn = init_crnn_params(seed=0)
    return craft, crnn, charset, pretrained
