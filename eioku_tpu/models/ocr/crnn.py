"""CRNN text recognizer (VGG feature extractor + BiLSTM + CTC) in JAX.

TPU-native rebuild of EasyOCR's recognizer (None-VGG-BiLSTM-CTC generation-2
models, e.g. latin_g2): grayscale 32xW crops -> VGG-style conv stack -> 2-layer
bidirectional LSTM -> per-frame charset logits -> CTC greedy collapse (host).
The LSTM runs as lax.scan inside jit; crops are batched at fixed widths.
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

# EasyOCR latin charset (generation 2), blank is index 0 for CTC.
LATIN_CHARSET = (
    "0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "ÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏÐÑÒÓÔÕÖØÙÚÛÜÝÞßàáâãäåæçèéêëìíîïðñòóôõöøùúûüýþÿ"
    "ĀāĂăĄąĆćČčĎďĐđĒēĖėĘęĚěĞğĨĩĪīĮįİıĶķĹĺĻļĽľŁłŃńŅņŇňŒœŔŕŘřŚśŞşŠšŤťŨũŪūŮůŲų"
    "ŸŹźŻżŽžƏƠơƯưȘșȚțə"
)

IMG_H = 32
HIDDEN = 256


def charset_size(charset: str = LATIN_CHARSET) -> int:
    return len(charset) + 1  # + CTC blank


def _init_lstm(kg: KeyGen, d_in: int, d_h: int) -> Params:
    # gates ordered i, f, g, o (torch convention)
    return {"wi": kaiming(kg(), (d_in, 4 * d_h)),
            "wh": kaiming(kg(), (d_h, 4 * d_h)),
            "bi": jnp.zeros(4 * d_h), "bh": jnp.zeros(4 * d_h)}


def init_crnn_params(n_classes: int | None = None, seed: int = 0) -> Params:
    n_classes = n_classes or charset_size()
    kg = KeyGen(seed)
    p: Params = {
        # VGG_FeatureExtractor(1, 512) plan
        "conv0": {"w": kaiming(kg(), (3, 3, 1, 64)), "b": jnp.zeros(64)},
        "conv1": {"w": kaiming(kg(), (3, 3, 64, 128)), "b": jnp.zeros(128)},
        "conv2": {"w": kaiming(kg(), (3, 3, 128, 256)), "b": jnp.zeros(256)},
        "conv3": {"w": kaiming(kg(), (3, 3, 256, 256)), "b": jnp.zeros(256)},
        "conv4": {"w": kaiming(kg(), (3, 3, 256, 512))},
        "bn4": init_batchnorm(512),
        "conv5": {"w": kaiming(kg(), (3, 3, 512, 512))},
        "bn5": init_batchnorm(512),
        "conv6": {"w": kaiming(kg(), (2, 2, 512, 512)), "b": jnp.zeros(512)},
        "lstm1_fw": _init_lstm(kg, 512, HIDDEN),
        "lstm1_bw": _init_lstm(kg, 512, HIDDEN),
        "lstm1_proj": init_linear(kg(), 2 * HIDDEN, HIDDEN),
        "lstm2_fw": _init_lstm(kg, HIDDEN, HIDDEN),
        "lstm2_bw": _init_lstm(kg, HIDDEN, HIDDEN),
        "lstm2_proj": init_linear(kg(), 2 * HIDDEN, HIDDEN),
        "fc": init_linear(kg(), HIDDEN, n_classes),
    }
    return p


def _lstm_scan(x: jnp.ndarray, p: Params, reverse: bool = False) -> jnp.ndarray:
    """x [B, T, D] -> hidden states [B, T, H] via lax.scan."""
    b, t, d = x.shape
    h_dim = p["wh"].shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # [T, B, D]
    if reverse:
        xs = xs[::-1]
    pre = jnp.einsum("tbd,dh->tbh", xs, p["wi"],
                     preferred_element_type=jnp.float32) + p["bi"] + p["bh"]

    def step(carry, gates_x):
        h, c = carry
        gates = gates_x + jnp.dot(h, p["wh"], preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    _, hs = jax.lax.scan(step, init, pre)
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)


def _bilstm(x, fw, bw, proj):
    h = jnp.concatenate([_lstm_scan(x, fw), _lstm_scan(x, bw, reverse=True)],
                        axis=-1)
    return linear(h, proj)


def _pool(x, kh, kw, sh, sw):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1), "VALID")


@jax.jit
def crnn_forward(params: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, 32, W, 1] in [-1, 1] -> logits [B, T, n_classes], T ~ W/4 - 1."""
    x = jax.nn.relu(conv2d(images, params["conv0"]["w"], params["conv0"]["b"]))
    x = _pool(x, 2, 2, 2, 2)
    x = jax.nn.relu(conv2d(x, params["conv1"]["w"], params["conv1"]["b"]))
    x = _pool(x, 2, 2, 2, 2)
    x = jax.nn.relu(conv2d(x, params["conv2"]["w"], params["conv2"]["b"]))
    x = jax.nn.relu(conv2d(x, params["conv3"]["w"], params["conv3"]["b"]))
    x = _pool(x, 2, 1, 2, 1)
    x = jax.nn.relu(batchnorm(conv2d(x, params["conv4"]["w"]), params["bn4"],
                              eps=1e-5))
    x = jax.nn.relu(batchnorm(conv2d(x, params["conv5"]["w"]), params["bn5"],
                              eps=1e-5))
    x = _pool(x, 2, 1, 2, 1)
    x = jax.nn.relu(conv2d(x, params["conv6"]["w"], params["conv6"]["b"],
                           padding="VALID"))
    # x: [B, 1, T, 512] -> [B, T, 512]
    x = x[:, 0]
    x = _bilstm(x, params["lstm1_fw"], params["lstm1_bw"], params["lstm1_proj"])
    x = _bilstm(x, params["lstm2_fw"], params["lstm2_bw"], params["lstm2_proj"])
    return linear(x, params["fc"])


def ctc_greedy_decode(logits: np.ndarray, charset: str = LATIN_CHARSET
                      ) -> list[tuple[str, float]]:
    """logits [B, T, C] -> [(text, confidence)] via best-path decoding."""
    out = []
    probs = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs /= probs.sum(axis=-1, keepdims=True)
    ids = logits.argmax(axis=-1)
    for b in range(logits.shape[0]):
        chars, confs = [], []
        prev = -1
        for t in range(ids.shape[1]):
            i = int(ids[b, t])
            if i != prev and i != 0:
                chars.append(charset[i - 1] if i - 1 < len(charset) else "")
                confs.append(float(probs[b, t, i]))
            prev = i
        text = "".join(chars).strip()
        out.append((text, float(np.mean(confs)) if confs else 0.0))
    return out


# -- EasyOCR checkpoint conversion --------------------------------------------------


_CONV_MAP = [
    ("conv0", "FeatureExtraction.ConvNet.0"),
    ("conv1", "FeatureExtraction.ConvNet.3"),
    ("conv2", "FeatureExtraction.ConvNet.6"),
    ("conv3", "FeatureExtraction.ConvNet.8"),
    ("conv4", "FeatureExtraction.ConvNet.11"),
    ("conv5", "FeatureExtraction.ConvNet.14"),
    ("conv6", "FeatureExtraction.ConvNet.18"),
]
_BN_MAP = [("bn4", "FeatureExtraction.ConvNet.12"),
           ("bn5", "FeatureExtraction.ConvNet.15")]


def convert_easyocr_recognizer(sd: dict, n_classes: int | None = None) -> Params:
    """Convert an EasyOCR None-VGG-BiLSTM-CTC state dict."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    n_classes = n_classes or int(np.asarray(sd["Prediction.weight"]).shape[0])
    p = init_crnn_params(n_classes)

    def cw(key):
        return jnp.asarray(np.transpose(np.asarray(sd[key], np.float32),
                                        (2, 3, 1, 0)))

    for ours, theirs in _CONV_MAP:
        p[ours]["w"] = cw(f"{theirs}.weight")
        if f"{theirs}.bias" in sd:
            p[ours]["b"] = jnp.asarray(np.asarray(sd[f"{theirs}.bias"],
                                                  np.float32))
    for ours, theirs in _BN_MAP:
        p[ours] = {"gamma": jnp.asarray(np.asarray(sd[f"{theirs}.weight"],
                                                   np.float32)),
                   "beta": jnp.asarray(np.asarray(sd[f"{theirs}.bias"],
                                                  np.float32)),
                   "mean": jnp.asarray(np.asarray(sd[f"{theirs}.running_mean"],
                                                  np.float32)),
                   "var": jnp.asarray(np.asarray(sd[f"{theirs}.running_var"],
                                                 np.float32))}
    for li in (1, 2):
        base = f"SequenceModeling.{li - 1}.rnn"
        for direction, suffix in (("fw", ""), ("bw", "_reverse")):
            p[f"lstm{li}_{direction}"] = {
                "wi": jnp.asarray(np.asarray(
                    sd[f"{base}.weight_ih_l0{suffix}"], np.float32).T),
                "wh": jnp.asarray(np.asarray(
                    sd[f"{base}.weight_hh_l0{suffix}"], np.float32).T),
                "bi": jnp.asarray(np.asarray(
                    sd[f"{base}.bias_ih_l0{suffix}"], np.float32)),
                "bh": jnp.asarray(np.asarray(
                    sd[f"{base}.bias_hh_l0{suffix}"], np.float32)),
            }
        p[f"lstm{li}_proj"] = {
            "w": jnp.asarray(np.asarray(
                sd[f"SequenceModeling.{li - 1}.linear.weight"], np.float32).T),
            "b": jnp.asarray(np.asarray(
                sd[f"SequenceModeling.{li - 1}.linear.bias"], np.float32)),
        }
    p["fc"] = {"w": jnp.asarray(np.asarray(sd["Prediction.weight"], np.float32).T),
               "b": jnp.asarray(np.asarray(sd["Prediction.bias"], np.float32))}
    return p
