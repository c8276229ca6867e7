"""ArcFace iresnet18 face embedder (models/face_embed/model.py).

Parity-tested against a torch replica of insightface's iresnet18
(arcface_torch/backbones/iresnet.py layout) with randomized weights AND
randomized BN running stats — the converter must reproduce the exact eval
forward, not just shapes.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class IBasicBlock(nn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(c_in)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.prelu = nn.PReLU(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, stride, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        identity = x
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class IResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.prelu = nn.PReLU(64)
        chans, c_in, layers = [64, 128, 256, 512], 64, []
        for c_out in chans:
            layers += [IBasicBlock(c_in, c_out, 2), IBasicBlock(c_out, c_out, 1)]
            c_in = c_out
        self.layer1 = nn.Sequential(*layers[0:2])
        self.layer2 = nn.Sequential(*layers[2:4])
        self.layer3 = nn.Sequential(*layers[4:6])
        self.layer4 = nn.Sequential(*layers[6:8])
        self.bn2 = nn.BatchNorm2d(512)
        self.fc = nn.Linear(512 * 7 * 7, 512)
        self.features = nn.BatchNorm1d(512)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


def _randomize_bn(model):
    """Out-of-the-box BN has mean=0/var=1/gamma=1 — parity would pass even if
    the converter dropped the stats. Randomize everything."""
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.weight.data.uniform_(0.5, 1.5, generator=g)
            m.bias.data.uniform_(-0.3, 0.3, generator=g)
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)


class TestFaceEmbedParity:
    def test_matches_torch_replica(self):
        from eioku_tpu.models.face_embed.model import (
            convert_arcface_state_dict,
            face_embed,
        )
        torch.manual_seed(0)
        model = IResNet18().eval()
        _randomize_bn(model)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_arcface_state_dict(sd)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(face_embed(params, x))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_ddp_prefix_accepted(self):
        from eioku_tpu.models.face_embed.model import (
            convert_arcface_state_dict,
            face_embed,
        )
        torch.manual_seed(1)
        model = IResNet18().eval()
        sd = {"module." + k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_arcface_state_dict(sd)
        out = face_embed(params, np.zeros((1, 112, 112, 3), np.float32))
        assert out.shape == (1, 512)

    def test_random_init_runs(self):
        from eioku_tpu.models.face_embed.model import (
            face_embed,
            init_face_embed_params,
            preprocess,
        )
        params = init_face_embed_params()
        crops = np.random.default_rng(0).integers(
            0, 255, (3, 112, 112, 3)).astype(np.uint8)
        out = np.asarray(face_embed(params, preprocess(crops)))
        assert out.shape == (3, 512)
        assert np.isfinite(out).all()

    def test_load_falls_back_without_checkpoint(self, tmp_path):
        from eioku_tpu.models.face_embed.model import load_face_embed
        params, pretrained = load_face_embed(str(tmp_path))
        assert pretrained is False and "layers" in params
