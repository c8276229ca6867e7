"""ResNet18-Places365 tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from eioku_tpu.models.resnet.model import (
    convert_torchvision_state_dict,
    init_resnet18_params,
    preprocess,
    resnet18_forward,
)


class TestResNet18:
    def test_forward_shape(self):
        params = init_resnet18_params(365, seed=0)
        x = jnp.zeros((2, 224, 224, 3))
        logits = resnet18_forward(params, x)
        assert logits.shape == (2, 365)

    def test_param_count(self):
        from eioku_tpu.models.layers import param_count
        # torchvision resnet18 (365 classes) ~ 11.36M params
        n = param_count(init_resnet18_params(365))
        assert 11.0e6 < n < 11.9e6, n

    def test_preprocess_normalization(self):
        x = jnp.full((1, 224, 224, 3), 255, jnp.uint8)
        out = np.asarray(preprocess(x))
        expected = (1.0 - np.array([0.485, 0.456, 0.406])) / \
            np.array([0.229, 0.224, 0.225])
        # output is bf16 (production activation dtype): ~3 decimal digits
        np.testing.assert_allclose(out[0, 0, 0].astype(np.float32), expected,
                                   rtol=1e-2)

    def test_torchvision_converter_matches_torch(self):
        """Convert a random torchvision resnet18 and compare logits vs torch
        (skipped when torchvision is absent; the structural test below always
        runs)."""
        pytest.importorskip("torch")
        torchvision = pytest.importorskip("torchvision")
        import torch

        torch.manual_seed(0)
        model = torchvision.models.resnet18(num_classes=365)
        model.eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = convert_torchvision_state_dict(sd)

        rng = np.random.default_rng(0)
        img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
        ours = np.asarray(resnet18_forward(params, jnp.asarray(img)))
        with torch.no_grad():
            theirs = model(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_conv_and_pool_padding_match_torch(self):
        """Every (k, stride) the model zoo uses must reproduce torch's
        symmetric k//2 padding — XLA "SAME" is asymmetric for stride 2 and
        silently shifts the sampling grid of converted checkpoints."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from eioku_tpu.models.layers import conv2d, max_pool

        rng = np.random.default_rng(0)
        for k, s, n in [(3, 2, 64), (3, 1, 64), (1, 1, 64), (7, 2, 224),
                        (3, 2, 57)]:
            x = rng.standard_normal((1, n, n, 4)).astype(np.float32)
            w = rng.standard_normal((k, k, 4, 6)).astype(np.float32)
            ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(w.transpose(3, 2, 0, 1)),
                           stride=s, padding=(k - 1) // 2
                           ).numpy().transpose(0, 2, 3, 1)
            ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=s))
            assert ours.shape == ref.shape, (k, s, n)
            np.testing.assert_allclose(ours, ref, atol=1e-4)
        for k, s, n in [(3, 2, 112), (2, 2, 64), (5, 1, 20), (3, 1, 24)]:
            x = rng.standard_normal((1, n, n, 4)).astype(np.float32)
            ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), k,
                               stride=s, padding=(k - 1) // 2
                               ).numpy().transpose(0, 2, 3, 1)
            ours = np.asarray(max_pool(jnp.asarray(x), k, stride=s))
            assert ours.shape == ref.shape, (k, s, n)
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    @staticmethod
    def _random_state_dict(rng):
        """torchvision-named resnet18 state dict with random weights."""
        def w(*s):
            return rng.standard_normal(s).astype(np.float32) * 0.05

        sd = {"conv1.weight": w(64, 3, 7, 7), "fc.weight": w(365, 512),
              "fc.bias": w(365)}
        for prefix, ch in (("bn1", 64),):
            sd[f"{prefix}.weight"] = 1 + w(ch)
            sd[f"{prefix}.bias"] = w(ch)
            sd[f"{prefix}.running_mean"] = w(ch)
            sd[f"{prefix}.running_var"] = np.abs(1 + w(ch)).astype(np.float32)
        chans = [64, 128, 256, 512]
        c_in = 64
        for si, c in enumerate(chans):
            for bi in range(2):
                base = f"layer{si + 1}.{bi}"
                cin = c_in if bi == 0 else c
                sd[f"{base}.conv1.weight"] = w(c, cin, 3, 3)
                sd[f"{base}.conv2.weight"] = w(c, c, 3, 3)
                for bn in ("bn1", "bn2"):
                    sd[f"{base}.{bn}.weight"] = 1 + w(c)
                    sd[f"{base}.{bn}.bias"] = w(c)
                    sd[f"{base}.{bn}.running_mean"] = w(c)
                    sd[f"{base}.{bn}.running_var"] = \
                        np.abs(1 + w(c)).astype(np.float32)
                if bi == 0 and si > 0:
                    sd[f"{base}.downsample.0.weight"] = w(c, cin, 1, 1)
                    sd[f"{base}.downsample.1.weight"] = 1 + w(c)
                    sd[f"{base}.downsample.1.bias"] = w(c)
                    sd[f"{base}.downsample.1.running_mean"] = w(c)
                    sd[f"{base}.downsample.1.running_var"] = \
                        np.abs(1 + w(c)).astype(np.float32)
            c_in = c
        return sd

    def test_full_model_matches_torch_functional(self):
        """Full-model numerical parity vs an independent torch.nn.functional
        resnet18 (torchvision is absent in this image, so the reference
        forward is written out by hand): converter + forward + the
        torch-compatible stride-2 padding in one check."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        sd = self._random_state_dict(rng)
        t = {k: torch.from_numpy(v) for k, v in sd.items()}

        def bn(x, p):
            return F.batch_norm(x, t[p + ".running_mean"],
                                t[p + ".running_var"], t[p + ".weight"],
                                t[p + ".bias"], eps=1e-5)

        def torch_forward(x):
            x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
            x = F.relu(bn(x, "bn1"))
            x = F.max_pool2d(x, 3, stride=2, padding=1)
            for li, stride in zip(range(1, 5), (1, 2, 2, 2)):
                for blk in range(2):
                    s = stride if blk == 0 else 1
                    p = f"layer{li}.{blk}"
                    identity = x
                    out = F.relu(bn(F.conv2d(x, t[p + ".conv1.weight"],
                                             stride=s, padding=1),
                                    p + ".bn1"))
                    out = bn(F.conv2d(out, t[p + ".conv2.weight"], padding=1),
                             p + ".bn2")
                    if p + ".downsample.0.weight" in t:
                        identity = bn(
                            F.conv2d(x, t[p + ".downsample.0.weight"],
                                     stride=s), p + ".downsample.1")
                    x = F.relu(out + identity)
            x = x.mean((2, 3))
            return x @ t["fc.weight"].T + t["fc.bias"]

        img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            theirs = torch_forward(
                torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(resnet18_forward(
            convert_torchvision_state_dict(sd), jnp.asarray(img)))
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_converter_structural(self):
        """Synthetic torchvision-named state dict converts with correct
        transposes and produces a runnable forward."""
        sd = self._random_state_dict(np.random.default_rng(1))
        params = convert_torchvision_state_dict(sd)
        np.testing.assert_allclose(
            np.asarray(params["conv1"]["w"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        assert "down" in params["layers"][1][0]
        assert "down" not in params["layers"][0][0]
        logits = resnet18_forward(params, jnp.zeros((1, 224, 224, 3)))
        assert logits.shape == (1, 365)


class TestPlacesPipeline:
    def test_runs_on_video(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video
        from eioku_tpu.ml.places import run_place_classification
        from eioku_tpu.domain.schema_registry import SchemaRegistry, register_all_schemas

        register_all_schemas()
        path = str(tmp_path / "p.mp4")
        write_video(path, [(20, (50, 120, 200))], fps=10, size=(64, 64))
        results = run_place_classification(path, {"frame_interval_s": 1.0,
                                                  "batch_size": 4, "top_k": 3})
        assert len(results) == 2  # 2 s video at 1 fps sampling
        for r in results:
            m = SchemaRegistry.validate("place.classification", 1, r["payload"])
            assert len(m.predictions) == 3
