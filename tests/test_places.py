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

    def test_converter_structural(self):
        """Synthetic torchvision-named state dict converts with correct
        transposes and produces a runnable forward."""
        rng = np.random.default_rng(1)

        def w(*s):
            return rng.standard_normal(s).astype(np.float32) * 0.05

        sd = {"conv1.weight": w(64, 3, 7, 7), "fc.weight": w(365, 512),
              "fc.bias": w(365)}
        for prefix, ch in (("bn1", 64),):
            sd[f"{prefix}.weight"] = np.ones(ch, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(ch, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(ch, np.float32)
        chans = [64, 128, 256, 512]
        c_in = 64
        for si, c in enumerate(chans):
            for bi in range(2):
                base = f"layer{si + 1}.{bi}"
                cin = c_in if bi == 0 else c
                sd[f"{base}.conv1.weight"] = w(c, cin, 3, 3)
                sd[f"{base}.conv2.weight"] = w(c, c, 3, 3)
                for bn in ("bn1", "bn2"):
                    sd[f"{base}.{bn}.weight"] = np.ones(c, np.float32)
                    sd[f"{base}.{bn}.bias"] = np.zeros(c, np.float32)
                    sd[f"{base}.{bn}.running_mean"] = np.zeros(c, np.float32)
                    sd[f"{base}.{bn}.running_var"] = np.ones(c, np.float32)
                if bi == 0 and si > 0:
                    sd[f"{base}.downsample.0.weight"] = w(c, cin, 1, 1)
                    sd[f"{base}.downsample.1.weight"] = np.ones(c, np.float32)
                    sd[f"{base}.downsample.1.bias"] = np.zeros(c, np.float32)
                    sd[f"{base}.downsample.1.running_mean"] = np.zeros(c, np.float32)
                    sd[f"{base}.downsample.1.running_var"] = np.ones(c, np.float32)
            c_in = c
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
