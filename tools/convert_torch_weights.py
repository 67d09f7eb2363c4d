"""Convert torch pretrained weights to the npz layouts this package loads.

This air-gapped image cannot download pretrained weights, so the perceptual
loss and the FID extractors default to fixed random features. On a machine
with the checkpoints, convert them and point the env vars at the outputs:

  VGG16 (perceptual loss; torchvision ``features.N.weight`` layout):
      python tools/convert_torch_weights.py vgg16.pth vgg16.npz
      export MEDIMGEN_VGG_WEIGHTS=vgg16.npz

  RadImageNet ResNet50 (2D FID; torchvision resnet50 state_dict — the
  reference's torch.hub Warvito/radimagenet-models, train_ldm.py:271):
      python tools/convert_torch_weights.py --resnet50-2d radimagenet_resnet50.pth fid2d.npz
      export MEDIMGEN_FID_WEIGHTS_2D=fid2d.npz

  MedicalNet ResNet50 (3D FID; MedicalNet resnet50 state_dict — the
  reference's Warvito/MedicalNet-models, train_ldm.py:273; dilated
  layer3/layer4, shortcut 'B'):
      python tools/convert_torch_weights.py --resnet50-3d medicalnet_resnet50.pth fid3d.npz
      export MEDIMGEN_FID_WEIGHTS_3D=fid3d.npz

torch conv weights are (out, in, k...); flax expects (k..., in, out).
BatchNorm maps (weight, bias, running_mean, running_var) ->
(scale, bias, mean, var) of eval/features.FrozenBatchNorm.
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision VGG16 'features' indices of the conv layers, per stage
_VGG16_FEATURE_INDICES = {
    (0, 0): 0, (0, 1): 2,
    (1, 0): 5, (1, 1): 7,
    (2, 0): 10, (2, 1): 12, (2, 2): 14,
    (3, 0): 17, (3, 1): 19, (3, 2): 21,
    (4, 0): 24, (4, 1): 26, (4, 2): 28,
}

_BN_FIELDS = {"scale": "weight", "bias": "bias", "mean": "running_mean",
              "var": "running_var"}


def convert(state_dict, out_path: str) -> None:
    """VGG16 'features' -> npz for models/perceptual.VGGFeatures."""
    arrays = {}
    for (stage, conv), idx in _VGG16_FEATURE_INDICES.items():
        w_key, b_key = f"features.{idx}.weight", f"features.{idx}.bias"
        if w_key not in state_dict:
            raise KeyError(f"missing {w_key}: not a torchvision VGG16 state_dict?")
        w = np.asarray(state_dict[w_key])
        b = np.asarray(state_dict[b_key])
        name = f"conv{stage}_{conv}"
        arrays[f"{name}.kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        arrays[f"{name}.bias"] = b.astype(np.float32)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def resnet50_mapping(stages, spatial_dims: int):
    """flax flat param key (sep '/') -> (torch state_dict key, kind).

    Mirrors the module-creation order of eval/features.ResNet50Features with
    ``frozen_bn=True`` so every generated key exists in the flax tree."""
    mapping = {"params/ConvND_0/Conv_0/kernel": ("conv1.weight", "kernel")}

    def bn(flax_prefix, torch_prefix):
        for fk, tk in _BN_FIELDS.items():
            mapping[f"params/{flax_prefix}/{fk}"] = (f"{torch_prefix}.{tk}", "vec")

    bn("FrozenBatchNorm_0", "bn1")
    block, in_ch = 0, 64
    for stage_idx, (features, blocks, stride, _dilation) in enumerate(stages):
        for i in range(blocks):
            tp = f"layer{stage_idx + 1}.{i}"
            fp = f"_Bottleneck_{block}"
            for ci in range(3):
                mapping[f"params/{fp}/ConvND_{ci}/Conv_0/kernel"] = (
                    f"{tp}.conv{ci + 1}.weight", "kernel")
                bn(f"{fp}/FrozenBatchNorm_{ci}", f"{tp}.bn{ci + 1}")
            s = stride if i == 0 else 1
            if in_ch != features * 4 or s != 1:
                mapping[f"params/{fp}/ConvND_3/Conv_0/kernel"] = (
                    f"{tp}.downsample.0.weight", "kernel")
                bn(f"{fp}/FrozenBatchNorm_3", f"{tp}.downsample.1")
            in_ch = features * 4
            block += 1
    return mapping


def convert_resnet50(state_dict, out_path: str, spatial_dims: int) -> None:
    """torchvision (2D) / MedicalNet (3D) ResNet50 -> npz for
    eval/features.FeatureExtractor (frozen-BN pretrained mode)."""
    from medical_image_generation_tpu.eval.features import (
        MEDICALNET_STAGES,
        RESNET50_STAGES,
    )

    stages = RESNET50_STAGES if spatial_dims == 2 else MEDICALNET_STAGES
    perm = (2, 3, 1, 0) if spatial_dims == 2 else (2, 3, 4, 1, 0)
    # MedicalNet checkpoints wrap in DataParallel ('module.' prefix) and may
    # nest under 'state_dict'
    inner = state_dict.get("state_dict")
    if isinstance(inner, dict):
        state_dict = inner
    state_dict = {k[len("module."):] if k.startswith("module.") else k: v
                  for k, v in state_dict.items()}

    mapping = resnet50_mapping(stages, spatial_dims)
    arrays = {}
    for flax_key, (torch_key, kind) in mapping.items():
        if torch_key not in state_dict:
            raise KeyError(
                f"missing {torch_key}: not a {'torchvision' if spatial_dims == 2 else 'MedicalNet'}"
                " resnet50 state_dict?"
            )
        v = np.asarray(state_dict[torch_key])
        arrays[flax_key] = (
            np.transpose(v, perm) if kind == "kernel" else v
        ).astype(np.float32)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def main():
    args = [a for a in sys.argv[1:]]
    mode = "vgg"
    if "--resnet50-2d" in args:
        args.remove("--resnet50-2d"); mode = "r50_2d"
    if "--resnet50-3d" in args:
        args.remove("--resnet50-3d"); mode = "r50_3d"
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    import torch

    sd = torch.load(args[0], map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if mode == "vgg":
        convert(sd, args[1])
    else:
        convert_resnet50(sd, args[1], 2 if mode == "r50_2d" else 3)


if __name__ == "__main__":
    main()
