"""Convert torch VGG16 weights to the npz layout of models/perceptual.py.

This air-gapped image cannot download pretrained weights, so the perceptual
loss defaults to fixed random features (models/perceptual.py docstring). On a
machine with the torchvision VGG16 checkpoint (or any torch state_dict with
the standard ``features.N.weight/bias`` layout), run:

    python tools/convert_torch_weights.py vgg16.pth vgg16_medimgen.npz

then point ``MEDIMGEN_VGG_WEIGHTS`` at the npz to get true VGG perceptual
distances (the reference's LPIPS-style protocol, train_autoencoder.py:27).

torch conv weights are (out, in, kH, kW); flax expects (kH, kW, in, out).
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


def convert(state_dict, out_path: str) -> None:
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


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    import torch

    sd = torch.load(sys.argv[1], map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    convert({k: v.numpy() for k, v in sd.items()}, sys.argv[2])


if __name__ == "__main__":
    main()
