"""One-command pretrained-weights pipeline: fetch -> convert -> validate.

The reference downloads its evaluation/perceptual backbones at run time
(train_ldm.py:271-273: torch.hub Warvito/radimagenet-models resnet50 for 2D
FID, Warvito/MedicalNet-models medicalnet_resnet50_23datasets for 3D FID;
train_autoencoder.py:27,601: torchvision VGG16 features for the perceptual
loss). This image has no network egress, so the framework falls back to
fixed random features. On the first machine WITH egress, run:

    python tools/fetch_pretrained_weights.py --out-dir weights/

which downloads the three torch checkpoints, converts them with
tools/convert_torch_weights.py, validates every produced npz against the
structural manifest below (exact array names + shapes derived from this
package's own inference architectures), and writes weights/LOCK.json with
SHA-256 of the sources and outputs. Then:

    export MEDIMGEN_VGG_WEIGHTS=weights/vgg16.npz
    export MEDIMGEN_FID_WEIGHTS_2D=weights/fid2d.npz
    export MEDIMGEN_FID_WEIGHTS_3D=weights/fid3d.npz

Offline, `--validate-only <npz> <kind>` checks an existing npz against the
manifest (used by tests and by trainers' startup warnings).

Sources (reference parity):
  vgg16  https://download.pytorch.org/models/vgg16-397923af.pth
         (torchvision; the filename embeds the first 8 sha256 hex digits)
  fid2d  torch.hub Warvito/radimagenet-models : radimagenet_resnet50
  fid3d  torch.hub Warvito/MedicalNet-models : medicalnet_resnet50_23datasets
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
VGG16_SHA256_PREFIX = "397923af"  # torchvision convention: filename = first 8 hex


# ----------------------------------------------------------------- manifest


def vgg_manifest() -> dict:
    """Expected arrays of MEDIMGEN_VGG_WEIGHTS (models/perceptual.VGGFeatures)."""
    from medical_image_generation_tpu.models.perceptual import _VGG_PLAN

    expected = {}
    in_ch = 3
    for stage, (ch, n_convs) in enumerate(_VGG_PLAN):
        for i in range(n_convs):
            expected[f"conv{stage}_{i}.kernel"] = (3, 3, in_ch, ch)
            expected[f"conv{stage}_{i}.bias"] = (ch,)
            in_ch = ch
    return expected


def resnet_manifest(spatial_dims: int) -> dict:
    """Expected arrays of MEDIMGEN_FID_WEIGHTS_{2D,3D}: the flax param tree
    of eval/features.ResNet50Features in pretrained (frozen-BN) mode,
    flattened with '/' — exactly what convert_torch_weights emits."""
    import jax
    import jax.numpy as jnp

    from medical_image_generation_tpu.eval.features import (
        MEDICALNET_STAGES,
        RESNET50_STAGES,
        ResNet50Features,
    )

    stages = RESNET50_STAGES if spatial_dims == 2 else MEDICALNET_STAGES
    in_ch = 3 if spatial_dims == 2 else 1
    net = ResNet50Features(
        spatial_dims=spatial_dims, stages=stages, frozen_bn=True,
        dilated=(spatial_dims == 3),
    )
    x = jnp.zeros((1,) + (8,) * spatial_dims + (in_ch,), jnp.float32)
    tree = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        flat[key] = tuple(leaf.shape)
    return flat


def validate_npz(path: str, kind: str) -> None:
    """Raise ValueError unless ``path`` holds exactly the arrays (names and
    shapes) the loaders expect for ``kind`` in {vgg, fid2d, fid3d}."""
    expected = {
        "vgg": vgg_manifest,
        "fid2d": lambda: resnet_manifest(2),
        "fid3d": lambda: resnet_manifest(3),
    }[kind]()
    with np.load(path) as data:
        got = {k: tuple(data[k].shape) for k in data.files}
    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    bad = sorted(
        k for k in set(expected) & set(got) if expected[k] != got[k]
    )
    if missing or extra or bad:
        lines = [f"{path} does not match the {kind} manifest:"]
        if missing:
            lines.append(f"  missing {len(missing)}: {missing[:5]} ...")
        if extra:
            lines.append(f"  unexpected {len(extra)}: {extra[:5]} ...")
        for k in bad[:5]:
            lines.append(f"  {k}: shape {got[k]} != expected {expected[k]}")
        raise ValueError("\n".join(lines))
    print(f"{path}: OK ({len(expected)} arrays match the {kind} manifest)")


# -------------------------------------------------------------------- fetch


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_and_convert(out_dir: str) -> None:
    import torch

    from tools.convert_torch_weights import convert, convert_resnet50

    os.makedirs(out_dir, exist_ok=True)
    lock = {}

    # VGG16 (torchvision features layout)
    vgg_pth = os.path.join(out_dir, "vgg16-397923af.pth")
    if not os.path.exists(vgg_pth):
        torch.hub.download_url_to_file(VGG16_URL, vgg_pth)
    digest = _sha256(vgg_pth)
    if not digest.startswith(VGG16_SHA256_PREFIX):
        raise RuntimeError(
            f"vgg16 checkpoint sha256 {digest[:8]} != expected prefix "
            f"{VGG16_SHA256_PREFIX} — corrupted or wrong file"
        )
    sd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    vgg_npz = os.path.join(out_dir, "vgg16.npz")
    convert(sd, vgg_npz)
    validate_npz(vgg_npz, "vgg")
    lock["vgg16"] = {"url": VGG16_URL, "source_sha256": digest,
                     "npz_sha256": _sha256(vgg_npz)}

    # RadImageNet ResNet50 (2D FID), reference train_ldm.py:271
    model = torch.hub.load("Warvito/radimagenet-models",
                           model="radimagenet_resnet50", trust_repo=True)
    fid2d_npz = os.path.join(out_dir, "fid2d.npz")
    convert_resnet50(model.state_dict(), fid2d_npz, spatial_dims=2)
    validate_npz(fid2d_npz, "fid2d")
    lock["fid2d"] = {"hub": "Warvito/radimagenet-models:radimagenet_resnet50",
                     "npz_sha256": _sha256(fid2d_npz)}

    # MedicalNet ResNet50 (3D FID), reference train_ldm.py:273
    model = torch.hub.load("Warvito/MedicalNet-models",
                           model="medicalnet_resnet50_23datasets",
                           trust_repo=True)
    fid3d_npz = os.path.join(out_dir, "fid3d.npz")
    convert_resnet50(model.state_dict(), fid3d_npz, spatial_dims=3)
    validate_npz(fid3d_npz, "fid3d")
    lock["fid3d"] = {
        "hub": "Warvito/MedicalNet-models:medicalnet_resnet50_23datasets",
        "npz_sha256": _sha256(fid3d_npz)}

    with open(os.path.join(out_dir, "LOCK.json"), "w") as f:
        json.dump(lock, f, indent=2)
    print(f"\nAll weights ready under {out_dir}/ — export:")
    print(f"  MEDIMGEN_VGG_WEIGHTS={vgg_npz}")
    print(f"  MEDIMGEN_FID_WEIGHTS_2D={fid2d_npz}")
    print(f"  MEDIMGEN_FID_WEIGHTS_3D={fid3d_npz}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", default="weights")
    p.add_argument("--validate-only", nargs=2, metavar=("NPZ", "KIND"),
                   help="validate an existing npz against the manifest "
                        "(KIND in vgg|fid2d|fid3d); no network needed")
    args = p.parse_args()
    if args.validate_only:
        validate_npz(*args.validate_only)
        return
    fetch_and_convert(args.out_dir)


if __name__ == "__main__":
    main()
