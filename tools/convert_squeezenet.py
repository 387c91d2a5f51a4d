#!/usr/bin/env python
"""Offline converter: torchvision SqueezeNet-1.1 ``.pth`` state_dict ->
``.npz`` matching :class:`gfe_mamba_tpu.losses.perceptual.SqueezeFeatures`.

Restores pretrained-feature parity for the perceptual loss (MONAI
``PerceptualLoss(network_type="squeeze")``, reference
main_gan_vit.py:41): run this once on a machine with the torchvision
checkpoint (``squeezenet1_1-b8a52dc0.pth``), then point
``PerceptualLoss(weights_path=...)`` at the output.

Only ``torch`` is needed (to unpickle the state_dict); torchvision is
NOT imported.  Layout transform: torch OIHW conv kernels -> flax HWIO.

Usage:
    python tools/convert_squeezenet.py squeezenet1_1.pth out.npz
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision squeezenet1_1 ``features`` indices -> SqueezeFeatures names
# (torchvision/models/squeezenet.py: SqueezeNet("1_1"); the trunk is
# Conv, ReLU, MaxPool, Fire x2, MaxPool, Fire x2, MaxPool, Fire x4)
FIRE_INDEX = {1: 3, 2: 4, 3: 6, 4: 7, 5: 9, 6: 10, 7: 11, 8: 12}


def _k(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_state_dict(sd: dict) -> dict:
    """torch state_dict (tensors or ndarrays) -> SqueezeFeatures params."""

    def arr(key):
        v = sd[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)

    params = {"conv1": {"kernel": _k(arr("features.0.weight")),
                        "bias": arr("features.0.bias")}}
    for i, idx in FIRE_INDEX.items():
        fire = {}
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            fire[sub] = {
                "kernel": _k(arr(f"features.{idx}.{sub}.weight")),
                "bias": arr(f"features.{idx}.{sub}.bias"),
            }
        params[f"fire{i}"] = fire
    return {"params": params}


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    import torch
    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: v for k, v in sd.items() if k.startswith("features.")}
    # the npz 'params' entry holds the FULL flax variables dict
    # ({"params": {...}}), matching PerceptualLoss's weights_path loader
    tree = convert_state_dict(sd)
    np.savez(dst, params=np.asarray(tree, dtype=object))
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"converted {len(sd)} tensors ({n:,} params) -> {dst}")


if __name__ == "__main__":
    main()
