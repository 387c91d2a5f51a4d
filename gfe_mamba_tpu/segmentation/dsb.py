"""DSB2018-style 2D nuclei dataset (reference datasets/dsb.py:32).

Layout: <root>/images/*.png + <root>/masks/*.png (matching stems).
Images load as grayscale float in [0, 1] channels-last (H, W, 1);
masks as binary {0, 1}.  Config-driven transform pipelines from
segmentation.transforms apply to both (spatial transforms share a seed
so image/mask stay aligned when built via ``paired_transforms``)."""

from __future__ import annotations

import os
from glob import glob
from os.path import basename, join, splitext

import numpy as np

from gfe_mamba_tpu.segmentation.transforms import build_transforms


def _load_png(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("L")
    return np.asarray(img, np.float32) / 255.0


class DSB2018Dataset:
    def __init__(self, root: str, phase: str = "train",
                 transformer_config=None, seed: int = 47):
        self.phase = phase
        self.images = sorted(glob(join(root, "images", "*.png")))
        self.masks_dir = join(root, "masks")
        self.transform = None
        self.mask_transform = None
        if transformer_config:
            # twin pipelines with the same seed: random spatial ops align
            self.transform = build_transforms(transformer_config, seed)
            self.mask_transform = build_transforms(transformer_config, seed)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int) -> dict:
        img_path = self.images[index]
        image = _load_png(img_path)[..., None]
        item = {"raw": image, "name": basename(img_path)}
        if self.phase != "test":
            stem = splitext(basename(img_path))[0]
            mask_path = join(self.masks_dir, stem + ".png")
            if os.path.exists(mask_path):
                mask = (_load_png(mask_path) > 0.5).astype(np.float32)
                item["label"] = mask[..., None]
        if self.transform is not None:
            item["raw"] = self.transform(item["raw"])
            if "label" in item and self.mask_transform is not None:
                item["label"] = self.mask_transform(item["label"])
        return item
