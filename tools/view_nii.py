#!/usr/bin/env python
"""Slice-sheet viewer for NIfTI volumes (reference utils/manual_read_nii
.py): renders every depth slice of a volume into one PNG grid.

Usage: python tools/view_nii.py <volume.nii.gz> [--out out.png]
       [--normalize]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gfe_mamba_tpu.data.nifti import load_nifti
from gfe_mamba_tpu.utils.experiment import save_volume_grid


def main(args):
    vol, hdr = load_nifti(args.volume)
    if vol.ndim > 3:
        vol = vol[..., 0]
    print(f"{args.volume}: shape={vol.shape} pixdim={hdr.pixdim} "
          f"range=[{vol.min():.2f}, {vol.max():.2f}]")
    if args.normalize:
        lo, hi = np.percentile(vol, [1, 99])
        vol = np.clip((vol - lo) / max(hi - lo, 1e-9), 0, 1) * 2 - 1
    out = args.out or os.path.basename(args.volume).split(".")[0] + ".png"
    save_volume_grid(vol, out, normalize=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("volume")
    parser.add_argument("--out", default="")
    parser.add_argument("--normalize", action="store_true")
    main(parser.parse_args())
