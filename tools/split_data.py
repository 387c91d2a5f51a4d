#!/usr/bin/env python
"""Train/test splitting of dataset trees (reference utils/split_data.py
and utils/split_cla.py: 80/20 splits of per-subject dirs or flat
classify files).

Usage:
  python tools/split_data.py --src <dir> --dst <dir> [--ratio 0.8]
      [--mode subjects|files] [--seed 0] [--move]
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
from os.path import join


def main(args):
    entries = sorted(os.listdir(args.src))
    if args.mode == "files":
        entries = [e for e in entries if e.endswith((".nii", ".nii.gz"))]
    rng = random.Random(args.seed)
    rng.shuffle(entries)
    cut = int(len(entries) * args.ratio)
    splits = {"train": entries[:cut], "test": entries[cut:]}
    op = shutil.move if args.move else (
        shutil.copytree if args.mode == "subjects" else shutil.copy)
    for split, items in splits.items():
        out = join(args.dst, split)
        os.makedirs(out, exist_ok=True)
        for item in items:
            src = join(args.src, item)
            dst = join(out, item)
            if args.move:
                shutil.move(src, dst)
            elif os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy(src, dst)
        print(f"{split}: {len(items)}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--ratio", type=float, default=0.8)
    parser.add_argument("--mode", choices=["subjects", "files"],
                        default="subjects")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--move", action="store_true")
    main(parser.parse_args())
