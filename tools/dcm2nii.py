#!/usr/bin/env python
"""ADNI DICOM -> NIfTI conversion + renaming driver.

Self-contained rebuild of the reference's three-script workflow
(GEF-Mamba_ADNI_Dataset/dcm2nii/{2txt,2nii,processing}.py: enumerate
series dirs -> shell out to MRIcroGL's dcm2niix.exe -> copy/rename
ADNI tree folders to ``CODE-DATE-LABEL``):

* walks an ADNI download tree
  (``<root>/<PTID>/<sequence>/<date>/<image-id>/``, the layout
  processing.py:14-24 parses) or any directory of DICOM series
* converts each series with the ``dcm2niix`` binary when one is on
  PATH, else with the in-repo pure-Python reader
  (gfe_mamba_tpu/data/dicom.py)
* names outputs ``PTID-YYYY_MM_DD_hh_mm_ss.0-LABEL.nii.gz`` -- exactly
  what MRIClassifyDataset's filename join consumes
  (pic_table_loader.py:119-124)

Usage:
    python tools/dcm2nii.py <adni_root> <out_dir> --label 1
    python tools/dcm2nii.py <series_dir> <out_dir> --flat --name sub1
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
from glob import glob
from os.path import join

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gfe_mamba_tpu.data.nifti import save_nifti  # noqa: E402


def _dcm2niix() -> "str | None":
    return shutil.which("dcm2niix")


def _series_files(series_dir: str) -> list[str]:
    return sorted(glob(join(series_dir, "*.dcm"))
                  + glob(join(series_dir, "*.DCM"))
                  + [p for p in glob(join(series_dir, "*"))
                     if os.path.isfile(p) and "." not in
                     os.path.basename(p)])


def convert_series(series_dir: str, out_path: str) -> dict:
    """One DICOM series dir -> one .nii.gz; returns the series meta."""
    files = _series_files(series_dir)
    if not files:
        raise ValueError(f"no DICOM files in {series_dir}")
    binary = _dcm2niix()
    if binary:
        out_dir = os.path.dirname(out_path) or "."
        base = os.path.basename(out_path).replace(".nii.gz", "")
        subprocess.run(
            [binary, "-z", "y", "-b", "n", "-f", base, "-o", out_dir,
             series_dir],
            check=True, capture_output=True, timeout=600)
        from gfe_mamba_tpu.data.dicom import read_dicom
        s = read_dicom(files[0])
        return {"patient_id": s.patient_id, "study_date": s.study_date,
                "converter": "dcm2niix"}
    from gfe_mamba_tpu.data.dicom import stack_series
    vol, meta = stack_series(files)
    save_nifti(out_path, vol, pixdim=meta["spacing"])
    meta["converter"] = "python"
    return meta


def _adni_walk(root: str):
    """Yield (ptid, date_dirname, series_dir) for the ADNI layout
    ``<root>/<PTID>/<sequence>/<date>/<I-image-id>/`` -- the path
    split the reference renamer uses (processing.py:17-21)."""
    for dirpath, dirnames, _ in os.walk(root):
        for d in dirnames:
            if d.startswith("I") and d[1:].replace("-", "").isdigit():
                series = join(dirpath, d)
                parts = os.path.normpath(series).split(os.sep)
                if len(parts) >= 4:
                    yield parts[-4], parts[-2], series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="ADNI root (or one series dir w/ --flat)")
    ap.add_argument("out_dir")
    ap.add_argument("--label", type=int, default=1,
                    help="conversion label appended to filenames")
    ap.add_argument("--flat", action="store_true",
                    help="input is a single series directory")
    ap.add_argument("--name", default="subject",
                    help="PTID stem for --flat mode")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.flat:
        out = join(args.out_dir, f"{args.name}-{args.label}.nii.gz")
        meta = convert_series(args.input, out)
        print(f"{args.input} -> {out} [{meta['converter']}]")
        return

    n_ok = n_fail = 0
    for ptid, date, series in _adni_walk(args.input):
        date_tag = date.replace("-", "_")
        out = join(args.out_dir,
                   f"{ptid}-{date_tag}-{args.label}.nii.gz")
        if os.path.exists(out):
            continue
        try:
            meta = convert_series(series, out)
        except (ValueError, subprocess.SubprocessError, OSError) as exc:
            print(f"FAIL {series}: {exc}", file=sys.stderr)
            n_fail += 1
            continue
        n_ok += 1
        print(f"{series} -> {os.path.basename(out)} "
              f"[{meta['converter']}]")
    print(f"done: {n_ok} converted, {n_fail} failed")


if __name__ == "__main__":
    main()
