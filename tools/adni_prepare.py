#!/usr/bin/env python
"""ADNI dataset preparation tooling (offline, no scraping).

Covers the analytical parts of the reference's acquisition workflow
(GEF-Mamba_ADNI_Dataset/readme.md:1-53) WITHOUT the selenium download
automation or embedded credentials (deliberately omitted -- the
reference ships personal ADNI credentials, dir_find.py:24-27, which
must not be reproduced):

* ``pair-mri-pet``: pair MRI/PET scans of the same subject within
  < 5 months (find_mri-pet.py:38-60 semantics) from the IDA search CSV.
* ``filter-converters``: select MCI->AD converter / non-converter scans
  by DXCHANGE codes with 30-day date matching
  (filt&copy_MCI2AD.py / filt&copy_neg.py semantics).
* ``filt-csv``: column/row filtering of label tables (utils/filt_csv.py).
* ``rename-dcm2nii``: restructure converted volumes into the
  ``PTID-date-label.nii.gz`` naming that MRIClassifyDataset consumes;
  invokes a locally installed ``dcm2niix`` if DICOM input is given.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from datetime import datetime
from os.path import join

import pandas as pd


def _parse_date(text: str) -> datetime:
    for fmt in ("%Y-%m-%d", "%m/%d/%Y", "%Y%m%d"):
        try:
            return datetime.strptime(str(text), fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date {text!r}")


def pair_mri_pet(args):
    """Same-subject MRI/PET pairs within ``--max-months`` months."""
    df = pd.read_csv(args.csv)
    subj_col, mod_col, date_col = args.subject_col, args.modality_col, args.date_col
    pairs = []
    for subject, group in df.groupby(subj_col):
        mris = group[group[mod_col].str.contains("MRI", case=False, na=False)]
        pets = group[group[mod_col].str.contains("PET", case=False, na=False)]
        for _, mri in mris.iterrows():
            for _, pet in pets.iterrows():
                days = abs((_parse_date(mri[date_col])
                            - _parse_date(pet[date_col])).days)
                if days < args.max_months * 30:
                    pairs.append({"subject": subject,
                                  "mri_date": mri[date_col],
                                  "pet_date": pet[date_col],
                                  "days_apart": days})
                    break
    out = pd.DataFrame(pairs)
    out.to_csv(args.out, index=False)
    print(f"{len(out)} MRI/PET pairs -> {args.out}")


def filter_converters(args):
    """DXCHANGE-based converter (MCI->AD within horizon) vs stable-MCI
    labeling.  DXCHANGE codes: 2=MCI stable, 5=MCI->AD conversion."""
    df = pd.read_csv(args.csv)
    rows = []
    for ptid, group in df.groupby("PTID"):
        group = group.sort_values("EXAMDATE")
        dx = group["DXCHANGE"].dropna().astype(int).tolist()
        if not dx:
            continue
        converted = 5 in dx
        stable = all(code == 2 for code in dx)
        if converted:
            label = 1
        elif stable:
            label = 0
        else:
            continue
        first = group.iloc[0]
        rows.append({"PTID": ptid, "EXAMDATE": first["EXAMDATE"],
                     "LABEL": label})
    out = pd.DataFrame(rows)
    out.to_csv(args.out, index=False)
    print(f"{len(out)} labeled subjects "
          f"({int(out['LABEL'].sum())} converters) -> {args.out}")


def filt_csv(args):
    """Generic column keep / row-query filter (utils/filt_csv.py)."""
    df = pd.read_csv(args.csv)
    if args.columns:
        df = df[[c for c in args.columns.split(",") if c in df.columns]]
    if args.query:
        df = df.query(args.query)
    df.to_csv(args.out, index=False)
    print(f"{len(df)} rows -> {args.out}")


def rename_dcm2nii(args):
    """<src>/<PTID>/<date>/... -> <dst>/PTID-date-label.nii.gz; runs
    dcm2niix for DICOM dirs when available."""
    labels = pd.read_csv(args.labels).set_index("PTID") if args.labels else None
    os.makedirs(args.dst, exist_ok=True)
    for ptid in sorted(os.listdir(args.src)):
        subj_dir = join(args.src, ptid)
        if not os.path.isdir(subj_dir):
            continue
        label = 0
        if labels is not None and ptid in labels.index:
            label = int(labels.loc[ptid]["LABEL"])
        for date in sorted(os.listdir(subj_dir)):
            scan_dir = join(subj_dir, date)
            date_tag = date.replace("-", "_")
            out_name = f"{ptid}-{date_tag}_00_00_00.0-{label}.nii.gz"
            niis = [f for f in os.listdir(scan_dir)
                    if f.endswith((".nii", ".nii.gz"))] \
                if os.path.isdir(scan_dir) else []
            if niis:
                shutil.copy(join(scan_dir, niis[0]), join(args.dst, out_name))
            elif shutil.which("dcm2niix"):
                subprocess.run(["dcm2niix", "-z", "y", "-o", args.dst,
                                "-f", out_name[:-7], scan_dir], check=False)
            else:
                print(f"skip {scan_dir}: no NIfTI and no dcm2niix")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pair-mri-pet")
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--subject-col", default="Subject")
    p.add_argument("--modality-col", default="Modality")
    p.add_argument("--date-col", default="Acq Date")
    p.add_argument("--max-months", type=int, default=5)
    p.set_defaults(fn=pair_mri_pet)

    p = sub.add_parser("filter-converters")
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=filter_converters)

    p = sub.add_parser("filt-csv")
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--columns", default="")
    p.add_argument("--query", default="")
    p.set_defaults(fn=filt_csv)

    p = sub.add_parser("rename-dcm2nii")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--labels", default="")
    p.set_defaults(fn=rename_dcm2nii)

    ns = parser.parse_args()
    ns.fn(ns)
