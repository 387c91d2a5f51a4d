"""Merge quality-parity artifacts into one pooled summary.

Combines the per-seed ``runs`` of several ``tools/quality_parity.py``
output JSONs (e.g. a --reuse-torch rerun of seeds 0-5 plus a fresh
full run of seeds 6-9) into a single artifact with recomputed pooled
means, signed deltas, per-seed spread and SEM.  Configs must agree on
the fields that define the experiment (shape/dims/epochs/gan/hard/
n_test); seeds must be disjoint.

Usage:
    python tools/merge_quality.py out.json in1.json in2.json ... \
        [--note "..."]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

_CONFIG_KEYS = ("shape", "f_maps", "dim", "depth", "heads", "seq_length",
                "epochs1", "epochs2", "n_test", "gan", "hard",
                "warm_epochs")


def merge(paths: list[str], note: str | None = None) -> dict:
    arts = []
    for p in paths:
        with open(p) as f:
            arts.append(json.load(f))

    base = arts[0]["config"]
    for art, p in zip(arts[1:], paths[1:]):
        for k in _CONFIG_KEYS:
            if art["config"].get(k) != base.get(k):
                raise ValueError(
                    f"{p}: config[{k!r}] = {art['config'].get(k)!r} "
                    f"!= {base.get(k)!r} of {paths[0]}")

    runs = [r for art in arts for r in art["runs"]]
    seeds = [r["seed"] for r in runs]
    if len(set(seeds)) != len(seeds):
        raise ValueError(f"duplicate seeds across inputs: {sorted(seeds)}")
    runs.sort(key=lambda r: r["seed"])

    def mean(side, key):
        return float(np.mean([r[side][key] for r in runs]))

    summary = {
        "config": {**base, "seeds": [r["seed"] for r in runs],
                   "merged_from": paths},
        "torch_reference": {k: round(mean("torch_reference", k), 4)
                            for k in runs[0]["torch_reference"]},
        "gfe_mamba_tpu": {k: round(mean("gfe_mamba_tpu", k), 4)
                          for k in runs[0]["gfe_mamba_tpu"]},
        "runs": runs,
    }
    summary["delta_f1_pt"] = round(100 * (
        summary["gfe_mamba_tpu"]["f1"]
        - summary["torch_reference"]["f1"]), 2)
    summary["delta_mcc_pt"] = round(100 * (
        summary["gfe_mamba_tpu"]["mcc"]
        - summary["torch_reference"]["mcc"]), 2)
    summary["within_half_point"] = bool(summary["delta_f1_pt"] >= -0.5
                                        and summary["delta_mcc_pt"] >= -0.5)
    per_seed = [round(100 * (r["gfe_mamba_tpu"]["mcc"]
                             - r["torch_reference"]["mcc"]), 2)
                for r in runs]
    summary["per_seed_mcc_delta_pt"] = per_seed
    summary["mcc_delta_sem_pt"] = round(float(
        np.std(per_seed, ddof=1) / np.sqrt(len(per_seed))), 2)
    if note:
        summary["note"] = note
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--note", default=None)
    args = ap.parse_args()
    summary = merge(args.inputs, args.note)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("delta_f1_pt", "delta_mcc_pt", "within_half_point",
                       "per_seed_mcc_delta_pt", "mcc_delta_sem_pt")}))


if __name__ == "__main__":
    main()
