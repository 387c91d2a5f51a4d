#!/usr/bin/env python
"""End-to-end throughput benchmark: MRI volumes/sec/chip through the
full GFE-Mamba pipeline (PET generation + classification) at the
canonical 160x160x96 / dim-512 configuration, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the CPU reference throughput stored in
``bench_baseline.json`` (produced once by ``python bench.py
--cpu-baseline`` on the host CPU, which mirrors the "CPU-baseline"
clause of BASELINE.json's north star).  Without that file,
vs_baseline is 0.0.

Usage:
    python bench.py               # TPU benchmark (default)
    python bench.py --quick       # tiny config smoke (CPU-friendly)
    python bench.py --cpu-baseline  # measure + store the CPU baseline
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def build(small: bool):
    import jax
    import jax.numpy as jnp
    from gfe_mamba_tpu.models.pipeline import build_gfe_mamba

    if small:
        model = build_gfe_mamba(
            categories=(3, 5, 2), num_continuous=4, dim=32, depth=1, heads=2,
            seq_length=2, f_maps=(4, 8, 16), layer_order="cge",
            fold_factor=2, vit_patch_size=4, vit_dim=16, vit_depth=1,
            vit_heads=2, vit_mlp_dim=32)
        img_sz, cats, n_cont, batch = (16, 16, 8), (3, 5, 2), 4, 2
    else:
        cats = tuple([6] * 8)
        model = build_gfe_mamba(categories=cats, num_continuous=40, dim=512,
                                depth=6, heads=8, seq_length=4,
                                f_maps=(64, 128, 256))
        img_sz, n_cont, batch = (160, 160, 96), 40, 4

    rng = np.random.RandomState(0)
    mri = jnp.asarray(rng.randn(batch, *img_sz, 1), jnp.bfloat16)
    x_cat = jnp.zeros((batch, len(cats)), jnp.int32)
    x_num = jnp.asarray(rng.randn(batch, n_cont), jnp.bfloat16)

    params = model.init(jax.random.key(0), mri[:1], x_cat[:1], x_num[:1])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    fwd = jax.jit(lambda p, m, c, n: model.apply(p, m, c, n,
                                                 return_pet=True))
    return fwd, params, (mri, x_cat, x_num), batch


def measure(fwd, params, args, batch, warmup: int, iters: int) -> float:
    import jax
    out = fwd(params, *args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fwd(params, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, *args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--cpu-baseline", action="store_true")
    parser.add_argument("--iters", type=int, default=0)
    args = parser.parse_args()

    if args.cpu_baseline:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    small = args.quick or args.cpu_baseline
    fwd, params, inputs, batch = build(small=small and args.quick)

    if args.cpu_baseline:
        # CPU reference throughput at the SAME canonical config
        fwd, params, inputs, batch = build(small=False)
        iters = args.iters or 2
        vps = measure(fwd, params, inputs, batch, warmup=0, iters=iters)
        with open(BASELINE_FILE, "w") as f:
            json.dump({"cpu_volumes_per_sec": vps,
                       "host": os.uname().nodename,
                       "note": "1-core host CPU, canonical config, bf16"},
                      f)
        print(json.dumps({"metric": "cpu_baseline_volumes_per_sec",
                          "value": round(vps, 4), "unit": "vol/s",
                          "vs_baseline": 1.0}))
        return

    iters = args.iters or (3 if args.quick else 10)
    vps = measure(fwd, params, inputs, batch, warmup=1, iters=iters)

    vs_baseline = 0.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["cpu_volumes_per_sec"]
        if base > 0:
            vs_baseline = vps / base

    print(json.dumps({
        "metric": "e2e_mri_volumes_per_sec_per_chip",
        "value": round(vps, 4),
        "unit": "volumes/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
