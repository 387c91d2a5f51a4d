#!/usr/bin/env python
"""Raw HBM bandwidth / elementwise / op probes on the TPU.

Inputs are materialized ONCE on device; each timed call takes a fresh
host scalar that multiplies the final reduction (distinct args+outputs
defeat the axon tunnel's (executable, args) memoization without paying
the on-device RNG cost that contaminated earlier probes -- generating a
630 MB normal tensor costs ~33 ms by itself).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, x, iters=8):
    vals = [float(fn(x, np.float32(i + 1))) for i in range(2)]  # compile+warm
    t0 = time.perf_counter()
    vals = [fn(x, np.float32(100 + i)) for i in range(iters)]
    vals = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / iters
    assert all(np.isfinite(v) for v in vals)
    assert len(set(vals)) == iters
    return dt


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    print(jax.devices(), flush=True)

    SHAPE = (2, 160, 160, 96, 64)
    nbytes = int(np.prod(SHAPE)) * 2
    x_full = jax.device_put(
        (jnp.arange(int(np.prod(SHAPE)), dtype=jnp.float32) % 7.0 - 3.0)
        .astype(jnp.bfloat16).reshape(SHAPE) * 0.1)

    def run(name, f, traffic, x=None):
        x = x_full if x is None else x

        @jax.jit
        def fn(x, s):
            return jnp.sum(f(x).astype(jnp.float32)) * s
        dt = timeit(fn, x)
        gbps = traffic / dt / 1e9
        print(f"{name:32s} {dt*1e3:8.2f} ms  {gbps:7.1f} GB/s", flush=True)
        return dt

    run("read+sum", lambda x: x, nbytes)
    run("add1+sum", lambda x: x + 1.0, nbytes)
    run("elu+sum", jax.nn.elu, nbytes)
    run("exp+sum", jnp.exp, nbytes)
    run("relu+sum", jax.nn.relu, nbytes)
    # force materialization: write out then read (sum of the same array)
    run("transpose_mat", lambda x: jnp.swapaxes(x, 1, 3) * 1.0, 3 * nbytes)
    import flax.linen as nn
    gn = nn.GroupNorm(num_groups=8)
    gnp = gn.init(jax.random.key(0), x_full)

    @jax.jit
    def fngn(x, s):
        return jnp.sum(gn.apply(gnp, x).astype(jnp.float32)) * s
    dt = timeit(fngn, x_full)
    print(f"{'groupnorm(flax)':32s} {dt*1e3:8.2f} ms  "
          f"{2*nbytes/dt/1e9:7.1f} GB/s", flush=True)

    # conv pair with persistent input
    conv = nn.Sequential([nn.Conv(64, (3, 3, 3), padding=1),
                          nn.Conv(64, (3, 3, 3), padding=1)])
    cp = conv.init(jax.random.key(0), x_full)
    cp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), cp)

    @jax.jit
    def fnc(x, s):
        return jnp.sum(conv.apply(cp, x).astype(jnp.float32)) * s
    dt = timeit(fnc, x_full)
    flops = 2 * 2 * int(np.prod(SHAPE[:4])) * 27 * 64 * 64 * 2
    print(f"{'conv64_full(x2)':32s} {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:7.1f} TF/s = {100*flops/dt/1e12/197:.1f}%",
          flush=True)

    # deconv with persistent input
    xh = jax.device_put(
        (jnp.arange(2 * 80 * 80 * 48 * 128, dtype=jnp.float32) % 5.0 - 2.0)
        .astype(jnp.bfloat16).reshape(2, 80, 80, 48, 128) * 0.1)
    dconv = nn.ConvTranspose(64, (3, 3, 3), strides=(2, 2, 2),
                             padding=[(1, 0)] * 3, use_bias=False)
    dp = dconv.init(jax.random.key(0), xh)
    dp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), dp)

    @jax.jit
    def fnd(x, s):
        return jnp.sum(dconv.apply(dp, x).astype(jnp.float32)) * s
    dt = timeit(fnd, xh)
    flops = 2 * int(np.prod(SHAPE[:4])) * 27 // 8 * 128 * 64 * 2
    print(f"{'deconv128to64':32s} {dt*1e3:8.2f} ms  "
          f"{flops/dt/1e12:7.1f} TF/s = {100*flops/dt/1e12/197:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
