"""Test harness: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the TPU-native
substitute for multi-node CI -- see SURVEY.md section 4f)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU even though this environment (a) exports JAX_PLATFORMS=axon
# (the TPU tunnel) and (b) PRE-IMPORTS jax at interpreter startup, which
# bakes that env var into the config before conftest runs.  config.update
# still wins as long as no backend has been initialized.  Tests must
# leave the real chip free and exercise the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: XLA:CPU compiles are several seconds each in
# this environment; cache them across test processes.  GFE_JAX_CACHE
# lets a suite run point at a private copy.
#
# Hardening (round 4): this jaxlib's CPU AOT (de)serializer segfaults
# sporadically under heavy entry traffic -- three suite runs died at
# 49-81% inside compilation_cache.put_/get_executable_and_time with the
# old cache-everything policy (min_entry_size=-1, min_compile_secs=0,
# thousands of ms-scale entries).  Two mitigations:
#   * suite cache lives in its own CPU-only dir (no tiny legacy entries
#     to read back, no cross-process traffic from TPU jobs), and
#   * only compiles >= GFE_CACHE_MIN_SECS (default 1 s) are serialized,
#     which keeps the multi-second XLA:CPU compiles warm while cutting
#     serializer round-trips by orders of magnitude.
# GFE_CACHE_READONLY=1 still means: reuse entries, never write.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GFE_JAX_CACHE", "/root/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    1e18 if os.environ.get("GFE_CACHE_READONLY")
    else float(os.environ.get("GFE_CACHE_MIN_SECS", "1.0")))
