"""Test environment: force the CPU backend with 8 virtual devices so sharding
tests run without TPU hardware.  Must run before jax is imported anywhere."""

import os

# Overwrite, not setdefault: the host environment pins JAX_PLATFORMS=axon (the
# TPU plugin); tests must be hermetic on CPU.  The site hook imports jax before
# conftest runs, snapshotting env into jax.config — so update the live config
# below rather than (only) the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This jax build uses TPU-default (bf16-class) matmul precision even on CPU and
# the site hook imports jax before conftest runs, so env vars are too late —
# update the live config.  Exact-parity tests need true float32 accumulation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
