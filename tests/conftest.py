"""Test configuration: force a CPU backend with 8 virtual devices.

Everything in the codec is testable on CPU (SURVEY.md §7 "Minimum end-to-end
slice"); the multi-chip sharding tests use the 8 virtual devices as a stand-in
mesh.  x64 is enabled because the golden table-construction path (matching
the reference's float64 compression mode, mnist_compress.py:77) needs real
float64 — the lane coder itself is pure uint32 and runs identically either way.
"""

import os

# Force the CPU backend: the ambient environment routes JAX to the TPU
# tunnel ("axon" platform, one chip, high per-call latency), and its
# sitecustomize re-pins jax_platforms after import — so the env var alone is
# not enough; the config must be updated post-import as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"
