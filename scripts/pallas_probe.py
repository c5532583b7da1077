"""Probe Pallas support on the current TPU platform: uint32 arithmetic,
shifts, fori_loop state machines, and per-lane dynamic gather
(take_along_axis along the sublane axis) inside a kernel."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_u32(x):
    def kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = (v << jnp.uint32(1)) + (v >> jnp.uint32(31)) + jnp.uint32(7)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_loop(x):
    """fori_loop carrying a (8,128) uint32 tile, writing per-step rows."""

    def kernel(x_ref, o_ref):
        def body(t, carry):
            carry = carry + x_ref[t]
            o_ref[t] = carry
            return carry

        jax.lax.fori_loop(0, x_ref.shape[0], body, jnp.zeros_like(x_ref[0]))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_gather(win, idx):
    """Per-lane dynamic gather win[idx[l], l] via take_along_axis."""

    def kernel(w_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(w_ref[:], i_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, win.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.integers(0, 2**32, size=(8, 128), dtype=np.uint32))
    got = probe_u32(x)
    want = (x << jnp.uint32(1)) + (x >> jnp.uint32(31)) + jnp.uint32(7)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("uint32 shifts/add: OK")

    x = jnp.asarray(rng.integers(0, 1000, size=(16, 8, 128), dtype=np.uint32))
    got = probe_loop(x)
    want = jnp.cumsum(x, axis=0, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print("fori_loop state machine: OK")

    win = jnp.asarray(rng.integers(0, 2**32, size=(256, 128), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 256, size=(1, 128), dtype=np.int32))
    try:
        got = probe_gather(win, idx)
        want = np.take_along_axis(np.asarray(win), np.asarray(idx), axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        print("per-lane dynamic gather (take_along_axis axis=0): OK")
    except Exception as e:  # noqa: BLE001
        print(f"per-lane dynamic gather: FAILED ({type(e).__name__}: {str(e)[:300]})")


if __name__ == "__main__":
    main()
