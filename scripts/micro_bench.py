"""Decomposed on-device timing of the codec's constituent ops.

The axon tunnel adds tens of ms of per-call overhead, so each component is
looped REPS times inside ONE jitted scan; the per-iteration time is then
(call_time - overhead) / REPS with overhead measured by an empty scan.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 32


def timed_call(fn, variants):
    """variants: list of >=2 distinct arg tuples.  The axon relay memoizes
    repeated identical calls, so each timed call uses fresh inputs; first
    variant warms up compilation."""
    out = fn(*variants[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for args in variants[1:]:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def scan_reps(body):
    """jit a fn that runs `body(carry, *extras)` REPS times sequentially.
    Extras are passed as jit args (NOT closure constants — the axon remote
    compiler rejects programs with large embedded constants)."""

    def run(x0, *extras):
        def step(c, _):
            return body(c, *extras), None

        out, _ = jax.lax.scan(step, x0, None, length=REPS)
        return out

    return jax.jit(run)


def main():
    from bitswap_tpu.ans.vectorized import (
        ans_decode_lanes,
        ans_encode_lanes,
        init_lane_state,
    )
    from bitswap_tpu.ans.tables import build_tables_from_cdf
    from bitswap_tpu.ops.logistic import logistic_cdf
    from bitswap_tpu.models import VAEConfig, init_params
    from bitswap_tpu.models.vae import infer_apply

    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    for L in (64, 128, 256):
        seq, S = 1024, 1024
        state = init_lane_state(L, capacity=131072, init_words=2048)
        pmf = jnp.asarray(rng.random((L, seq, S)).astype(np.float32) + 0.5)
        tabs = jax.jit(lambda p: build_tables_from_cdf(
            jnp.cumsum(p, -1)[..., :-1] / jnp.sum(p, -1, keepdims=True), 10))(pmf)
        cdf = jax.block_until_ready(tabs.cdf)
        syms = jnp.asarray(rng.integers(0, S, size=(L, seq)).astype(np.int32))

        # overhead of the harness itself
        t_null = timed_call(
            scan_reps(lambda c: c + 1),
            [(jnp.full((8, 128), i, jnp.float32),) for i in range(4)],
        )

        def state_variant(i):
            return state._replace(hi=state.hi + np.uint32(i))

        # encode: carry the state through reps (symbols/cdf fixed)
        t_enc = timed_call(
            scan_reps(ans_encode_lanes),
            [(state_variant(i), cdf, syms) for i in range(4)],
        )

        # decode: carry state (each rep decodes garbage, fine for timing)
        st_full = jax.block_until_ready(
            jax.jit(ans_encode_lanes)(state, cdf, syms))

        def dec_body(st, cdf):
            st2, sym = ans_decode_lanes(st, cdf)
            return st2._replace(sp=st.sp, hi=st.hi, lo=st.lo)  # reset so it never underflows

        t_dec = timed_call(
            scan_reps(dec_body),
            [(st_full._replace(hi=st_full.hi | np.uint32(1 << i)), cdf) for i in range(4)],
        )

        # table build: mu depends on carry to defeat CSE
        mu0 = jnp.asarray(rng.random((L, seq, 1)).astype(np.float32))
        sc0 = jnp.asarray(rng.random((L, seq, 1)).astype(np.float32) + 0.5)
        ep = jnp.asarray(np.linspace(-3, 3, S - 1, dtype=np.float32))

        def tab_body(mu, sc, ep):
            t = build_tables_from_cdf(logistic_cdf(ep[None, None], mu, sc), 10)
            return mu + t.cdf[..., -1:].astype(jnp.float32) * 1e-20

        t_tab = timed_call(
            scan_reps(tab_body),
            [(mu0 + 0.001 * i, sc0, ep) for i in range(4)],
        )

        # infer pass
        cfg = VAEConfig(xs=(32, 32, 1), nz=4, zchannels=1, nprocessing=4,
                        kernel_size=3, resdepth=8, reswidth=62)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x0 = jnp.asarray(rng.random((L,) + cfg.xs).astype(np.float32))

        def inf_body(x, params):
            mu, sc = infer_apply(params, cfg, 0, x)
            # fold output back into an input-shaped carry
            up = jnp.zeros_like(x) + jnp.mean(mu) * 1e-20
            return x + up

        t_inf = timed_call(
            scan_reps(inf_body),
            [(x0 + 0.001 * i, params) for i in range(4)],
        )

        ms = lambda t: (t - t_null) / REPS * 1e3
        print(f"L={L:4d}: encode {ms(t_enc):8.3f} ms  decode {ms(t_dec):8.3f} ms  "
              f"tables {ms(t_tab):8.3f} ms  infer0 {ms(t_inf):8.3f} ms  "
              f"(null {t_null*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
