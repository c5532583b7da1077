"""Compression experiment harness — the reference's dataset codec drivers.

Re-design of `{mnist,cifar,imagenet}_compress.py`'s 100-experiment x
100-datapoint sweeps (mnist_compress.py:70-366).  The reference codes one
experiment at a time, one datapoint at a time, ping-ponging host<->device
per layer; here every experiment is one lane of the lane-parallel codec, so
ALL experiments are coded simultaneously by a single device-resident scan.

Metric semantics match the reference exactly (mnist_compress.py:254-263):
  nets[e, t]  = per-datapoint added bits/dim  ((sp_t - sp_{t-1}) * 32 / xdim)
  elbos[e, t] = per-datapoint -ELBO/dim (analytic optimum; D = net - elbo)
  cma[e, t]   = (sp_t - sp_rest + 1) * 32 / (xdim * (t+1))  — cumulative
                moving average counting the not-yet-consumed initial bits
                via the `restbits` snapshot after the first decode
  total[e, t] = (sp_t - sp_rest + 1) * 32

Outputs land in plots/{dataset}{nz}/ with the reference's file naming, so
the cma/stack plotting tools work on either implementation's results.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ExperimentResult:
    nets: np.ndarray  # (experiments, ndatapoints)
    elbos: np.ndarray
    cma: np.ndarray
    total: np.ndarray
    scheme: str
    verified: Optional[bool] = None  # round-trip check result (None = skipped)

    def summary(self) -> str:
        return (
            f"{self.scheme}: net {self.nets.mean():.4f}±{self.nets.std():.4f} b/d, "
            f"elbo {self.elbos.mean():.4f} b/d, D {self.nets.mean() - self.elbos.mean():+.4f}, "
            f"cma@end {self.cma[:, -1].mean():.4f} b/d"
            + ("" if self.verified is None else f", round-trip {'OK' if self.verified else 'FAILED'}")
        )


def run_experiments(
    dataset: str,
    nz: int,
    quantbits: int = 10,
    bitswap: bool = True,
    experiments: int = 100,
    ndatapoints: int = 100,
    params=None,
    table_dtype: str = "float32",
    data_dir: str = "data",
    out_dir: str = "plots",
    bitstream_dir: str = "bitstreams",
    verify: bool = False,
    seed: int = 100,
    save: bool = True,
    chunks: int = 1,
) -> ExperimentResult:
    """Run the full compression sweep for one (dataset, nz, scheme) config.

    chunks > 1 is the WIDE-LANE mode (VERDICT r4 #7): each experiment's
    ndatapoints are split into `chunks` contiguous segments riding
    `chunks * experiments` fresh lanes, so the device scan is
    ndatapoints/chunks steps over C*E lanes instead of ndatapoints steps
    over E lanes — ~chunks x faster on a weight-traffic-bound model, since
    each model pass amortizes its weight fetch over C*E lanes.  Segments of
    one experiment share no coder state, so per-datapoint net word counts
    concatenate exactly (mid-stream renormalization can differ by ±1 word
    at segment boundaries — measurement noise of ~0.003% per datapoint);
    the initial-bits / `restbits` accounting for `cma`/`total` comes from
    the chunk-0 lane alone, preserving the reference's sequential
    semantics (mnist_compress.py:254-263).  Stream pickles are saved per
    segment with a `_chunk{c}` suffix.
    """
    import jax
    import jax.numpy as jnp

    from bitswap_tpu.codec.bitswap import CodecConfig, make_codec
    from bitswap_tpu.codec.discretize import discretize_bins
    from bitswap_tpu.models import init_params, data_dependent_init
    from bitswap_tpu.models.vae import loss_per_sample
    from bitswap_tpu.train.data import load_dataset
    from bitswap_tpu.train.runtime import load_params
    from bitswap_tpu.utils.registry import get_spec
    from bitswap_tpu.ans.vectorized import (
        arrays_equal, lane_state_to_ref_lists, lane_states_equal)

    scheme = "bitswap" if bitswap else "bbans"
    spec = get_spec(dataset)
    cfg = spec.model_config(nz, dropout_p=0.0)

    test_data, synthetic = load_dataset(dataset, "test", cfg.xs, data_dir)
    train_data, _ = load_dataset(dataset, "train", cfg.xs, data_dir)

    if params is None:
        params = init_params(jax.random.PRNGKey(0), cfg)
        warm = jnp.asarray(train_data[:256].astype(np.float32))
        params = data_dependent_init(params, cfg, jax.random.PRNGKey(1), warm)
        ckpt = os.path.join("params", dataset, f"nz{nz}.msgpack")
        if os.path.exists(ckpt):
            params = load_params(ckpt, params)
            print(f"loaded checkpoint {ckpt}")
        else:
            print(f"no checkpoint at {ckpt}; using data-dependent init "
                  f"({'synthetic' if synthetic else 'real'} data)")

    bins = discretize_bins(
        params, cfg, quantbits, jax.random.PRNGKey(2), data=train_data,
        cache_path=os.path.join("bins", f"{dataset}_nz{nz}_qb{quantbits}.npz"),
    )

    # experiment index draw with the reference's seed discipline
    # (mnist_compress.py:131-137): one cached (experiments, ndatapoints) draw
    os.makedirs(os.path.join(bitstream_dir, dataset), exist_ok=True)
    idx_path = os.path.join(bitstream_dir, dataset, f"indices_{experiments}x{ndatapoints}.npy")
    if os.path.exists(idx_path):
        randindices = np.load(idx_path)
    else:
        rng = np.random.RandomState(seed)
        replace = experiments * ndatapoints > len(test_data)
        randindices = rng.choice(
            len(test_data), size=(experiments, ndatapoints), replace=replace
        )
        np.save(idx_path, randindices)

    # lanes: one per (chunk, experiment), lane l = c*E + e — chunk-0 lanes
    # (the sequential-semantics carriers for restbits/cma) are lanes [0, E)
    E, T, C = experiments, ndatapoints, chunks
    assert T % C == 0, f"ndatapoints {T} must divide into {C} chunks"
    Tc = T // C
    L = C * E
    xs = test_data[randindices]  # (E, T, H, W, ch)
    xs_flat = (
        xs.reshape((E, C, Tc) + xs.shape[2:])
        .transpose(2, 1, 0, 3, 4, 5)
        .reshape(Tc, L, cfg.xdim)
        .astype(np.int32)
    )

    ccfg = CodecConfig(
        model=cfg, quantbits=quantbits, bitswap=bitswap, table_dtype=table_dtype,
        init_words=10000,
        capacity=max(65536 if C == 1 else 0, 10000 + Tc * cfg.xdim + 4096),
    )
    codec = make_codec(params, ccfg, bins)
    state0 = codec.init_state(L, seed=seed)
    sp0 = np.asarray(state0.sp)  # (L,)

    t0 = time.time()
    xs_dev = jnp.asarray(xs_flat)
    sp_rest = np.asarray(codec.rest_sp(state0, xs_dev[0]))[:E]  # chunk-0 lanes
    state, sps = codec.encode_datapoints_with_counts(state0, xs_dev)
    jax.block_until_ready(state.buf)
    enc_t = time.time() - t0
    assert not np.any(np.asarray(state.overflow)), "stream buffer overflow"
    sps = np.asarray(sps)  # (Tc, L)

    # per-datapoint ELBO (the analytic optimum the codec should approach) —
    # one jitted scan + one host transfer (a per-datapoint dispatch/fetch
    # loop pays T round trips on tunneled backends)
    def _elbo_all(p, xs_all):
        # MC keys are indexed by the GLOBAL datapoint index c*Tc + u, so a
        # chunked run draws the exact same per-datapoint ELBO estimates as
        # the sequential run (each chunk group evaluates under its own key,
        # vmapped so the model pass still batches over all L lanes)
        K0 = jax.random.PRNGKey(0)

        def step(u, xt):
            xg = xt.reshape((C, E) + cfg.xs).astype(jnp.float32)
            keys = jax.vmap(lambda c: jax.random.fold_in(K0, c * Tc + u))(
                jnp.arange(C))
            out = jax.vmap(lambda k, xb: loss_per_sample(p, cfg, k, xb))(keys, xg)
            return u + 1, out.reshape(L)

        _, out = jax.lax.scan(step, 0, xs_all)
        return out  # (Tc, L)

    def _to_exp(arr_tl):  # (Tc, L=(C, E)) -> (E, T) in datapoint order
        return arr_tl.reshape(Tc, C, E).transpose(2, 1, 0).reshape(E, T)

    elbos = _to_exp(np.asarray(jax.jit(_elbo_all)(params, xs_dev)))

    # per-lane word deltas concatenate into per-experiment per-datapoint nets
    prev = np.concatenate([sp0[None, :], sps[:-1]], axis=0)  # (Tc, L)
    delta_words = _to_exp(sps - prev)  # (E, T)
    nets = delta_words * 32.0 / cfg.xdim
    t_idx = np.arange(1, ndatapoints + 1)[None, :]
    # cumulative totals: words added across all segments, plus the one-time
    # initial-bits offset from the chunk-0 lane's restbits snapshot
    total = (np.cumsum(delta_words, axis=1) + (sp0[:E] - sp_rest + 1)[:, None]) * 32.0
    cma = total / (cfg.xdim * t_idx)

    verified = None
    if verify:
        # the reference's receiver pass (mnist_compress.py:277-358): decode
        # everything back, compare datapoints, and check the bits-back
        # invariant state == initialstate.  Comparisons run ON DEVICE —
        # fetching the full buffers costs minutes on tunneled backends.
        t0 = time.time()
        state_back, decoded = codec.decode_datapoints(state, Tc)
        ok_data = bool(arrays_equal(decoded, xs_dev))
        ok_state = bool(np.all(np.asarray(lane_states_equal(state_back, state0))))
        verified = ok_data and ok_state
        print(f"receiver verification {'OK' if verified else 'FAILED'} "
              f"({time.time()-t0:.1f}s)")

    result = ExperimentResult(
        nets=nets, elbos=elbos, cma=cma, total=total,
        scheme=f"{'Bit-Swap' if bitswap else 'BB-ANS'} {dataset} nz={nz} qb={quantbits}",
        verified=verified,
    )
    mb = experiments * ndatapoints * cfg.xdim / 1e6
    print(f"encoded {experiments}x{ndatapoints} datapoints ({mb:.1f} MB) "
          f"in {enc_t:.1f}s = {mb/enc_t:.2f} MB/s")
    print(result.summary())

    if save:
        # reference-compatible artifact names (mnist_compress.py:363-366)
        d = os.path.join(out_dir, f"{dataset}{nz}")
        os.makedirs(d, exist_ok=True)
        # sidecar: was the data padded up to the model frame?  The plotting
        # tools rescale rates to the ORIGINAL dims only when true (reference
        # plots/cma.py:28-31; synthetic data is native-resolution)
        import json

        from bitswap_tpu.train.data import dataset_is_padded

        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump({
                "padded": dataset_is_padded(dataset, cfg.xs, data_dir),
                "synthetic": bool(synthetic),
                "experiments": experiments, "ndatapoints": ndatapoints,
            }, f)
        np.save(os.path.join(d, f"{scheme}_{quantbits}bits_nets"), nets)
        np.save(os.path.join(d, f"{scheme}_{quantbits}bits_elbos"), elbos)
        np.save(os.path.join(d, f"{scheme}_{quantbits}bits_cmas"), cma)
        np.save(os.path.join(d, f"{scheme}_{quantbits}bits_total"), total)
        # final states, one pickle per experiment lane (mnist_compress.py:
        # 265-267); wide-lane runs save one per (experiment, chunk) segment
        sdir = os.path.join(bitstream_dir, dataset, f"nz{nz}", scheme)
        os.makedirs(sdir, exist_ok=True)
        lists = lane_state_to_ref_lists(state)
        for l, lst in enumerate(lists):
            c, e = divmod(l, E)
            name = f"{scheme}_{quantbits}bits_nz{nz}_experiment{e+1}"
            if C > 1:
                name += f"_chunk{c}"
            with open(os.path.join(sdir, name), "wb") as f:
                pickle.dump(lst, f)
    return result
