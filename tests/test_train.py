"""Training runtime tests: the loss goes down, EMA/schedule/clip semantics,
checkpoint round-trip, and the data-parallel step on the virtual mesh."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitswap_tpu.models import VAEConfig, init_params, data_dependent_init
from bitswap_tpu.train.runtime import (
    TrainConfig,
    init_train_state,
    make_train_step,
    make_eval_step,
    lr_at_step,
    save_checkpoint,
    load_checkpoint,
)
from bitswap_tpu.train.data import synthetic_images, batch_iterator
from bitswap_tpu.parallel.mesh import data_mesh, make_dp_train_step, shard_lane_state

CFG = VAEConfig(xs=(32, 32, 1), nz=2, zchannels=1, nprocessing=1, resdepth=2, reswidth=8)


@pytest.fixture(scope="module")
def setup():
    data = synthetic_images(256, CFG.xs, seed=0)
    params = init_params(jax.random.PRNGKey(0), CFG)
    warm = jnp.asarray(data[:64].astype(np.float32))
    params = data_dependent_init(params, CFG, jax.random.PRNGKey(1), warm)
    return params, data


class TestSchedule:
    def test_lr_decay_to_floor(self):
        t = TrainConfig(lr=2e-3, lr_decay=0.99, min_lr=5e-4)
        assert float(lr_at_step(t, 0)) == pytest.approx(2e-3)
        assert float(lr_at_step(t, 50)) == pytest.approx(2e-3 * 0.99**50, rel=1e-6)
        assert float(lr_at_step(t, 100000)) == pytest.approx(5e-4)

    def test_decay_after(self):
        t = TrainConfig(lr=2e-3, lr_decay=0.99, min_lr=5e-4, lr_decay_after=100)
        assert float(lr_at_step(t, 100)) == pytest.approx(2e-3)
        assert float(lr_at_step(t, 110)) == pytest.approx(2e-3 * 0.99**10, rel=1e-6)


class TestTrainStep:
    def test_loss_decreases(self, setup):
        params, data = setup
        tcfg = TrainConfig(lr=1e-3, lr_decay=1.0)
        state = init_train_state(params, tcfg)
        step = make_train_step(CFG, tcfg)
        losses = []
        key = jax.random.PRNGKey(42)
        for epoch in range(3):
            for batch in batch_iterator(data, 64, key_seed=epoch):
                key, k = jax.random.split(key)
                state, metrics = step(state, k, jnp.asarray(batch))
                losses.append(float(metrics["elbo"]))
        # first-epoch mean vs last-epoch mean must improve
        assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 0.05
        assert int(state.step) == len(losses)

    def test_ema_semantics(self, setup):
        params, data = setup
        tcfg = TrainConfig(ema_on_param=0.999)
        state = init_train_state(params, tcfg)
        step = make_train_step(CFG, tcfg)
        batch = jnp.asarray(data[:32].astype(np.float32))
        leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
        # snapshot before the step: the jitted step donates its state arg
        old_shadow = np.asarray(leaf(state.ema_params))
        new_state, _ = step(state, jax.random.PRNGKey(0), batch)
        # shadow = mu*new_param + (1-mu)*old_shadow (modules.py:151-155)
        want = 0.999 * np.asarray(leaf(new_state.params)) + 0.001 * old_shadow
        np.testing.assert_allclose(np.asarray(leaf(new_state.ema_params)), want, rtol=2e-5, atol=1e-7)

    def test_eval_step_runs(self, setup):
        params, data = setup
        ev = make_eval_step(CFG)
        out = ev(params, jax.random.PRNGKey(0), jnp.asarray(data[:16].astype(np.float32)))
        assert np.isfinite(float(out["elbo"]))
        assert out["kl_per_layer"].shape == (CFG.nz,)

    def test_checkpoint_roundtrip(self, setup):
        params, _ = setup
        tcfg = TrainConfig()
        state = init_train_state(params, tcfg)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt.msgpack")
            save_checkpoint(p, state)
            template = init_train_state(params, tcfg)
            loaded = load_checkpoint(p, template)
        for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDataParallel:
    def test_dp_step_matches_single_device(self, setup):
        params, data = setup
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        tcfg = TrainConfig(lr=1e-3)
        mesh = data_mesh(8)
        step, prep_state, prep_batch = make_dp_train_step(CFG, tcfg, mesh)
        batch = jnp.asarray(data[:64].astype(np.float32))

        s_single = init_train_state(params, tcfg)
        single_step = make_train_step(CFG, tcfg)
        s1, m1 = single_step(s_single, jax.random.PRNGKey(3), batch)

        s_dp = prep_state(init_train_state(params, tcfg))
        s2, m2 = step(s_dp, jax.random.PRNGKey(3), prep_batch(batch))
        # same math, just sharded: losses agree to float tolerance
        assert float(m1["elbo"]) == pytest.approx(float(m2["elbo"]), rel=1e-4)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l2 = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5)

    def test_dp_step_compressed_allreduce(self, setup):
        # the reference's Horovod fp16-compression parity
        # (mnist_train.py:940-943): grads psum in bf16 under shard_map —
        # one step must land close to the exact-f32 DP step, and the
        # compiled HLO must carry the all-reduce in the compressed dtype
        params, data = setup
        tcfg = TrainConfig(lr=1e-3)
        mesh = data_mesh(8)
        batch = jnp.asarray(data[:64].astype(np.float32))

        step_ex, prep_state, prep_batch = make_dp_train_step(CFG, tcfg, mesh)
        s_ex, m_ex = step_ex(prep_state(init_train_state(params, tcfg)),
                             jax.random.PRNGKey(3), prep_batch(batch))

        step_c, prep_state_c, prep_batch_c = make_dp_train_step(
            CFG, tcfg, mesh, grad_compress="bfloat16")
        s_c, m_c = step_c(prep_state_c(init_train_state(params, tcfg)),
                          jax.random.PRNGKey(3), prep_batch_c(batch))

        # same objective, compressed reduction: loss identical pre-update,
        # updated params close (bf16 has ~3 decimal digits)
        assert float(m_c["elbo"]) == pytest.approx(float(m_ex["elbo"]), rel=2e-3)
        for a, b in zip(jax.tree_util.tree_leaves(s_ex.params),
                        jax.tree_util.tree_leaves(s_c.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

        # the lowered IR carries the cross-replica reduction in bf16 (the
        # CPU backend may convert during optimization, so check StableHLO,
        # where the emitted collective dtype is what a TPU backend executes)
        txt = step_c.lower(
            prep_state_c(init_train_state(params, tcfg)),
            jax.random.PRNGKey(3), prep_batch_c(batch),
        ).as_text()
        lines = txt.splitlines()
        bf16_reduces = [
            i for i, ln in enumerate(lines)
            if "all_reduce" in ln and "bf16" in "\n".join(lines[i:i + 6])
        ]
        assert bf16_reduces, "no bf16 all_reduce in lowered IR"

    def test_sharded_lane_codec_roundtrip(self, setup):
        # lanes sharded over 8 devices: the coder runs SPMD with no
        # cross-lane communication, and the result is identical
        from bitswap_tpu.ans.vectorized import (
            init_lane_state,
            ans_encode_lanes,
            ans_decode_lanes,
            lane_state_to_ref_lists,
        )
        from bitswap_tpu.ans.tables import quantize_pmfs

        rng = np.random.default_rng(0)
        L, seq, support = 8, 32, 64
        pmfs = rng.gamma(0.5, 1.0, size=(L, seq, support))
        pmfs /= pmfs.sum(-1, keepdims=True)
        cdf = quantize_pmfs(jnp.asarray(pmfs, jnp.float64), 6).cdf
        syms = jnp.asarray(rng.integers(0, support, size=(L, seq)), jnp.int32)

        state = init_lane_state(L, capacity=1024, init_words=64)
        want = lane_state_to_ref_lists(ans_encode_lanes(state, cdf, syms))

        mesh = data_mesh(8)
        state_sharded = shard_lane_state(mesh, init_lane_state(L, capacity=1024, init_words=64))
        got_state = ans_encode_lanes(state_sharded, cdf, syms)
        assert lane_state_to_ref_lists(got_state) == want
        _, decoded = ans_decode_lanes(got_state, cdf)
        np.testing.assert_array_equal(np.asarray(decoded), np.asarray(syms))
