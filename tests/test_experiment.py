"""The flagship experiment driver (codec/experiment.py) and codec CLI.

Covers the reference metric semantics (mnist_compress.py:254-263) at small
scale: nets derived from stack-pointer deltas, cma anchored at the restbits
snapshot, reference-compatible artifact naming, cached index draws, and the
verify (receiver) path — for both Bit-Swap and BB-ANS.
"""

import os
import pickle

import numpy as np
import pytest

from bitswap_tpu.models.vae import VAEConfig
from bitswap_tpu.utils import registry


class _TinySpec:
    """Duck-typed DatasetSpec: CPU-sized model for driver tests."""

    name = "tiny"
    xs = (32, 32, 1)
    default_nz = 2
    lr_decay_after = 0

    def model_config(self, nz, dropout_p=None):
        return VAEConfig(
            xs=self.xs, nz=nz, zchannels=1, nprocessing=1,
            kernel_size=3, resdepth=2, reswidth=8, dropout_p=0.0,
        )


@pytest.fixture()
def tiny_dataset(monkeypatch, tmp_path):
    monkeypatch.setitem(registry.DATASETS, "tiny", _TinySpec())
    monkeypatch.chdir(tmp_path)  # bins/, params/, plots/, bitstreams/ land here
    return tmp_path


E, T, QB, NZ = 4, 6, 5, 2


def _run(**kw):
    from bitswap_tpu.codec.experiment import run_experiments

    args = dict(
        dataset="tiny", nz=NZ, quantbits=QB, experiments=E, ndatapoints=T,
        verify=True, save=True,
    )
    args.update(kw)
    return run_experiments(**args)


class TestRunExperiments:
    def test_bitswap_sweep_metrics_and_artifacts(self, tiny_dataset):
        res = _run(bitswap=True)

        # shapes + the receiver's round-trip/bits-back verification
        for arr in (res.nets, res.elbos, res.cma, res.total):
            assert arr.shape == (E, T)
        assert res.verified is True

        # metric semantics: total is cumulative net bits measured from the
        # restbits snapshot, so cma * (xdim * t) == total elementwise
        # (mnist_compress.py:258-260)
        xdim = 32 * 32
        t_idx = np.arange(1, T + 1)[None, :]
        np.testing.assert_allclose(res.cma * (xdim * t_idx), res.total, rtol=1e-12)
        # nets are per-datapoint deltas: cumulative sums differ from total
        # only by the constant restbits offset per lane
        csum = np.cumsum(res.nets * xdim, axis=1)
        offsets = res.total - csum
        np.testing.assert_allclose(offsets, offsets[:, :1] * np.ones((1, T)), atol=1e-9)
        # with init-only weights the coder must still be near the ELBO
        assert np.all(np.abs(res.nets.mean(1) - res.elbos.mean(1)) < 0.2)

        # reference-compatible artifacts (mnist_compress.py:363-366)
        d = os.path.join("plots", f"tiny{NZ}")
        for name in ("nets", "elbos", "cmas", "total"):
            path = os.path.join(d, f"bitswap_{QB}bits_{name}.npy")
            assert os.path.exists(path), path
        np.testing.assert_array_equal(np.load(os.path.join(d, f"bitswap_{QB}bits_nets.npy")), res.nets)

        # per-experiment final-state pickles (mnist_compress.py:265-267)
        sdir = os.path.join("bitstreams", "tiny", f"nz{NZ}", "bitswap")
        states = sorted(os.listdir(sdir))
        assert len(states) == E
        with open(os.path.join(sdir, states[0]), "rb") as f:
            lst = pickle.load(f)
        assert isinstance(lst, list) and all(isinstance(w, int) for w in lst)
        assert lst[-1] >= 1 << 32  # head in [2**32, 2**64)

        # index draw is cached and reused verbatim
        idx_path = os.path.join("bitstreams", "tiny", f"indices_{E}x{T}.npy")
        assert os.path.exists(idx_path)
        first = np.load(idx_path)
        _run(bitswap=False, verify=False, save=False)
        np.testing.assert_array_equal(np.load(idx_path), first)

    @pytest.mark.parametrize("bitswap", [True, False], ids=["bitswap", "bbans"])
    def test_chunked_lanes_match_sequential(self, tiny_dataset, bitswap):
        # wide-lane mode (chunks>1): same experiments ride C*E fresh lanes;
        # receiver-verified, and the reconstructed metrics agree with the
        # sequential run up to segment-boundary renormalization noise
        # (±1 word per segment boundary)
        seq = _run(bitswap=bitswap)
        chk = _run(bitswap=bitswap, chunks=3)
        assert chk.verified is True
        for arr in (chk.nets, chk.elbos, chk.cma, chk.total):
            assert arr.shape == (E, T)
        # elbos are coding-independent: identical
        np.testing.assert_allclose(chk.elbos, seq.elbos, rtol=1e-6)
        # nets agree to within a few 32-bit words per datapoint (fresh-lane
        # heads shift the renormalization pattern slightly within a segment)
        xdim = 32 * 32
        assert np.max(np.abs(chk.nets - seq.nets)) * xdim / 32.0 <= 3.0 + 1e-9
        # means agree to well under a word per datapoint (the headline
        # numbers; at real sweep scale T=100 this noise is ~0.0005 b/d)
        word_bpd = 32.0 / xdim
        assert abs(chk.nets.mean() - seq.nets.mean()) < 0.5 * word_bpd
        assert abs(chk.cma[:, -1].mean() - seq.cma[:, -1].mean()) < 1.0 * word_bpd
        # per-segment stream pickles
        scheme = "bitswap" if bitswap else "bbans"
        sdir = os.path.join("bitstreams", "tiny", f"nz{NZ}", scheme)
        chunked = [p for p in os.listdir(sdir) if "_chunk" in p]
        assert len(chunked) == E * 3

    def test_bbans_sweep_verifies(self, tiny_dataset):
        res = _run(bitswap=False)
        assert res.verified is True
        assert os.path.exists(os.path.join("plots", f"tiny{NZ}", f"bbans_{QB}bits_nets.npy"))
        # BB-ANS needs more initial bits than Bit-Swap at nz>1 but identical
        # metric plumbing
        assert np.all(res.total > 0)


class TestCodecCLI:
    def test_cli_smoke(self, tiny_dataset):
        from bitswap_tpu.codec.cli import main

        rc = main([
            "--dataset", "tiny", "--nz", str(NZ), "--quantbits", str(QB),
            "--experiments", "2", "--ndatapoints", "3", "--verify",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join("plots", f"tiny{NZ}", f"bitswap_{QB}bits_nets.npy"))
