"""Executed stream-level byte parity against the reference's own coding loop.

SURVEY.md §7 "Hard parts: bit-exactness".  This test runs the reference's
REAL sender/receiver loops (mnist_compress.py:158-205 / :277-358, with the
reference's own `ANS` class, `Model` compress-mode closures, float64
`logistic_cdf`, `ImageBins`, and `discretize()` bins) and our codec in
reference-parity mode (table_dtype="float64", symbol_order="nchw",
coder="tables", identical initial state) and asserts the final ANS states
are **byte-for-byte identical**, both schemes, and decode back on both
sides.

Cross-framework caveat, handled explicitly: the reference's compress-mode
model runs its convolutions in float32 (mnist_train.py:322-325), and
torch-CPU vs XLA-CPU float32 convolutions differ in the last few ulps
(~1e-6; see tests/test_import.py's 2e-5 forward-parity tolerance), which is
enough to flip quantized table entries.  Byte parity of the *coding stack*
is therefore proven by recording the (mu, scale) vectors the reference
model emits at every coding op and injecting them into our codec's model
bridge, while asserting at every op that the `given` inputs our driver
would have fed the model are bit-identical to the reference's — i.e. the
two implementations traverse identical trajectories and everything except
the conv arithmetic (bin construction, float64 CDF evaluation, edge-bin pmf
assembly, integer quantization, the rANS state machine, the Bit-Swap /
BB-ANS interleave order, and state serialization) is executed independently
on both sides and must agree exactly.  Model-forward parity itself is
covered by tests/test_import.py.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from bitswap_tpu.codec.bitswap import Codec, CodecConfig
from bitswap_tpu.codec.discretize import DiscretizationBins
from bitswap_tpu.ans.vectorized import (
    lane_state_from_ref_lists,
    lane_state_to_ref_lists,
)
from bitswap_tpu.models.vae import VAEConfig

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "utils")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

# the reference imports torchvision (datasets for real downloads, transforms
# for pipelines); neither is installed nor usable in this zero-egress
# environment, so satisfy the import with inert stubs — the test injects its
# own synthetic dataset at the discretize() seam below
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")

    class _NoOp:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv.datasets = types.SimpleNamespace(MNIST=None, CIFAR10=None)
    tv.transforms = types.SimpleNamespace(Compose=_NoOp, Pad=_NoOp, ToTensor=_NoOp)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets  # type: ignore[assignment]
    sys.modules["torchvision.transforms"] = tv.transforms  # type: ignore[assignment]

import utils.torch.modules as ref_modules  # noqa: E402  (reference, read-only)
import utils.torch.rand as ref_rand  # noqa: E402
import discretization as ref_disc  # noqa: E402
import model.mnist_train as ref_train  # noqa: E402
import mnist_compress as ref_compress  # noqa: E402

# tiny reference-architecture config (keeps the per-symbol python ANS loop
# and the CPU discretization sampling fast)
NZ = 2
QB = 7  # latent quantbits; pixels always code at 8 (mnist_compress.py:203)
RW = 8
ZDIM = 1 * 16 * 16
XDIM = 1 * 32 * 32
T = 3  # datapoints per stream
INIT_WORDS = 400
CFG = VAEConfig(xs=(32, 32, 1), nz=NZ, zchannels=1, nprocessing=1,
                kernel_size=3, resdepth=2, reswidth=RW)
ANSBITS = 31


def _synthetic_uint8(n, seed):
    from bitswap_tpu.train.data import synthetic_images

    return synthetic_images(n, (32, 32, 1), seed)


@pytest.fixture(scope="module")
def ref_model():
    """The reference's real Model, data-dependent-initialized on synthetic
    data (the reference warmup under init_mode, mnist_train.py:557-599)."""
    torch.manual_seed(50)
    model = ref_train.Model(xs=(1, 32, 32), nz=NZ, zchannels=1, nprocessing=1,
                            kernel_size=3, resdepth=2, reswidth=RW,
                            root_process=False)
    data = _synthetic_uint8(64, seed=7).transpose(0, 3, 1, 2)  # NCHW
    x = torch.from_numpy(data.astype(np.float32))
    with torch.no_grad(), ref_modules.init_mode():
        model.loss(x)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ref_bins(ref_model, tmp_path_factory):
    """Bins from the reference's own discretize() (discretization.py:9-99),
    with the torchvision dataset seam replaced by synthetic data."""
    from torch.utils.data import TensorDataset

    data = _synthetic_uint8(256, seed=11).transpose(0, 3, 1, 2)
    imgs = torch.from_numpy(data.astype(np.float32))
    labels = torch.zeros(len(imgs), dtype=torch.long)
    ds = TensorDataset(imgs, labels)

    saved_ds, saved_tr = ref_disc.datasets, ref_disc.transforms
    ref_disc.datasets = types.SimpleNamespace(MNIST=lambda **kw: ds)
    ref_disc.transforms = types.SimpleNamespace(
        Compose=lambda ops: None, Pad=lambda p: None, ToTensor=lambda: None)
    cwd = os.getcwd()
    workdir = tmp_path_factory.mktemp("refbins")
    os.makedirs(workdir / "bins", exist_ok=True)
    os.chdir(workdir)
    try:
        torch.manual_seed(50)
        zendpoints, zcentres = ref_disc.discretize(
            NZ, QB, torch.float64, "cpu", ref_model, "mnist")
    finally:
        os.chdir(cwd)
        ref_disc.datasets, ref_disc.transforms = saved_ds, saved_tr
    return zendpoints, zcentres


@pytest.fixture(scope="module")
def datapoints():
    imgs = _synthetic_uint8(T, seed=23)  # (T, 32, 32, 1) uint8
    # single channel: NCHW and NHWC flatten agree; keep int64 for torch
    return imgs.reshape(T, XDIM).astype(np.int64)


def _edge_pmfs(cdfs):
    """pmf assembly with outer edge bins (mnist_compress.py:183-185)."""
    pmfs = cdfs[:, 1:] - cdfs[:, :-1]
    return torch.cat(
        (cdfs[:, 0].unsqueeze(1), pmfs, 1.0 - cdfs[:, -1].unsqueeze(1)), dim=1)


def _initial_state():
    """mnist_compress.py:158-159 at INIT_WORDS words."""
    rng = np.random.RandomState(100)
    state = list(map(int, rng.randint(low=1 << 16, high=(1 << 32) - 1,
                                      size=INIT_WORDS, dtype=np.uint32)))
    state[-1] = state[-1] << 32
    return state


def _run_reference_sender(model, zendpoints, zcentres, xs, bitswap):
    """The reference sender loop, transcribed from mnist_compress.py:158-251
    with the reference's own ANS/model/rand, recording every model-closure
    call as (kind, zi, given, mu, scale)."""
    ANS = ref_compress.ANS
    dtype = torch.float64
    zrange = torch.arange(ZDIM)
    xrange = torch.arange(XDIM)
    xbins = ref_rand.ImageBins(dtype, "cpu", XDIM)
    xendpoints, xcentres = xbins.endpoints(), xbins.centres()
    model.compress()
    feed = []

    def infer(zi, given):
        with torch.no_grad():
            mu, scale = model.infer(zi)(given=given)
        feed.append(("infer", zi, given.numpy().copy(),
                     mu.numpy().copy(), scale.numpy().copy()))
        return mu, scale

    def generate(zi, given):
        with torch.no_grad():
            mu, scale = model.generate(zi)(given=given)
        feed.append(("generate", zi, given.numpy().copy(),
                     mu.numpy().copy(), scale.numpy().copy()))
        return mu, scale

    state = _initial_state()
    for xi in range(len(xs)):
        x = torch.from_numpy(xs[xi])
        if bitswap:  # mnist_compress.py:179-205
            zsym = None
            for zi in range(NZ):
                input = (zcentres[zi - 1, zrange, zsym] if zi > 0
                         else xcentres[xrange, x])
                mu, scale = infer(zi, input)
                cdfs = ref_rand.logistic_cdf(zendpoints[zi].t(), mu, scale).t()
                state, zsymtop = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                                     quantbits=QB).decode(state)
                z = zcentres[zi, zrange, zsymtop]
                mu, scale = generate(zi, z)
                cdfs = ref_rand.logistic_cdf(
                    (zendpoints[zi - 1] if zi > 0 else xendpoints).t(),
                    mu, scale).t()
                state = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                            quantbits=(QB if zi > 0 else 8)).encode(
                                state, zsym if zi > 0 else x)
                zsym = zsymtop
        else:  # BB-ANS, mnist_compress.py:209-243
            zs = []
            zsym = None
            for zi in range(NZ):
                input = (zcentres[zi - 1, zrange, zsym] if zi > 0
                         else xcentres[xrange, x])
                mu, scale = infer(zi, input)
                cdfs = ref_rand.logistic_cdf(zendpoints[zi].t(), mu, scale).t()
                state, zsymtop = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                                     quantbits=QB).decode(state)
                zs.append(zsymtop)
                zsym = zsymtop
            for zi in range(NZ):
                zsymtop = zs.pop(0)
                z = zcentres[zi, zrange, zsymtop]
                mu, scale = generate(zi, z)
                cdfs = ref_rand.logistic_cdf(
                    (zendpoints[zi - 1] if zi > 0 else xendpoints).t(),
                    mu, scale).t()
                state = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                            quantbits=(QB if zi > 0 else 8)).encode(
                                state, zsym if zi > 0 else x)
                zsym = zsymtop
            assert zs == []
        # prior encode (mnist_compress.py:246-251)
        cdfs = ref_rand.logistic_cdf(
            zendpoints[-1].t(), torch.zeros(1, dtype=dtype),
            torch.ones(1, dtype=dtype)).t()
        state = ANS(_edge_pmfs(cdfs), bits=ANSBITS, quantbits=QB).encode(
            state, zsymtop)
    return state, feed


def _run_reference_receiver(model, zendpoints, zcentres, state, xs, bitswap):
    """The reference receiver loop (mnist_compress.py:277-358), recording
    model-closure calls the same way."""
    ANS = ref_compress.ANS
    dtype = torch.float64
    zrange = torch.arange(ZDIM)
    xrange = torch.arange(XDIM)
    xbins = ref_rand.ImageBins(dtype, "cpu", XDIM)
    xendpoints, xcentres = xbins.endpoints(), xbins.centres()
    model.compress()
    state = list(state)
    feed = []

    def infer(zi, given):
        with torch.no_grad():
            mu, scale = model.infer(zi)(given=given)
        feed.append(("infer", zi, given.numpy().copy(),
                     mu.numpy().copy(), scale.numpy().copy()))
        return mu, scale

    def generate(zi, given):
        with torch.no_grad():
            mu, scale = model.generate(zi)(given=given)
        feed.append(("generate", zi, given.numpy().copy(),
                     mu.numpy().copy(), scale.numpy().copy()))
        return mu, scale

    decoded = []
    for xi in reversed(range(len(xs))):
        x = torch.from_numpy(xs[xi])
        cdfs = ref_rand.logistic_cdf(
            zendpoints[-1].t(), torch.zeros(1, dtype=dtype),
            torch.ones(1, dtype=dtype)).t()
        state, zsymtop = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                             quantbits=QB).decode(state)
        if bitswap:  # mnist_compress.py:296-319
            for zi in reversed(range(NZ)):
                z = zcentres[zi, zrange, zsymtop]
                mu, scale = generate(zi, z)
                cdfs = ref_rand.logistic_cdf(
                    (zendpoints[zi - 1] if zi > 0 else xendpoints).t(),
                    mu, scale).t()
                state, sym = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                                 quantbits=QB if zi > 0 else 8).decode(state)
                input = (zcentres[zi - 1, zrange, sym] if zi > 0
                         else xcentres[xrange, sym])
                mu, scale = infer(zi, input)
                cdfs = ref_rand.logistic_cdf(zendpoints[zi].t(), mu, scale).t()
                state = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                            quantbits=QB).encode(state, zsymtop)
                zsymtop = sym
            assert torch.all(x == zsymtop), "decoded datapoint mismatch"
            decoded.append(zsymtop.numpy().copy())
        else:  # mnist_compress.py:323-356
            zs = [zsymtop]
            for zi in reversed(range(NZ)):
                z = zcentres[zi, zrange, zsymtop]
                mu, scale = generate(zi, z)
                cdfs = ref_rand.logistic_cdf(
                    (zendpoints[zi - 1] if zi > 0 else xendpoints).t(),
                    mu, scale).t()
                state, sym = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                                 quantbits=QB if zi > 0 else 8).decode(state)
                zs.append(sym)
                zsymtop = sym
            zsymtop = zs.pop(0)
            for zi in reversed(range(NZ)):
                sym = zs.pop(0) if zi > 0 else zs[0]
                input = (zcentres[zi - 1, zrange, sym] if zi > 0
                         else xcentres[xrange, sym])
                mu, scale = infer(zi, input)
                cdfs = ref_rand.logistic_cdf(zendpoints[zi].t(), mu, scale).t()
                state = ANS(_edge_pmfs(cdfs), bits=ANSBITS,
                            quantbits=QB).encode(state, zsymtop)
                zsymtop = sym
            assert torch.all(x == zs[0]), "decoded datapoint mismatch"
            decoded.append(zs[0].numpy().copy())
    return state, feed, decoded[::-1]


class _InjectedCodec(Codec):
    """Codec whose model bridge replays a recorded (mu, scale) feed while
    asserting the `given` trajectory is bit-identical to the reference's."""

    def set_feed(self, feed):
        self._feed = list(feed)
        self._cursor = 0

    def _next(self, kind, zi, given_flat):
        assert self._cursor < len(self._feed), "feed exhausted"
        fkind, fzi, fgiven, mu, scale = self._feed[self._cursor]
        self._cursor += 1
        assert (fkind, fzi) == (kind, zi), (
            f"op order diverged at {self._cursor - 1}: "
            f"ours {(kind, zi)} vs reference {(fkind, fzi)}")
        ours = np.asarray(given_flat, np.float64)[0]
        np.testing.assert_array_equal(ours, fgiven, err_msg=(
            f"`given` diverged at op {self._cursor - 1} ({kind} z{zi})"))
        return (jnp.asarray(mu, jnp.float64)[None],
                jnp.asarray(scale, jnp.float64)[None])

    def _mu_scale(self, direction, zi, sym_in):
        # mirror the production hook's gather so the recorded-feed check
        # still sees the `given` VALUES the model would have received
        in_is_x, cin = self._op_kinds(direction, zi)[:2]
        if in_is_x:
            given = cin[sym_in]
        else:
            given = cin[jnp.arange(cin.shape[0])[None, :], sym_in]
        return self._next(direction, zi, given)


def _our_codec(ref_bins, bitswap):
    zendpoints, zcentres = ref_bins
    bins = DiscretizationBins(
        zendpoints=np.asarray(zendpoints.numpy(), np.float64),
        zcentres=np.asarray(zcentres.numpy(), np.float64),
        order="nchw",
    )
    ccfg = CodecConfig(model=CFG, quantbits=QB, bitswap=bitswap,
                       table_dtype="float64", symbol_order="nchw",
                       coder="tables", init_words=INIT_WORDS, capacity=4096)
    return _InjectedCodec(None, ccfg, bins)


@pytest.mark.parametrize("bitswap", [True, False], ids=["bitswap", "bbans"])
def test_stream_byte_parity(ref_model, ref_bins, datapoints, bitswap):
    zendpoints, zcentres = ref_bins

    # --- reference encode (its own ANS + model + float64 cdf math) ---------
    ref_state, feed = _run_reference_sender(
        ref_model, zendpoints, zcentres, datapoints, bitswap)

    # --- our encode, same initial state, replaying the recorded model ------
    codec = _our_codec(ref_bins, bitswap)
    codec.set_feed(feed)
    st = codec.init_state(1, seed=100)
    np.testing.assert_array_equal(
        np.asarray(lane_state_to_ref_lists(st)[0], dtype=object),
        np.asarray(_initial_state(), dtype=object))
    xs = jnp.asarray(datapoints.astype(np.int32))[:, None, :]  # (T, 1, xdim)
    for t in range(T):
        st, _ = codec._encode_one(st, xs[t], st.sp)
    assert codec._cursor == len(feed), "our driver made fewer model calls"
    assert not bool(np.asarray(st.overflow).any())

    ours = lane_state_to_ref_lists(st)[0]
    assert len(ours) == len(ref_state), (
        f"stream length differs: ours {len(ours)} words, "
        f"reference {len(ref_state)}")
    assert ours == ref_state, "encoded streams are not byte-identical"

    # --- our decoder consumes the REFERENCE's stream -----------------------
    rec_state, rfeed, rdecoded = _run_reference_receiver(
        ref_model, zendpoints, zcentres, ref_state, datapoints, bitswap)
    assert rec_state == _initial_state(), "reference receiver bits-back failed"
    np.testing.assert_array_equal(np.stack(rdecoded), datapoints)

    dcodec = _our_codec(ref_bins, bitswap)
    dcodec.set_feed(rfeed)
    dst = lane_state_from_ref_lists([list(ref_state)], capacity=4096)
    out = []
    for _ in range(T):
        dst, x, _ = dcodec._decode_one(dst, dst.sp)
        out.append(np.asarray(x)[0])
    assert dcodec._cursor == len(rfeed)
    np.testing.assert_array_equal(np.stack(out[::-1]), datapoints)
    # bits-back invariant: final state equals the initial state byte-for-byte
    assert lane_state_to_ref_lists(dst)[0] == _initial_state(), (
        "our receiver did not restore the initial state")
