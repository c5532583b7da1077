"""Import reference (fhkingma/bitswap) PyTorch checkpoints into our pytree.

The reference distributes trained `state_dict`s and discretization bins as
torch pickles (README.md:123-135, loaded at mnist_compress.py:108-117).
This module converts them to the TPU framework's parameter pytree so
reference-trained *rates* are reproducible without retraining.

Mapping rules (reference module tree, model/mnist_train.py:85-308):

- Every WnConv2d contributes `{prefix}.v (O, I, kh, kw)`, `{prefix}.gain
  (O,)`, `{prefix}.b (O,)` (utils/torch/modules.py:64-66).  Ours stores v in
  HWIO — transpose (2, 3, 1, 0); gain and b map verbatim (identical
  parameterization: the reference defaults to loggain=True everywhere except
  ResNet conv2, modules.py:58,227, matching models/wnconv.py usage).
- Sequential/ModuleList indices appear in the key path; ResNetBlock children
  are named `res{inchannels}layer{j}` (modules.py:244-250).
- `gen_std` is a raw (C, H, W) parameter (mnist_train.py:306-308) ->
  transpose to (H, W, C); the imagenetcrop variant instead has
  `gen_std.0.{v,gain,b}` (a conv head, imagenetcrop_train.py:306-315).

Byte-level stream parity additionally needs the reference's *bins* (the
cached `bins/*.pt` tables), float64 coder tables (`table_dtype="float64"`),
the NCHW symbol order (`CodecConfig.symbol_order="nchw"`), and the
reference's exact initial state.  Executed stream-level byte parity against
the reference's own coding loop (its `ANS` class, `Model` compress-mode
closures, and `discretize()` bins) is proven in
tests/test_stream_parity.py; the module mapping itself is unit-tested
against the reference's own torch modules in tests/test_import.py.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from bitswap_tpu.models.resnet import ResNetLayerParams
from bitswap_tpu.models.vae import VAEConfig
from bitswap_tpu.models.wnconv import WnConvParams


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {key: numpy} dict."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):  # a full Module was pickled
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> WnConvParams:
    """One WnConv2d: OIHW v -> HWIO, gain/b verbatim."""
    import jax.numpy as jnp

    v = np.asarray(sd[f"{prefix}.v"], np.float32)
    assert v.ndim == 4, (prefix, v.shape)
    return WnConvParams(
        v=jnp.asarray(v.transpose(2, 3, 1, 0)),
        gain=jnp.asarray(np.asarray(sd[f"{prefix}.gain"], np.float32)),
        b=jnp.asarray(np.asarray(sd[f"{prefix}.b"], np.float32)),
    )


def _resnet_block(sd, prefix: str, channels: int, nlayers: int):
    """ResNetBlock: children `res{channels}layer{j}` each with conv1/conv2
    (modules.py:244-250)."""
    return [
        ResNetLayerParams(
            conv1=_conv(sd, f"{prefix}.res{channels}layer{j}.conv1"),
            conv2=_conv(sd, f"{prefix}.res{channels}layer{j}.conv2"),
        )
        for j in range(1, nlayers + 1)
    ]


def import_state_dict(sd: Mapping[str, np.ndarray], cfg: VAEConfig) -> Dict[str, Any]:
    """Reference state_dict (flat numpy mapping) -> our parameter pytree.

    Accepts the exact module tree of model/{mnist,cifar,imagenet,
    imagenetcrop}_train.py; raises KeyError on missing keys so silent
    partial imports are impossible.
    """
    import jax.numpy as jnp

    rw, rd = cfg.reswidth, cfg.resdepths
    params: Dict[str, Any] = {}
    params["infer_in"] = _conv(sd, "infer_in.1")  # Sequential(Squeeze2d, conv, act)
    params["infer_res0"] = _resnet_block(sd, "infer_res0.0", rw, cfg.nprocessing)
    params["infer_res1"] = _resnet_block(sd, "infer_res1.0", rw, rd[0])
    params["infer_mu"] = _conv(sd, "infer_mu")
    params["infer_std"] = _conv(sd, "infer_std")

    params["deepinfer"] = [
        {
            "in": _conv(sd, f"deepinfer_in.{i}.0"),
            "res": _resnet_block(sd, f"deepinfer_res.{i}.0", rw, rd[i + 1]),
            "mu": _conv(sd, f"deepinfer_mu.{i}.0"),
            "std": _conv(sd, f"deepinfer_std.{i}.0"),
        }
        for i in range(cfg.nz - 1)
    ]
    params["deepgen"] = [
        {
            "in": _conv(sd, f"deepgen_in.{i}.0"),
            "res": _resnet_block(sd, f"deepgen_res.{i}.0", rw, rd[i + 1]),
            "mu": _conv(sd, f"deepgen_mu.{i}.0"),
            "std": _conv(sd, f"deepgen_std.{i}.0"),
        }
        for i in range(cfg.nz - 1)
    ]

    params["gen_in"] = _conv(sd, "gen_in.0")
    params["gen_res1"] = _resnet_block(sd, "gen_res1.0", rw, rd[0])
    params["gen_res0"] = _resnet_block(sd, "gen_res0.0", rw, cfg.nprocessing)
    params["gen_mu"] = _conv(sd, "gen_mu.0")
    if cfg.conditional_bottom_scale:
        params["gen_std"] = _conv(sd, "gen_std.0")
    else:
        g = np.asarray(sd["gen_std"], np.float32)  # (C, H, W)
        params["gen_std"] = jnp.asarray(g.transpose(1, 2, 0))
    return params


def import_reference_bins(path: str, quantbits: int):
    """Reference bins cache (`bins/{ds}_nz{nz}_zendpoints{b}.pt` +
    `zcentres{b}.pt`, discretization.py:90-96) -> DiscretizationBins.

    `path` is the endpoints file; the centres file is derived by name.
    Shapes are (nz, zdim, 2**b - 1) / (nz, zdim, 2**b) with zdim flattened
    in the reference's NCHW order — use CodecConfig.symbol_order="nchw" so
    symbol positions line up.
    """
    import torch

    from bitswap_tpu.codec.discretize import DiscretizationBins

    zendpoints = torch.load(path, map_location="cpu").numpy()
    zcentres = torch.load(
        path.replace("zendpoints", "zcentres"), map_location="cpu"
    ).numpy()
    S = 1 << quantbits
    assert zendpoints.shape[-1] == S - 1 and zcentres.shape[-1] == S, (
        zendpoints.shape,
        zcentres.shape,
    )
    return DiscretizationBins(
        zendpoints=np.asarray(zendpoints, np.float64),
        zcentres=np.asarray(zcentres, np.float64),
        order="nchw",
    )


def main(argv=None) -> int:
    """CLI: convert a reference .pt checkpoint to a flax msgpack params file.

    python -m bitswap_tpu.tools.import_reference --ckpt mnist/nz4 \
        --dataset mnist --nz 4 --out params/mnist/nz4.msgpack
    """
    import argparse

    p = argparse.ArgumentParser(prog="bitswap_tpu.tools.import_reference")
    p.add_argument("--ckpt", required=True, help="reference torch state_dict path")
    p.add_argument("--dataset", default="mnist")
    p.add_argument("--nz", type=int, required=True)
    p.add_argument("--out", required=True, help="output .msgpack params path")
    args = p.parse_args(argv)

    from bitswap_tpu.train.runtime import save_params
    from bitswap_tpu.utils.registry import get_spec

    cfg = get_spec(args.dataset).model_config(args.nz, dropout_p=0.0)
    sd = load_torch_state_dict(args.ckpt)
    params = import_state_dict(sd, cfg)
    save_params(args.out, params)
    print(f"imported {len(sd)} tensors -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
